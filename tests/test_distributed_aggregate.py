"""Distributed GROUP BY (parallel/aggregate_shuffle.py) on the 8-device
virtual CPU mesh: must agree with the single-device sort aggregate as a
key → aggregates map, across skew, padding, and forced capacity retries.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.data.table import make_table
from partitionedhashjoin_tpu.ops.aggregate import sort_aggregate
from partitionedhashjoin_tpu.ops.generators import zipf_table
from partitionedhashjoin_tpu.parallel.aggregate_shuffle import (
    DistributedAggregateOperator,
)
from partitionedhashjoin_tpu.parallel.mesh import make_mesh


def _as_map(g):
    num = int(g.num_groups)
    out = {}
    for i in range(num):
        out[int(g.keys[i])] = (
            int(g.count[i]), int(g.sum[i]), int(g.min[i]), int(g.max[i])
        )
    return out


def _check_against_local(table, dist, **kw):
    g_local = sort_aggregate(table, compaction="sort")
    g_dist = dist.run(table, **kw)
    assert int(g_dist.num_groups) == int(g_local.num_groups)
    assert _as_map(g_dist) == _as_map(g_local)


class TestDistributedAggregate:
    def test_matches_local_random(self):
        rng = np.random.default_rng(61)
        keys = rng.integers(0, 200, 4096).astype(np.int32)
        pay = rng.integers(-1000, 1000, 4096).astype(np.int32)
        mesh = make_mesh()
        _check_against_local(
            make_table(keys, pay), DistributedAggregateOperator(mesh, seed=3)
        )

    def test_zipf_hot_keys_stay_balanced_partials(self):
        # the combiner makes a hot key ONE partial per shard; a heavy head
        # must aggregate exactly without any capacity explosion
        b = zipf_table(16384, alpha=1.25, key_range=(1, 300), seed=9)
        keys = np.asarray(b.keys)
        pay = np.asarray(b.payloads)
        mesh = make_mesh()
        _check_against_local(
            make_table(keys, pay), DistributedAggregateOperator(mesh, seed=5)
        )

    def test_non_divisible_rows_padding(self):
        rng = np.random.default_rng(62)
        n = 1003  # not divisible by 8; padded rows must not form groups
        keys = rng.integers(0, 50, n).astype(np.int32)
        pay = rng.integers(-100, 100, n).astype(np.int32)
        mesh = make_mesh()
        _check_against_local(
            make_table(keys, pay), DistributedAggregateOperator(mesh, seed=7)
        )

    def test_genuine_zero_key_group(self):
        # padding also writes key 0 — a real key-0 group must stay exact
        rng = np.random.default_rng(63)
        n = 777
        keys = np.zeros(n, np.int32)
        keys[: n // 2] = rng.integers(1, 20, n // 2)
        pay = rng.integers(-5, 5, n).astype(np.int32)
        mesh = make_mesh()
        _check_against_local(
            make_table(keys, pay), DistributedAggregateOperator(mesh, seed=11)
        )

    def test_capacity_overflow_retries_to_exact(self):
        # 700 distinct keys over 8 shards with a tiny capacity hint: the
        # local combiner must overflow, retry with doubled capacity, and
        # still land exact
        rng = np.random.default_rng(64)
        keys = rng.permutation(np.repeat(
            np.arange(700, dtype=np.int32), 4
        ))
        pay = rng.integers(-100, 100, keys.size).astype(np.int32)
        mesh = make_mesh()
        dist = DistributedAggregateOperator(mesh, seed=13, slack=1.0)
        _check_against_local(
            make_table(keys, pay), dist, group_capacity=2
        )

    def test_sums_wrap_mod_2_32_like_local(self):
        keys = np.repeat(np.arange(4, dtype=np.int32), 512)
        pay = np.full(keys.size, 2**30, np.int32)
        mesh = make_mesh()
        _check_against_local(
            make_table(keys, pay), DistributedAggregateOperator(mesh, seed=17)
        )

    def test_empty_and_wide_dtype(self):
        mesh = make_mesh()
        dist = DistributedAggregateOperator(mesh, seed=19)
        g = dist.run(make_table(np.zeros(0, np.int32), np.zeros(0, np.int32)))
        assert int(g.num_groups) == 0
        import jax as _jax

        with _jax.enable_x64(True):
            t = make_table(np.zeros(8, np.int32), np.zeros(8, np.int32))
            t = type(t)(
                keys=jnp.asarray(t.keys, jnp.int32),
                payloads=jnp.asarray(np.zeros(8, np.int64)),
            )
            with pytest.raises(TypeError, match="int32-only"):
                dist.run(t)


class TestDistributedDistinct:
    """Exact COUNT DISTINCT via the row-exchange plan."""

    def _check(self, table, mesh, mask=None, **kw):
        if mask is None:
            g_local = sort_aggregate(
                table, compaction="sort", with_distinct=True
            )
        else:
            from partitionedhashjoin_tpu.ops.aggregate import (
                filter_sort_aggregate,
            )

            m = jnp.asarray(mask)
            g_local, _ = filter_sort_aggregate(
                table, lambda k, p: m, with_distinct=True
            )
        dist = DistributedAggregateOperator(mesh, seed=29, **kw)
        g = dist.run(table, mask=mask, with_distinct=True)
        n, n1 = int(g.num_groups), int(g_local.num_groups)
        assert n == n1
        as_map = lambda r, c: {
            int(r.keys[i]): (
                int(r.count[i]), int(r.sum[i]), int(r.min[i]),
                int(r.max[i]), int(r.distinct[i]),
            )
            for i in range(c)
        }
        assert as_map(g, n) == as_map(g_local, n1)

    def test_matches_local_random(self):
        rng = np.random.default_rng(91)
        keys = rng.integers(0, 50, 4096).astype(np.int32)
        pay = rng.integers(0, 9, 4096).astype(np.int32)  # few distinct
        self._check(make_table(keys, pay), make_mesh())

    def test_zipf_skew_rows_travel_exactly(self):
        # the Zipf head's rows ALL land on one owner shard; the bucket
        # capacity retry must absorb it and the distinct count stay exact
        b = zipf_table(8192, alpha=1.25, key_range=(1, 100), seed=93)
        t = make_table(
            np.asarray(b.keys),
            (np.asarray(b.payloads) % 13).astype(np.int32),
        )
        self._check(t, make_mesh(), slack=1.0)

    def test_masked_rows_excluded(self):
        rng = np.random.default_rng(95)
        keys = rng.integers(0, 30, 2048).astype(np.int32)
        pay = rng.integers(0, 6, 2048).astype(np.int32)
        mask = (np.arange(2048) % 3 != 0)
        self._check(make_table(keys, pay), make_mesh(), mask=mask)


class TestDistributedTopK:
    def test_matches_local_top_k(self):
        from partitionedhashjoin_tpu.ops.order_by import top_k
        from partitionedhashjoin_tpu.parallel.top_k import distributed_top_k

        rng = np.random.default_rng(71)
        keys = rng.permutation(4096).astype(np.int32) - 2048
        pay = keys * 5
        t = make_table(keys, pay)
        mesh = make_mesh()
        for by, desc in (("key", True), ("key", False),
                         ("payload", True), ("payload", False)):
            d, n_live = distributed_top_k(mesh, t, 12, by=by, descending=desc)
            assert int(n_live) == 12
            l = top_k(t, 12, by=by, descending=desc)
            np.testing.assert_array_equal(
                np.asarray(d.keys), np.asarray(l.keys), err_msg=f"{by}{desc}"
            )
            np.testing.assert_array_equal(
                np.asarray(d.payloads), np.asarray(l.payloads)
            )

    def test_padding_rows_never_surface(self):
        from partitionedhashjoin_tpu.parallel.top_k import distributed_top_k

        # n=9: pads with key 0; ascending top-k must not return pad zeros
        keys = np.arange(10, 19, dtype=np.int32)
        t = make_table(keys, keys.copy())
        mesh = make_mesh()
        d, _ = distributed_top_k(mesh, t, 1, by="key", descending=False)
        assert np.asarray(d.keys).tolist() == [10]

    def test_validation(self):
        from partitionedhashjoin_tpu.parallel.top_k import distributed_top_k

        t = make_table(np.arange(64, dtype=np.int32),
                       np.arange(64, dtype=np.int32))
        mesh = make_mesh()
        with pytest.raises(ValueError, match="per-shard"):
            distributed_top_k(mesh, t, 20)
        with pytest.raises(ValueError, match="positive"):
            distributed_top_k(mesh, t, 0)

    def test_masked_matches_filtered_local(self):
        # pushed-down filter: the masked distributed top-k equals sorting
        # the filtered rows locally, for every (by, descending) combo
        from partitionedhashjoin_tpu.parallel.top_k import distributed_top_k

        rng = np.random.default_rng(73)
        keys = rng.permutation(4096).astype(np.int32) - 2048
        pay = rng.integers(-999, 999, 4096).astype(np.int32)
        mask = (pay % 3 == 0)
        t = make_table(keys, pay)
        mesh = make_mesh()
        for by, desc in (("key", True), ("key", False),
                         ("payload", True), ("payload", False)):
            d, n_live = distributed_top_k(
                mesh, t, 12, by=by, descending=desc, mask=jnp.asarray(mask)
            )
            assert int(n_live) == 12
            col = keys[mask] if by == "key" else pay[mask]
            want = np.sort(col)[::-1][:12] if desc else np.sort(col)[:12]
            got = np.asarray(d.keys if by == "key" else d.payloads)
            np.testing.assert_array_equal(got, want, err_msg=f"{by}{desc}")

    def test_masked_fewer_survivors_than_k(self):
        # n_live < k: the live prefix is exactly the survivor count and
        # no invalid row is ever selected — including when valid rows sit
        # at the int32 extremes (the sentinel-collision case a top_k
        # formulation would get wrong)
        from partitionedhashjoin_tpu.parallel.top_k import distributed_top_k

        keys = np.arange(64, dtype=np.int32)
        keys[3] = np.iinfo(np.int32).min
        keys[40] = np.iinfo(np.int32).max
        mask = np.zeros(64, bool)
        mask[[3, 17, 40]] = True
        t = make_table(keys, keys.copy())
        mesh = make_mesh()
        d, n_live = distributed_top_k(
            mesh, t, 8, by="key", descending=False, mask=jnp.asarray(mask)
        )
        assert int(n_live) == 3
        got = np.asarray(d.keys)[:3].tolist()
        assert got == [np.iinfo(np.int32).min, 17, np.iinfo(np.int32).max]
        assert np.asarray(d.keys)[3:].tolist() == [0] * 5


def _np_join_group(build_keys, probe_keys, probe_pays):
    """Numpy oracle: GROUP BY key of COUNT/SUM(mod 2^32)/MIN/MAX over probe
    rows whose key exists in the build relation (inner join, carry=probe)."""
    bset = set(build_keys.tolist())
    out = {}
    for k, p in zip(probe_keys.tolist(), probe_pays.tolist()):
        if k not in bset:
            continue
        c, s, mn, mx = out.get(k, (0, 0, p, p))
        out[k] = (c + 1, np.int32(s + p), min(mn, p), max(mx, p))
    return {k: (c, int(s), mn, mx) for k, (c, s, mn, mx) in out.items()}


class TestDistributedJoinAggregate:
    def _check(self, build, probe, op, **kw):
        g = op.run(build, probe, **kw)
        want = _np_join_group(
            np.asarray(build.keys), np.asarray(probe.keys),
            np.asarray(probe.payloads),
        )
        assert int(g.num_groups) == len(want)
        assert _as_map(g) == want

    def test_matches_oracle_partial_match(self):
        from partitionedhashjoin_tpu.parallel.join_aggregate import (
            DistributedJoinAggregateOperator,
        )

        rng = np.random.default_rng(81)
        # build covers only half the probe key range: unmatched keys must
        # produce NO groups
        build = make_table(
            rng.integers(0, 50, 256).astype(np.int32),
            rng.integers(0, 9, 256).astype(np.int32),
        )
        probe = make_table(
            rng.integers(0, 100, 4096).astype(np.int32),
            rng.integers(-1000, 1000, 4096).astype(np.int32),
        )
        mesh = make_mesh()
        self._check(
            build, probe, DistributedJoinAggregateOperator(mesh, seed=3)
        )

    def test_zipf_hot_keys_exact(self):
        from partitionedhashjoin_tpu.parallel.join_aggregate import (
            DistributedJoinAggregateOperator,
        )

        # heavy Zipf head on the probe side: hot rows stay local, partials
        # merge across shards — results must stay exact
        probe = zipf_table(16384, alpha=1.25, key_range=(1, 300), seed=21)
        rng = np.random.default_rng(82)
        build = make_table(
            np.arange(1, 257, dtype=np.int32),  # keys 1..256 present
            rng.integers(0, 9, 256).astype(np.int32),
        )
        probe = make_table(
            np.asarray(probe.keys), np.asarray(probe.payloads)
        )
        mesh = make_mesh()
        self._check(
            build, probe, DistributedJoinAggregateOperator(mesh, seed=5)
        )

    def test_no_skew_plan_matches_too(self):
        from partitionedhashjoin_tpu.parallel.join_aggregate import (
            DistributedJoinAggregateOperator,
        )

        probe = zipf_table(8192, alpha=1.05, key_range=(1, 200), seed=23)
        build = make_table(
            np.arange(1, 129, dtype=np.int32),
            np.zeros(128, np.int32),
        )
        probe = make_table(
            np.asarray(probe.keys), np.asarray(probe.payloads)
        )
        mesh = make_mesh()
        self._check(
            build, probe,
            DistributedJoinAggregateOperator(mesh, seed=7, handle_skew=False),
        )

    def test_capacity_overflow_retries_to_exact(self):
        from partitionedhashjoin_tpu.parallel.join_aggregate import (
            DistributedJoinAggregateOperator,
        )

        rng = np.random.default_rng(83)
        keys = rng.permutation(
            np.repeat(np.arange(600, dtype=np.int32), 4)
        )
        build = make_table(
            np.arange(600, dtype=np.int32), np.zeros(600, np.int32)
        )
        # 600 rows not divisible by 8 -> pad build to 608 via extra rows
        build = make_table(
            np.concatenate([np.asarray(build.keys),
                            np.zeros(8, np.int32)]),
            np.zeros(608, np.int32),
        )
        probe = make_table(
            keys, rng.integers(-100, 100, keys.size).astype(np.int32)
        )
        mesh = make_mesh()
        op = DistributedJoinAggregateOperator(mesh, seed=9, slack=1.0)
        self._check(build, probe, op, group_capacity=2)

    def test_duplicate_build_keys_count_once(self):
        from partitionedhashjoin_tpu.parallel.join_aggregate import (
            DistributedJoinAggregateOperator,
        )

        # first-match semantics: probe rows match once no matter how many
        # build rows share the key
        build = make_table(
            np.repeat(np.arange(8, dtype=np.int32), 8),
            np.arange(64, dtype=np.int32),
        )
        probe = make_table(
            np.tile(np.arange(16, dtype=np.int32), 8),
            np.ones(128, np.int32),
        )
        mesh = make_mesh()
        self._check(
            build, probe, DistributedJoinAggregateOperator(mesh, seed=11)
        )

    def test_int32_max_key_exact(self):
        from partitionedhashjoin_tpu.parallel.join_aggregate import (
            DistributedJoinAggregateOperator,
        )

        # INT32_MAX is the membership sentinel internally; a genuine
        # INT32_MAX key must still join exactly
        m = np.iinfo(np.int32).max
        build = make_table(
            np.asarray([m, 1, 2, 3, 4, 5, 6, 7], np.int32),
            np.zeros(8, np.int32),
        )
        probe = make_table(
            np.asarray([m, m, 1, 9, m, 2, 9, 9] * 2, np.int32),
            np.arange(16, dtype=np.int32),
        )
        mesh = make_mesh()
        self._check(
            build, probe, DistributedJoinAggregateOperator(mesh, seed=13)
        )

    def test_validation(self):
        from partitionedhashjoin_tpu.parallel.join_aggregate import (
            DistributedJoinAggregateOperator,
        )

        mesh = make_mesh()
        op = DistributedJoinAggregateOperator(mesh, seed=15)
        t8 = make_table(np.arange(8, dtype=np.int32),
                        np.arange(8, dtype=np.int32))
        t9 = make_table(np.arange(9, dtype=np.int32),
                        np.arange(9, dtype=np.int32))
        with pytest.raises(ValueError, match="divide"):
            op.run(t8, t9)
        import jax as _jax

        with _jax.enable_x64(True):
            t64 = make_table(
                jnp.asarray(np.arange(8), jnp.int32),
                jnp.asarray(np.arange(8), jnp.int64),
            )
            with pytest.raises(TypeError, match="int32-only"):
                op.run(t64, t8)
