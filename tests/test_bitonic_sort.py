"""Pallas bitonic/merge sorter (ops/pallas/bitonic_sort.py), interpret mode.

Oracle: np.sort — the sorter is an unstable pure-key sort, so sorted output
must be exactly equal.  Covers block sorting, single merge passes at every
run length, truncated tail pairs / lone runs, the full-domain extremes
(INT32_MIN/MAX as genuine keys vs padding), and duplicate-heavy (Zipf-like)
distributions where diagonal-search tie handling matters.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.ops.pallas import bitonic_sort as bs


def _rng(seed):
    return np.random.default_rng(seed)


class TestBlockSort:
    def test_single_block_random(self):
        x = _rng(0).integers(-(2**31), 2**31, size=bs.BLK, dtype=np.int32)
        got = np.asarray(bs.sort_blocks_i32(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.sort(x))

    def test_many_blocks_sorted_independently(self):
        n = 4 * bs.BLK
        x = _rng(1).integers(-100, 100, size=n, dtype=np.int32)
        got = np.asarray(bs.sort_blocks_i32(jnp.asarray(x), interpret=True))
        for b in range(4):
            blk = slice(b * bs.BLK, (b + 1) * bs.BLK)
            np.testing.assert_array_equal(got[blk], np.sort(x[blk]))

    def test_extreme_values(self):
        x = np.full(bs.BLK, np.iinfo(np.int32).max, dtype=np.int32)
        x[:100] = np.iinfo(np.int32).min
        x[100:200] = 0
        shuf = _rng(2).permutation(x)
        got = np.asarray(
            bs.sort_blocks_i32(jnp.asarray(shuf), interpret=True)
        )
        np.testing.assert_array_equal(got, np.sort(x))


class TestMergePass:
    @pytest.mark.parametrize("num_runs,dup_range", [
        (2, 2**31), (2, 50), (4, 1000), (8, 3),
    ])
    def test_merge_sorted_runs(self, num_runs, dup_range):
        run = bs.BLK
        n = num_runs * run
        r = _rng(num_runs * 7 + dup_range % 97)
        x = r.integers(-dup_range, dup_range, size=n, dtype=np.int32)
        runs = x.reshape(num_runs, run)
        runs.sort(axis=1)
        x = runs.reshape(n)
        got = np.asarray(
            bs.merge_pass_i32(jnp.asarray(x), run, interpret=True)
        )
        for p in range(num_runs // 2):
            seg = slice(p * 2 * run, (p + 1) * 2 * run)
            np.testing.assert_array_equal(got[seg], np.sort(x[seg]))

    def test_lone_tail_run_copies_through(self):
        run = bs.BLK
        n = 3 * run  # pair (0,1) + lone run 2
        x = _rng(11).integers(-1000, 1000, size=n, dtype=np.int32)
        runs = x.reshape(3, run)
        runs.sort(axis=1)
        x = runs.reshape(n)
        got = np.asarray(
            bs.merge_pass_i32(jnp.asarray(x), run, interpret=True)
        )
        np.testing.assert_array_equal(got[: 2 * run], np.sort(x[: 2 * run]))
        np.testing.assert_array_equal(got[2 * run :], x[2 * run :])

    def test_longer_runs_multiple_blocks(self):
        run = 4 * bs.BLK
        n = 2 * run
        x = _rng(12).integers(-(2**31), 2**31, size=n, dtype=np.int32)
        runs = x.reshape(2, run)
        runs.sort(axis=1)
        x = runs.reshape(n)
        got = np.asarray(
            bs.merge_pass_i32(jnp.asarray(x), run, interpret=True)
        )
        np.testing.assert_array_equal(got, np.sort(x))

    def test_skewed_duplicates_across_boundaries(self):
        # one value dominates: diagonal splits land inside huge tie runs
        run = 2 * bs.BLK
        n = 4 * run
        r = _rng(13)
        x = np.where(
            r.random(n) < 0.7, 42, r.integers(-50, 50, size=n)
        ).astype(np.int32)
        runs = x.reshape(4, run)
        runs.sort(axis=1)
        x = runs.reshape(n)
        got = np.asarray(
            bs.merge_pass_i32(jnp.asarray(x), run, interpret=True)
        )
        for p in range(2):
            seg = slice(p * 2 * run, (p + 1) * 2 * run)
            np.testing.assert_array_equal(got[seg], np.sort(x[seg]))


class TestFullSort:
    @pytest.mark.parametrize("n", [
        1, 100, bs.BLK, bs.BLK + 1, 3 * bs.BLK - 5, 8 * bs.BLK,
        5 * bs.BLK + 17,
    ])
    def test_random_lengths(self, n):
        x = _rng(n).integers(-(2**31), 2**31, size=n, dtype=np.int32)
        got = np.asarray(bs.sort_i32(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.sort(x))

    def test_genuine_int32_max_keys_survive_padding(self):
        n = 2 * bs.BLK + 100
        x = _rng(21).integers(-5, 5, size=n, dtype=np.int32)
        x[::97] = np.iinfo(np.int32).max
        got = np.asarray(bs.sort_i32(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.sort(x))

    def test_zipf_like_distribution(self):
        n = 4 * bs.BLK + 333
        r = _rng(22)
        x = (r.zipf(1.3, size=n) % 10_000).astype(np.int32)
        got = np.asarray(bs.sort_i32(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.sort(x))

    def test_already_sorted_and_reversed(self):
        n = 3 * bs.BLK
        x = np.arange(n, dtype=np.int32)
        np.testing.assert_array_equal(
            np.asarray(bs.sort_i32(jnp.asarray(x), interpret=True)), x
        )
        np.testing.assert_array_equal(
            np.asarray(bs.sort_i32(jnp.asarray(x[::-1]), interpret=True)), x
        )


class TestTupleSort:
    """sort_i32_tuple: full lexicographic row-tuple sort (2-key planes for
    int64 keys; value-carrying sorts for materialize / GROUP BY)."""

    def _oracle(self, cols):
        # np.lexsort keys are LAST-significant-first
        order = np.lexsort(tuple(reversed(cols)))
        return [c[order] for c in cols]

    def test_two_key_lexicographic(self):
        r = _rng(31)
        n = 3 * bs.BLK + 77
        hi = r.integers(-20, 20, size=n, dtype=np.int32)
        lo = r.integers(-(2**31), 2**31, size=n, dtype=np.int32)
        got = [np.asarray(a) for a in bs.sort_i32_tuple(
            jnp.asarray(hi), jnp.asarray(lo), interpret=True)]
        want = self._oracle([hi, lo])
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    def test_key_value_association_exact(self):
        # distinct keys: every (key, value) pair must survive verbatim
        r = _rng(32)
        n = 2 * bs.BLK + 13
        keys = r.permutation(n).astype(np.int32) - n // 2
        vals = (keys * 7 + 3).astype(np.int32)  # value determined by key
        ks, vs = [np.asarray(a) for a in bs.sort_i32_tuple(
            jnp.asarray(keys), jnp.asarray(vals), interpret=True)]
        np.testing.assert_array_equal(ks, np.sort(keys))
        np.testing.assert_array_equal(vs, ks * 7 + 3)

    def test_duplicate_keys_values_tie_ordered(self):
        # equal keys order by value (full-tuple comparator): lexsort oracle
        r = _rng(33)
        n = bs.BLK + 999
        keys = r.integers(-3, 3, size=n, dtype=np.int32)
        vals = r.integers(-10**6, 10**6, size=n, dtype=np.int32)
        got = [np.asarray(a) for a in bs.sort_i32_tuple(
            jnp.asarray(keys), jnp.asarray(vals), interpret=True)]
        want = self._oracle([keys, vals])
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    def test_genuine_all_max_rows_vs_padding(self):
        # rows identical to the padding tuple are interchangeable with it;
        # any other value paired with a MAX key must stay associated
        n = bs.BLK + 100  # forces BLK-1+... padding rows
        r = _rng(34)
        keys = r.integers(-5, 5, size=n, dtype=np.int32)
        vals = r.integers(-5, 5, size=n, dtype=np.int32)
        keys[::31] = np.iinfo(np.int32).max
        vals[::62] = np.iinfo(np.int32).max
        got = [np.asarray(a) for a in bs.sort_i32_tuple(
            jnp.asarray(keys), jnp.asarray(vals), interpret=True)]
        want = self._oracle([keys, vals])
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    def test_three_operands(self):
        r = _rng(35)
        n = bs.BLK + 700  # 2 blocks after padding: still a real merge pass
        a = r.integers(-4, 4, size=n, dtype=np.int32)
        b = r.integers(-4, 4, size=n, dtype=np.int32)
        c = r.integers(-(2**31), 2**31, size=n, dtype=np.int32)
        got = [np.asarray(x) for x in bs.sort_i32_tuple(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), interpret=True)]
        want = self._oracle([a, b, c])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


class TestBlockRows:
    @pytest.mark.parametrize("rows", [128, 256])
    def test_larger_phase_a_blocks(self, rows):
        n = 3 * rows * bs.LANES + 7777
        x = _rng(rows).integers(-(2**31), 2**31, size=n, dtype=np.int32)
        got = np.asarray(
            bs.sort_i32_tuple(jnp.asarray(x), interpret=True,
                              block_rows=rows)[0]
        )
        np.testing.assert_array_equal(got, np.sort(x))

    def test_small_input_clamps_block(self):
        # n far below the super block: the clamp must shrink rows
        n = 1000
        x = _rng(99).integers(-100, 100, size=n, dtype=np.int32)
        got = np.asarray(
            bs.sort_i32_tuple(jnp.asarray(x), interpret=True,
                              block_rows=1024)[0]
        )
        np.testing.assert_array_equal(got, np.sort(x))

    def test_heavy_duplicates_many_blocks_with_payload(self):
        # diagonal splits land inside giant tie runs across 6+ blocks; the
        # full-tuple comparator must still produce exact lexsort order
        r = _rng(36)
        n = 6 * bs.BLK + 4321
        keys = np.where(
            r.random(n) < 0.8, 7, r.integers(-9, 9, size=n)
        ).astype(np.int32)
        vals = r.integers(-(2**31), 2**31, size=n, dtype=np.int32)
        got = [np.asarray(a) for a in bs.sort_i32_tuple(
            jnp.asarray(keys), jnp.asarray(vals), interpret=True)]
        order = np.lexsort((vals, keys))
        np.testing.assert_array_equal(got[0], keys[order])
        np.testing.assert_array_equal(got[1], vals[order])


class TestXlaPhaseA:
    """phase_a='xla': batched minor-axis XLA block sort + Pallas merges."""

    @pytest.mark.parametrize("n", [1000, 3 * bs.BLK + 17, 5 * bs.BLK])
    def test_matches_numpy_and_network(self, n):
        x = _rng(40).integers(-(2**31), 2**31, size=n, dtype=np.int32)
        xla = np.asarray(
            bs.sort_i32_tuple(jnp.asarray(x), interpret=True,
                              phase_a="xla")[0]
        )
        np.testing.assert_array_equal(xla, np.sort(x))
        net = np.asarray(
            bs.sort_i32_tuple(jnp.asarray(x), interpret=True,
                              phase_a="network")[0]
        )
        np.testing.assert_array_equal(xla, net)

    def test_key_value_association_with_big_blocks(self):
        n = 4 * bs.BLK
        k = _rng(41).integers(-50, 50, size=n, dtype=np.int32)
        v = np.arange(n, dtype=np.int32)
        ks, vs = bs.sort_i32_tuple(
            jnp.asarray(k), jnp.asarray(v), interpret=True,
            phase_a="xla", block_rows=256,
        )
        ks, vs = np.asarray(ks), np.asarray(vs)
        np.testing.assert_array_equal(ks, np.sort(k))
        # exact full-lex order: ties broken by value ascending
        order = np.lexsort((v, k))
        np.testing.assert_array_equal(vs, v[order])

    def test_unknown_phase_a_rejected(self):
        with pytest.raises(ValueError):
            bs.sort_i32_tuple(jnp.zeros(8, jnp.int32), phase_a="nope")
