"""Sort-merge join tests: the gather-free count-join path.

Validates Get-semantics counts, GetAll cardinalities, full-domain exactness
(including INT32_MIN keys — the implementation is sentinel-free), validity
masks for padded inputs, and agreement with the hash-join path.
"""

import numpy as np
import jax.numpy as jnp

from partitionedhashjoin_tpu.data.table import make_table
from partitionedhashjoin_tpu.ops.generators import sequential_table, zipf_table
from partitionedhashjoin_tpu.ops.sort_merge import (
    SortMergeJoiner,
    sort_merge_count,
    sort_merge_count_all,
)
from partitionedhashjoin_tpu.utils.widesum import pair_to_int


def test_count_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 500, 2000).astype(np.int32)
    b = rng.integers(0, 700, 5000).astype(np.int32)
    got = int(sort_merge_count(jnp.asarray(a), jnp.asarray(b)))
    assert got == int(np.isin(b, a).sum())


def test_count_all_matches_inner_join_cardinality():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 50, 1500).astype(np.int32)  # heavy duplicates
    b = rng.integers(0, 60, 4000).astype(np.int32)
    got = pair_to_int(sort_merge_count_all(jnp.asarray(a), jnp.asarray(b)))
    mult = np.bincount(a, minlength=60)
    assert got == int(mult[b].sum())


def test_count_all_cardinality_beyond_int32():
    # 70k duplicated build keys × 35k probes of the same key ≈ 2.45e9 > 2^31:
    # the GetAll cardinality must not wrap (ADVICE.md round-1 medium finding)
    a = np.full(70_000, 7, np.int32)
    b = np.full(35_000, 7, np.int32)
    got = pair_to_int(sort_merge_count_all(jnp.asarray(a), jnp.asarray(b)))
    assert got == 70_000 * 35_000


def test_full_int32_domain_including_int_min():
    lo = np.iinfo(np.int32).min
    a = np.array([lo, lo, -1, 0, 7], np.int32)
    b = np.array([lo, 0, 7, 12, lo + 1], np.int32)
    assert int(sort_merge_count(jnp.asarray(a), jnp.asarray(b))) == 3
    assert pair_to_int(sort_merge_count_all(jnp.asarray(a), jnp.asarray(b))) == 4


def test_validity_masks_exclude_padding():
    a = np.array([1, 2, 3, 99, 99], np.int32)
    av = np.array([True, True, True, False, False])
    b = np.array([1, 99, 3, 99, 4], np.int32)
    bv = np.array([True, True, True, False, True])
    got = int(
        sort_merge_count(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(av), jnp.asarray(bv)
        )
    )
    # valid matches: b=1 and b=3; the valid b=99 must NOT match the invalid
    # build 99s, and the invalid b=99 must not count at all
    assert got == 2


def test_agrees_with_hash_join():
    from partitionedhashjoin_tpu.ops.no_partitioning import (
        NoPartitioningHashJoiner,
    )

    rng = np.random.default_rng(2)
    a_keys = rng.integers(-3000, 3000, 2500).astype(np.int32)
    b_keys = rng.integers(-3000, 3000, 9000).astype(np.int32)
    a = make_table(a_keys, np.arange(2500, dtype=np.int32))
    b = make_table(b_keys, np.arange(9000, dtype=np.int32))
    assert SortMergeJoiner().run(a, b) == NoPartitioningHashJoiner(seed=1).run(
        a, b
    )


def test_benchmark_invariant():
    n = 3000
    a = sequential_table(n)
    b = zipf_table(12_000, alpha=1.25, key_range=(1, n), seed=5)
    assert SortMergeJoiner().run(a, b) == 12_000


def test_empty_intersection():
    a = make_table(
        np.arange(0, 100, dtype=np.int32), np.zeros(100, np.int32)
    )
    b = make_table(
        np.arange(100, 200, dtype=np.int32), np.zeros(100, np.int32)
    )
    assert SortMergeJoiner().run(a, b) == 0


def test_int64_keys_supported_under_x64():
    # the reference's Tuple::id is int64 (Table.hpp:20-25); the sort-merge
    # path must handle 64-bit keys exactly (values beyond int32 range)
    import jax

    with jax.enable_x64(True):
        big = np.array(
            [2**40, 2**40 + 1, -(2**35), 7], np.int64
        )
        probe = np.array(
            [2**40, 2**40 + 2, -(2**35), 7, 2**33], np.int64
        )
        got = int(
            sort_merge_count(jnp.asarray(big), jnp.asarray(probe))
        )
        assert got == 3


def test_int64_keys_rejected_by_hash_tables():
    import jax
    import pytest
    from partitionedhashjoin_tpu.ops import hash_table as ht

    with jax.enable_x64(True):
        keys = jnp.asarray(np.array([2**40, 1], np.int64))
        with pytest.raises(TypeError):
            ht.build_chained(keys, jnp.uint32(1), 2)


def test_materialized_join_matches_hash_path():
    rng = np.random.default_rng(31)
    a_keys = rng.choice(np.arange(0, 3000, dtype=np.int32), 1200, replace=False)
    b_keys = rng.integers(0, 3000, 5000).astype(np.int32)
    a = make_table(a_keys, np.arange(1200, dtype=np.int32))
    b = make_table(b_keys, np.arange(5000, dtype=np.int32))
    out = SortMergeJoiner().run_materialize(a, b)
    c = int(out.count)
    assert c == int(np.isin(b_keys, a_keys).sum())
    keys = np.asarray(out.keys)[:c]
    pay_a = np.asarray(out.payloads_a)[:c]
    pay_b = np.asarray(out.payloads_b)[:c]
    # probe order, compacted; payload_a = unique build row's payload
    sel = np.isin(b_keys, a_keys)
    np.testing.assert_array_equal(keys, b_keys[sel])
    np.testing.assert_array_equal(pay_b, np.where(sel)[0])
    key_to_row = {int(k): i for i, k in enumerate(a_keys)}
    np.testing.assert_array_equal(
        pay_a, np.array([key_to_row[int(k)] for k in keys], np.int32)
    )


def test_materialized_join_duplicate_build_keys_deterministic():
    # with duplicate build keys the LATEST build row in stable sorted order
    # wins (deterministic first-match policy)
    a = make_table(
        np.array([5, 5, 9], np.int32), np.array([10, 20, 30], np.int32)
    )
    b = make_table(np.array([5, 9, 4], np.int32), np.arange(3, dtype=np.int32))
    out = SortMergeJoiner().run_materialize(a, b)
    assert int(out.count) == 2
    assert np.asarray(out.payloads_a)[:2].tolist() == [20, 30]


def test_empty_inputs():
    empty = make_table(np.zeros(0, np.int32), np.zeros(0, np.int32))
    some = make_table(np.arange(8, dtype=np.int32), np.arange(8, dtype=np.int32))
    assert SortMergeJoiner().run(empty, empty) == 0
    assert SortMergeJoiner().run(empty, some) == 0
    assert SortMergeJoiner().run(some, empty) == 0


def test_materialize_join_types():
    import numpy as np
    from partitionedhashjoin_tpu.ops.sort_merge import (
        anti_count,
        sort_merge_materialize_typed,
    )

    build = jnp.asarray([10, 20, 30], jnp.int32)
    bpay = jnp.asarray([100, 200, 300], jnp.int32)
    probe = jnp.asarray([20, 5, 10, 20, 99], jnp.int32)
    ppay = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)

    keys, pa, pb, matched, count = sort_merge_materialize_typed(
        build, bpay, probe, ppay, "inner"
    )
    assert int(count) == 3
    assert list(np.asarray(keys)[:3]) == [20, 10, 20]
    assert list(np.asarray(pa)[:3]) == [200, 100, 200]
    assert list(np.asarray(pb)[:3]) == [1, 3, 4]
    assert np.asarray(matched)[:3].all()

    keys, pa, pb, matched, count = sort_merge_materialize_typed(
        build, bpay, probe, ppay, "anti"
    )
    assert int(count) == 2
    assert list(np.asarray(keys)[:2]) == [5, 99]
    assert list(np.asarray(pa)[:2]) == [0, 0]
    assert not np.asarray(matched)[:2].any()

    keys, pa, pb, matched, count = sort_merge_materialize_typed(
        build, bpay, probe, ppay, "left"
    )
    assert int(count) == 5
    assert list(np.asarray(keys)) == [20, 5, 10, 20, 99]
    assert list(np.asarray(pa)) == [200, 0, 100, 200, 0]
    assert list(np.asarray(matched)) == [True, False, True, True, False]

    keys, pa, pb, matched, count = sort_merge_materialize_typed(
        build, bpay, probe, ppay, "full"
    )
    # left block (5 probe rows in place) + 1 unmatched build row (key 30)
    assert int(count) == 6
    assert list(np.asarray(keys)[:6]) == [20, 5, 10, 20, 99, 30]
    assert list(np.asarray(pa)[:6]) == [200, 0, 100, 200, 0, 300]
    assert list(np.asarray(pb)[:6]) == [1, 2, 3, 4, 5, 0]
    assert list(np.asarray(matched)[:6]) == [
        True, False, True, True, False, False,
    ]
    assert keys.shape[0] == 5 + 3  # n_probe + n_build static
    assert not np.asarray(keys)[6:].any()  # zero tail past count

    # anti_count complements the Get count, with validity masks
    pvalid = jnp.asarray([True, True, False, True, True])
    assert int(anti_count(build, probe)) == 2
    assert int(anti_count(build, probe, probe_valid=pvalid)) == 2
    bvalid = jnp.asarray([False, True, True])  # drop build key 10
    # probe row with key 10 is itself invalid, so the anti set stays {5, 99};
    # with ALL probe rows valid, dropping build key 10 grows it to {5, 10, 99}
    assert int(
        anti_count(build, probe, build_valid=bvalid, probe_valid=pvalid)
    ) == 2
    assert int(anti_count(build, probe, build_valid=bvalid)) == 3


def test_materialize_typed_agrees_with_untyped_inner():
    import numpy as np
    from partitionedhashjoin_tpu.ops.sort_merge import (
        sort_merge_materialize,
        sort_merge_materialize_typed,
    )

    rng = np.random.default_rng(23)
    build = rng.integers(0, 500, 300).astype(np.int32)
    bpay = rng.integers(0, 10**6, 300).astype(np.int32)
    probe = rng.integers(0, 600, 2000).astype(np.int32)
    ppay = rng.integers(0, 10**6, 2000).astype(np.int32)
    old = sort_merge_materialize(
        jnp.asarray(build), jnp.asarray(bpay),
        jnp.asarray(probe), jnp.asarray(ppay),
    )
    new = sort_merge_materialize_typed(
        jnp.asarray(build), jnp.asarray(bpay),
        jnp.asarray(probe), jnp.asarray(ppay), "inner",
    )
    for o, n in zip(old, (new[0], new[1], new[2], new[4])):
        assert np.array_equal(np.asarray(o), np.asarray(n))


def test_joiner_run_materialize_join_type():
    import numpy as np
    from partitionedhashjoin_tpu.data.table import make_table

    a = make_table(
        np.array([10, 20, 30], np.int32), np.array([100, 200, 300], np.int32)
    )
    b = make_table(
        np.array([20, 5, 10, 20, 99], np.int32),
        np.array([1, 2, 3, 4, 5], np.int32),
    )
    joiner = SortMergeJoiner()
    out = joiner.run_materialize(a, b, join_type="anti")
    assert int(out.count) == 2
    assert list(np.asarray(out.keys)[:2]) == [5, 99]
    out = joiner.run_materialize(a, b)  # default stays inner
    assert int(out.count) == 3


def test_joiner_run_materialize_left_exposes_matched():
    """Regression (round-2 review): the driver must surface the NULL
    indicator — a left join's unmatched row and a matched row whose build
    payload is legitimately 0 are distinguishable ONLY via ``matched``."""
    import numpy as np
    from partitionedhashjoin_tpu.data.table import make_table

    a = make_table(
        np.array([10, 20], np.int32), np.array([0, 200], np.int32)
    )  # key 10's build payload is genuinely 0
    b = make_table(
        np.array([10, 7, 20], np.int32), np.array([1, 2, 3], np.int32)
    )
    out = SortMergeJoiner().run_materialize(a, b, join_type="left")
    assert int(out.count) == 3
    assert list(np.asarray(out.payloads_a)) == [0, 0, 200]
    assert list(np.asarray(out.matched)) == [True, False, True]
    # inner joins carry it too (all True within count)
    inner = SortMergeJoiner().run_materialize(a, b)
    assert np.asarray(inner.matched)[: int(inner.count)].all()


def test_full_outer_fuzz_oracle():
    """Full outer join vs a host-side oracle: the probe block preserves
    left-join semantics, the appended block is exactly the multiset of
    unmatched build rows (duplicates preserved)."""
    import numpy as np
    from collections import Counter
    from partitionedhashjoin_tpu.ops.sort_merge import (
        sort_merge_materialize_typed,
    )

    rng = np.random.default_rng(77)
    for _ in range(4):
        n_a = int(rng.integers(1, 60))
        n_b = int(rng.integers(1, 90))
        build = rng.integers(0, 25, n_a).astype(np.int32)
        bpay = rng.integers(1, 10**6, n_a).astype(np.int32)
        probe = rng.integers(0, 30, n_b).astype(np.int32)
        ppay = rng.integers(1, 10**6, n_b).astype(np.int32)
        keys, pa, pb, matched, count = sort_merge_materialize_typed(
            build, bpay, probe, ppay, "full"
        )
        keys, pa, pb, matched = map(np.asarray, (keys, pa, pb, matched))
        bset = set(build.tolist())
        pset = set(probe.tolist())
        # probe block: in place, matched == membership
        assert list(keys[:n_b]) == probe.tolist()
        assert list(matched[:n_b]) == [k in bset for k in probe.tolist()]
        # appended block: unmatched build rows as a multiset of (key, pay)
        extra = int(count) - n_b
        want = Counter(
            (k, p) for k, p in zip(build.tolist(), bpay.tolist())
            if k not in pset
        )
        got = Counter(zip(keys[n_b : n_b + extra].tolist(),
                          pa[n_b : n_b + extra].tolist()))
        assert got == want
        assert not pb[n_b:].any() and not matched[n_b:].any()
        assert not keys[int(count):].any() and not pa[int(count):].any()


def test_materialize_typed_masked_fuzz():
    """Validity masks on the typed materializer vs a host oracle: filters
    fold into the join as masks (the query layer's no-materialized-filter
    rule) — an invalid build row never matches, an invalid probe row is
    absent from every variant, and left/full compact their probe block to
    the valid rows."""
    from partitionedhashjoin_tpu.ops.sort_merge import (
        sort_merge_materialize_typed,
    )

    rng = np.random.default_rng(411)
    for trial in range(5):
        n_a = int(rng.integers(1, 50))
        n_b = int(rng.integers(1, 80))
        build = rng.integers(0, 20, n_a).astype(np.int32)
        bpay = rng.integers(1, 10**6, n_a).astype(np.int32)
        probe = rng.integers(0, 25, n_b).astype(np.int32)
        ppay = rng.integers(1, 10**6, n_b).astype(np.int32)
        bv = rng.random(n_a) < 0.6
        pv = rng.random(n_b) < 0.6
        if trial == 4:  # all-invalid edge
            bv[:] = False
        for use_bv in (True, False):
            for use_pv in (True, False):
                ebv = bv if use_bv else np.ones(n_a, bool)
                epv = pv if use_pv else np.ones(n_b, bool)
                # oracle: first-match = HIGHEST-index valid build row per key
                pay_of = {}
                for i in range(n_a):
                    if ebv[i]:
                        pay_of[int(build[i])] = int(bpay[i])
                vp = [
                    (int(probe[i]), int(ppay[i]), int(probe[i]) in pay_of)
                    for i in range(n_b) if epv[i]
                ]
                valid_probe_keys = {k for k, _, _ in vp}
                unmatched_b = [
                    (int(build[i]), int(bpay[i]))
                    for i in range(n_a)
                    if ebv[i] and int(build[i]) not in valid_probe_keys
                ]
                expect = {
                    "inner": [(k, pay_of[k], p, True) for k, p, h in vp if h],
                    "anti": [(k, 0, p, False) for k, p, h in vp if not h],
                    "left": [
                        (k, pay_of.get(k, 0) if h else 0, p, h)
                        for k, p, h in vp
                    ],
                }
                expect["semi"] = expect["inner"]
                expect["full"] = expect["left"] + [
                    (k, pa, 0, False) for k, pa in unmatched_b
                ]
                for jt, rows in expect.items():
                    keys, pa, pb, matched, count = (
                        sort_merge_materialize_typed(
                            jnp.asarray(build), jnp.asarray(bpay),
                            jnp.asarray(probe), jnp.asarray(ppay), jt,
                            build_valid=(
                                jnp.asarray(ebv) if use_bv else None
                            ),
                            probe_valid=(
                                jnp.asarray(epv) if use_pv else None
                            ),
                        )
                    )
                    c = int(count)
                    assert c == len(rows), (jt, use_bv, use_pv, trial)
                    got = list(
                        zip(
                            np.asarray(keys)[:c].tolist(),
                            np.asarray(pa)[:c].tolist(),
                            np.asarray(pb)[:c].tolist(),
                            np.asarray(matched)[:c].tolist(),
                        )
                    )
                    assert got == rows, (jt, use_bv, use_pv, trial)
                    # zero tail past count
                    assert not np.asarray(keys)[c:].any(), jt
                    assert not np.asarray(matched)[c:].any(), jt
