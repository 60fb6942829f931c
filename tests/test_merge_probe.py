"""Ranged merge-probe kernel + two-run join wrapper (interpret mode on CPU).

The kernel is the VMEM per-partition probe the round-1 review flagged as the
biggest unbuilt component; these tests pin its exactness properties: full
int32 domain (INT32_MAX is load-bearing: it is also the padding value),
duplicate-heavy runs, multi-tile ranges, validity masks, and agreement with
the hash and sort-merge paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.ops.merge_join import two_run_count
from partitionedhashjoin_tpu.ops.pallas.merge_probe import (
    BLOCK,
    CAP,
    ranged_merge_count,
    tile_build_side,
)

I32_MAX = np.iinfo(np.int32).max
I32_MIN = np.iinfo(np.int32).min


def _count(a, b, **kw):
    a = np.sort(np.asarray(a, np.int32))
    b = np.sort(np.asarray(b, np.int32))
    return int(ranged_merge_count(jnp.asarray(a), jnp.asarray(b),
                                  interpret=True, **kw))


def test_tile_layout_lane_contiguous():
    a = jnp.arange(5000, dtype=jnp.int32)
    tiles, n_tiles = tile_build_side(a)
    assert tiles.shape == (n_tiles, CAP // 128, 128)
    t = np.asarray(tiles)
    # tiles[k, r, l] = a_padded[CAP*k + SUBL*l + r]
    assert t[0, 0, 0] == 0 and t[0, 1, 0] == 1 and t[0, 0, 1] == 16
    assert t[1, 3, 2] == CAP + 16 * 2 + 3
    assert t[-1, -1, -1] == I32_MAX  # spare padding tile


@pytest.mark.parametrize("dom", [50, 8000, 2**31 - 1])
def test_random_counts_match_numpy(dom):
    rng = np.random.default_rng(dom)
    a = rng.integers(-dom, dom, 4000).astype(np.int32)
    b = rng.integers(-dom, dom, 70000).astype(np.int32)
    assert _count(a, b) == int(np.isin(b, a).sum())


def test_multi_tile_ranges():
    # build >> CAP with narrow probe blocks forces multi-chunk fori loops
    rng = np.random.default_rng(5)
    a = rng.integers(0, 3_000_000, 1_000_000).astype(np.int32)
    b = rng.integers(0, 3_000_000, BLOCK + 17).astype(np.int32)
    assert _count(a, b) == int(np.isin(b, a).sum())


def test_full_domain_edges():
    a = [I32_MAX, I32_MAX, 5, I32_MIN, -7]
    b = [I32_MAX, 5, 6, I32_MAX, -7, I32_MIN, I32_MIN]
    assert _count(a, b) == 6
    assert _count([5, -7], [I32_MAX, 5]) == 1  # padding must not match
    assert _count([I32_MAX], [I32_MAX] * 3) == 3


def test_empty_inputs():
    assert _count([], [1, 2]) == 0
    assert _count([1, 2], []) == 0


def test_two_run_count_agrees_with_sort_merge():
    from partitionedhashjoin_tpu.ops.sort_merge import sort_merge_count

    rng = np.random.default_rng(11)
    a = rng.integers(-(2**31), 2**31 - 1, 3000, dtype=np.int64).astype(np.int32)
    b = rng.integers(-(2**31), 2**31 - 1, 66000, dtype=np.int64).astype(np.int32)
    b[:30000] = rng.choice(a, 30000)
    got = int(two_run_count(jnp.asarray(a), jnp.asarray(b), interpret=True))
    want = int(sort_merge_count(jnp.asarray(a), jnp.asarray(b)))
    assert got == want == int(np.isin(b, a).sum())


def test_two_run_count_validity_masks_with_int32_max():
    a = np.asarray([I32_MAX, 5, 9, I32_MAX, 77], np.int32)
    av = np.asarray([True, True, False, False, True])
    b = np.tile(np.asarray([I32_MAX, 9, 5, 77, I32_MAX, 3], np.int32), 11000)
    bv = np.tile(np.asarray([True, True, False, True, False, True]), 11000)
    # valid build keys {I32_MAX, 5, 77}; per repeated group the counted rows
    # are I32_MAX (valid+present) and 77 -> 2 of 6
    got = int(
        two_run_count(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(av), jnp.asarray(bv),
            interpret=True,
        )
    )
    assert got == 22000


def test_radix_vmem_mode_joiner():
    from partitionedhashjoin_tpu.config import RadixClusteringConfiguration
    from partitionedhashjoin_tpu.data.table import make_table
    from partitionedhashjoin_tpu.ops.radix_cluster import RadixHashJoiner

    # interpret-mode Pallas does not run through the joiner (it requests the
    # compiled path); on CPU "auto" resolves to chained — assert that the
    # mode plumbing selects correctly and that "chained" still answers
    rng = np.random.default_rng(2)
    a_keys = rng.integers(0, 5000, 2500).astype(np.int32)
    b_keys = rng.integers(0, 5000, 9000).astype(np.int32)
    a = make_table(a_keys, np.arange(2500, dtype=np.int32))
    b = make_table(b_keys, np.arange(9000, dtype=np.int32))
    want = int(np.isin(b_keys, a_keys).sum())
    chained = RadixHashJoiner(
        RadixClusteringConfiguration(number_of_partitions=8, mode="chained"),
        seed=3,
    )
    assert chained.run(a, b) == want
    auto = RadixHashJoiner(
        RadixClusteringConfiguration(number_of_partitions=8), seed=3
    )
    assert auto.run(a, b) == want


def test_int64_kernel_interpret():
    import jax
    from partitionedhashjoin_tpu.ops.merge_join import two_run_count_i64
    from partitionedhashjoin_tpu.ops.pallas.merge_probe import split_i64

    with jax.enable_x64(True):
        # split_i64 preserves order lexicographically
        vals = jnp.asarray(
            [np.iinfo(np.int64).min, -(2**40), -1, 0, 1, 2**33, 2**40 + 5,
             np.iinfo(np.int64).max],
            jnp.int64,
        )
        h, l = split_i64(vals)
        pairs = list(zip(np.asarray(h).tolist(), np.asarray(l).tolist()))
        assert pairs == sorted(pairs)

        rng = np.random.default_rng(17)
        a = rng.integers(-(2**62), 2**62, 3000).astype(np.int64)
        b = rng.integers(-(2**62), 2**62, 66000).astype(np.int64)
        b[:20000] = rng.choice(a, 20000)
        got = int(two_run_count_i64(jnp.asarray(a), jnp.asarray(b),
                                    interpret=True))
        assert got == int(np.isin(b, a).sum())

        # edges: INT64_MAX present and absent
        M = np.iinfo(np.int64).max
        a2 = np.asarray([M, 5, -(2**50)], np.int64)
        b2 = np.asarray([M, M, 5, 7, -(2**50)], np.int64)
        assert int(two_run_count_i64(jnp.asarray(a2), jnp.asarray(b2),
                                     interpret=True)) == 4
        a3 = np.asarray([5], np.int64)
        b3 = np.asarray([M, 5], np.int64)
        assert int(two_run_count_i64(jnp.asarray(a3), jnp.asarray(b3),
                                     interpret=True)) == 1


def test_duplicate_run_spanning_tiles_work_list_capacity():
    """Round-2 review finding: the original work list enumerated EVERY tile
    of each block's range, so a duplicate run spanning T tiles was scanned
    T times by every block touching it and sum(ntiles) could exceed the
    static w_cap — excess items were silently dropped (undercount).  The
    run-start enumeration (_work_items) skips run-interior tiles, which
    both fixes the count and proves the bound."""
    # build: one key duplicated across 4 full tiles, then a second key
    a = np.concatenate(
        [np.full(4 * CAP, 10, np.int32), np.full(100, 20, np.int32)]
    )
    # probe: 5 blocks of the hot key (each block's range spans all 4+ dup
    # tiles under the old enumeration), then a block of key 20
    b = np.concatenate(
        [np.full(5 * BLOCK, 10, np.int32), np.full(BLOCK, 20, np.int32)]
    )
    assert _count(a, b) == b.size  # every probe row matches


def test_many_hot_runs_heavy_duplication():
    # dozens of multi-tile runs + unique tail; agreement with numpy
    rng = np.random.default_rng(11)
    hot = np.repeat(
        rng.choice(10_000, 24, replace=False).astype(np.int32),
        rng.integers(CAP, 3 * CAP, 24),
    )
    a = np.concatenate([hot, rng.integers(0, 10_000, 5_000).astype(np.int32)])
    b = rng.integers(-100, 10_100, 2 * BLOCK + 333).astype(np.int32)
    assert _count(a, b) == int(np.isin(b, a).sum())


def test_single_giant_run():
    # the entire build side is ONE key spanning many tiles
    a = np.full(10 * CAP + 7, 42, np.int32)
    b = np.asarray([41, 42, 43] * 1000, np.int32)
    assert _count(a, b) == 1000


def test_two_run_count_pallas_sorter_agrees():
    """The partition step's sort implementation (xla vs the Pallas
    bitonic/merge sorter) must be invisible in the count — including with
    validity masks, whose INT32_MAX sentinel rewriting happens BEFORE the
    selected sort."""
    from partitionedhashjoin_tpu.ops import merge_join

    rng = np.random.default_rng(23)
    a = rng.integers(-50, 50, 9000, dtype=np.int64).astype(np.int32)
    b = rng.integers(-80, 80, 40000, dtype=np.int64).astype(np.int32)
    av = rng.random(9000) < 0.9
    bv = rng.random(40000) < 0.8
    a[::701] = I32_MAX  # genuine INT32_MAX keys vs the sorter's padding
    want = int(
        two_run_count(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(av), jnp.asarray(bv),
            interpret=True,
        )
    )
    merge_join.set_sort_impl("pallas")
    try:
        got = int(
            two_run_count(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(av),
                jnp.asarray(bv), interpret=True,
            )
        )
    finally:
        merge_join.set_sort_impl("xla")
    valid_build = set(a[av].tolist())
    oracle = int(sum(1 for k, v in zip(b.tolist(), bv.tolist())
                     if v and k in valid_build))
    assert got == want == oracle


def test_int64_planes_pallas_sorter_agrees():
    """The int64 plane path with the Pallas tuple sorter as its 2-key plane
    sort: identical counts across the full int64 domain edges."""
    import jax
    from partitionedhashjoin_tpu.ops import merge_join
    from partitionedhashjoin_tpu.ops.merge_join import two_run_count_i64

    with jax.enable_x64(True):
        rng = np.random.default_rng(41)
        a = rng.integers(-(2**62), 2**62, 5000).astype(np.int64)
        b = rng.integers(-(2**62), 2**62, 30000).astype(np.int64)
        b[:9000] = rng.choice(a, 9000)
        M = np.iinfo(np.int64).max
        a[::97] = M
        b[::89] = M
        merge_join.set_sort_impl("pallas")
        try:
            got = int(two_run_count_i64(jnp.asarray(a), jnp.asarray(b),
                                        interpret=True))
        finally:
            merge_join.set_sort_impl("xla")
        assert got == int(np.isin(b, a).sum())


def test_sort_impl_switch_plumbing(monkeypatch):
    """The engine-wide sorter switch: env knob, auto resolution, rejection
    of unknown impls — the bench scripts depend on this exact contract."""
    from partitionedhashjoin_tpu.ops import merge_join as mj

    assert mj.get_sort_impl() == "xla"
    monkeypatch.setenv("PHJ_SORT_IMPL", "pallas")
    try:
        assert mj.set_sort_impl_from_env() == "pallas"
        assert mj.get_sort_impl() == "pallas"
    finally:
        mj.set_sort_impl("xla")
    monkeypatch.setenv("PHJ_SORT_IMPL", "xla")
    assert mj.set_sort_impl_from_env() == "xla"
    # auto: never the interpreter; pallas only on a Mosaic backend
    assert mj.resolve_sort_impl("auto", interpret=True) == "xla"
    assert mj.resolve_sort_impl("auto", interpret=False) == (
        "pallas" if mj.supported() else "xla"
    )
    assert mj.resolve_sort_impl("pallas", interpret=True) == "pallas"
    with pytest.raises(ValueError):
        mj.set_sort_impl("typo")
