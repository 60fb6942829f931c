"""Radix partitioning + radix join tests.

Covers the reference's partition-pipeline semantics (histogram / prefix-sum
boundaries / stable scatter, src/RadixCluster/HashJoin.hpp:333-440) and
end-to-end radix-join counts against numpy oracles across partition counts
(the generate.sh sweep's P axis, scripts/generate.sh:77).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.config import RadixClusteringConfiguration
from partitionedhashjoin_tpu.data.table import make_table
from partitionedhashjoin_tpu.ops import radix
from partitionedhashjoin_tpu.ops.generators import sequential_table, zipf_table
from partitionedhashjoin_tpu.ops.radix_cluster import RadixHashJoiner

SEED = jnp.uint32(99)


def _partition_oracle(keys, num_partitions):
    pid = np.asarray(radix.partition_ids(jnp.asarray(keys), SEED, num_partitions))
    hist = np.bincount(pid, minlength=num_partitions)
    return pid, hist


def test_partition_ids_range_and_determinism():
    keys = np.arange(-500, 500, dtype=np.int32)
    pid = np.asarray(radix.partition_ids(jnp.asarray(keys), SEED, 64))
    assert pid.min() >= 0 and pid.max() < 64
    pid2 = np.asarray(radix.partition_ids(jnp.asarray(keys), SEED, 64))
    np.testing.assert_array_equal(pid, pid2)
    # different seed -> different assignment
    pid3 = np.asarray(radix.partition_ids(jnp.asarray(keys), jnp.uint32(100), 64))
    assert not np.array_equal(pid, pid3)


def test_partition_ids_rejects_non_pow2():
    with pytest.raises(ValueError):
        radix.partition_ids(jnp.arange(4, dtype=jnp.int32), SEED, 33)


def test_dense_partition_regions_and_stability():
    rng = np.random.default_rng(1)
    keys = rng.integers(-(2**31), 2**31 - 1, 4000, dtype=np.int32)
    pay = np.arange(4000, dtype=np.int32)
    pr = radix.radix_partition(jnp.asarray(keys), jnp.asarray(pay), SEED, 32)
    pid, hist = _partition_oracle(keys, 32)
    np.testing.assert_array_equal(np.asarray(pr.histogram), hist)
    np.testing.assert_array_equal(
        np.asarray(pr.offsets), np.cumsum(hist) - hist
    )
    off, pk, pp, rid = (
        np.asarray(pr.offsets),
        np.asarray(pr.keys),
        np.asarray(pr.payloads),
        np.asarray(pr.row_ids),
    )
    for p in range(32):
        sel = slice(off[p], off[p] + hist[p])
        # stable: original arrival order preserved within partition
        np.testing.assert_array_equal(pk[sel], keys[pid == p])
        np.testing.assert_array_equal(pp[sel], pay[pid == p])
        np.testing.assert_array_equal(rid[sel], np.where(pid == p)[0])


def test_padded_partition_blocks_never_straddle():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 10_000, 3000).astype(np.int32)
    pay = np.arange(3000, dtype=np.int32)
    block = 256
    pr = radix.radix_partition_padded(
        jnp.asarray(keys), jnp.asarray(pay), SEED, 16, block
    )
    pid, hist = _partition_oracle(keys, 16)
    off, rid, pk = (
        np.asarray(pr.offsets),
        np.asarray(pr.row_ids),
        np.asarray(pr.keys),
    )
    assert (off % block == 0).all()
    for p in range(16):
        np.testing.assert_array_equal(
            pk[off[p] : off[p] + hist[p]], keys[pid == p]
        )
        padded = (hist[p] + block - 1) // block * block
        assert (rid[off[p] + hist[p] : off[p] + padded] == -1).all()
    # valid rows overall == n
    assert (rid >= 0).sum() == 3000


@pytest.mark.parametrize("num_partitions", [1, 2, 32, 128])
def test_radix_join_matches_numpy_oracle(num_partitions):
    rng = np.random.default_rng(num_partitions)
    a_keys = rng.choice(np.arange(1, 4000, dtype=np.int32), 2000, replace=False)
    b_keys = rng.integers(1, 4000, 7000).astype(np.int32)
    a = make_table(a_keys, np.arange(2000, dtype=np.int32))
    b = make_table(b_keys, np.arange(7000, dtype=np.int32))
    joiner = RadixHashJoiner(
        RadixClusteringConfiguration(number_of_partitions=num_partitions),
        seed=77,
    )
    assert joiner.run(a, b) == int(np.isin(b_keys, a_keys).sum())


def test_radix_join_benchmark_invariant_with_skew():
    # Zipf probe over the sequential primary's exact key range: every probe
    # row matches (main.cpp:35-79 workload construction).
    n = 1500
    a = sequential_table(n)
    b = zipf_table(8000, alpha=1.25, key_range=(1, n), seed=3)
    joiner = RadixHashJoiner(
        RadixClusteringConfiguration(number_of_partitions=64), seed=11
    )
    assert joiner.run(a, b) == 8000


def test_radix_join_agrees_with_no_partitioning():
    from partitionedhashjoin_tpu.ops.no_partitioning import (
        NoPartitioningHashJoiner,
    )

    rng = np.random.default_rng(9)
    a_keys = rng.integers(0, 5000, 1000).astype(np.int32)  # duplicates allowed
    b_keys = rng.integers(0, 5000, 4000).astype(np.int32)
    a = make_table(a_keys, np.arange(1000, dtype=np.int32))
    b = make_table(b_keys, np.arange(4000, dtype=np.int32))
    c_np = NoPartitioningHashJoiner(seed=1).run(a, b)
    c_rx = RadixHashJoiner(
        RadixClusteringConfiguration(number_of_partitions=16), seed=2
    ).run(a, b)
    assert c_np == c_rx == int(np.isin(b_keys, a_keys).sum())


def test_rejects_non_pow2_partitions():
    with pytest.raises(ValueError):
        RadixHashJoiner(RadixClusteringConfiguration(number_of_partitions=6))


@pytest.mark.parametrize("passes", [1, 2, 3])
def test_multipass_radix_partition_identical_layout(passes):
    # LSD multi-pass digit sorts must produce exactly the single-pass layout
    rng = np.random.default_rng(passes)
    keys = rng.integers(-(2**31), 2**31 - 1, 6000, dtype=np.int32)
    one, hist1, off1 = radix.radix_partition_keys(
        jnp.asarray(keys), SEED, 256, passes=1
    )
    multi, histm, offm = radix.radix_partition_keys(
        jnp.asarray(keys), SEED, 256, passes=passes
    )
    np.testing.assert_array_equal(np.asarray(one), np.asarray(multi))
    np.testing.assert_array_equal(np.asarray(hist1), np.asarray(histm))
    np.testing.assert_array_equal(np.asarray(off1), np.asarray(offm))


def test_multipass_with_non_divisible_bits():
    # 32 partitions = 5 bits, 2 passes -> 3+2 bit digits; layout unchanged
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 10_000, 3000).astype(np.int32)
    one, _, _ = radix.radix_partition_keys(jnp.asarray(keys), SEED, 32, passes=1)
    two, _, _ = radix.radix_partition_keys(jnp.asarray(keys), SEED, 32, passes=2)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(two))


def test_radix_join_multipass_agrees():
    rng = np.random.default_rng(41)
    a_keys = rng.integers(0, 4000, 1500).astype(np.int32)
    b_keys = rng.integers(0, 4000, 6000).astype(np.int32)
    a = make_table(a_keys, np.arange(1500, dtype=np.int32))
    b = make_table(b_keys, np.arange(6000, dtype=np.int32))
    c2 = RadixHashJoiner(
        RadixClusteringConfiguration(number_of_partitions=64, partition_passes=2),
        seed=5,
    ).run(a, b)
    assert c2 == int(np.isin(b_keys, a_keys).sum())
