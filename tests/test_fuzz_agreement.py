"""Randomized cross-implementation agreement fuzzing.

Every joiner (sort-merge, no-partitioning, radix, distributed shuffle, both
local-join modes, pipelined exchange) plus the native host oracle must
produce identical Get-semantics counts on the same random relations across a
spread of shapes, key ranges, duplication levels, and skews.  This is the
deepest single correctness check in the suite: any divergence between two
independently-implemented paths is a bug in at least one of them.
"""

import numpy as np
import jax
import pytest

from partitionedhashjoin_tpu.config import RadixClusteringConfiguration
from partitionedhashjoin_tpu.data import host_loader
from partitionedhashjoin_tpu.data.table import make_table
from partitionedhashjoin_tpu.ops.no_partitioning import NoPartitioningHashJoiner
from partitionedhashjoin_tpu.ops.planner import PlannedJoiner
from partitionedhashjoin_tpu.ops.radix_cluster import RadixHashJoiner
from partitionedhashjoin_tpu.ops.sort_merge import SortMergeJoiner
from partitionedhashjoin_tpu.parallel.mesh import make_mesh, shard_table
from partitionedhashjoin_tpu.parallel.shuffle import DistributedShuffleJoiner

CASES = [
    # (seed, n_a, n_b, key_lo, key_hi, description)
    (0, 1024, 4096, 0, 5000, "sparse uniform"),
    (1, 2048, 8192, -1000, 1000, "negative keys, dense"),
    (2, 4096, 4096, 0, 100, "heavy duplication both sides"),
    (3, 512, 16384, 0, 200, "small build, hot probe"),
    (4, 8192, 8192, -(2**31), 2**31 - 1, "full int32 domain"),
    (5, 1024, 4096, 7, 8, "two-key degenerate"),
]


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_mesh(8)


@pytest.mark.parametrize("case", CASES, ids=[c[-1] for c in CASES])
def test_all_paths_agree(mesh8, case):
    seed, n_a, n_b, lo, hi, _ = case
    rng = np.random.default_rng(seed)
    a_keys = rng.integers(lo, hi, n_a, dtype=np.int64).astype(np.int32)
    b_keys = rng.integers(lo, hi, n_b, dtype=np.int64).astype(np.int32)
    a = make_table(a_keys, np.arange(n_a, dtype=np.int32))
    b = make_table(b_keys, np.arange(n_b, dtype=np.int32))
    expected = int(np.isin(b_keys, a_keys).sum())

    counts = {
        "numpy": expected,
        "host-oracle": host_loader.host_join_count(a_keys, b_keys, workers=4),
        "sort-merge": SortMergeJoiner().run(a, b),
        "no-partitioning": NoPartitioningHashJoiner(seed=seed + 1).run(a, b),
        "radix-64": RadixHashJoiner(
            RadixClusteringConfiguration(number_of_partitions=64),
            seed=seed + 2,
        ).run(a, b),
        "shuffle": DistributedShuffleJoiner(mesh8, seed=seed + 3).run(
            shard_table(a, mesh8), shard_table(b, mesh8)
        ),
        "shuffle-hash": DistributedShuffleJoiner(
            mesh8, seed=seed + 4, local_join="hash"
        ).run(shard_table(a, mesh8), shard_table(b, mesh8)),
        "shuffle-pipelined": DistributedShuffleJoiner(
            mesh8, seed=seed + 5, pipeline_chunks=2
        ).run(shard_table(a, mesh8), shard_table(b, mesh8)),
        "planned": PlannedJoiner().run(a, b),
    }
    assert len(set(counts.values())) == 1, counts
