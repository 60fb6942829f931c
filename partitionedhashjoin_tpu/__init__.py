"""partitionedhashjoin_tpu — a TPU-native vectorized query-execution engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
C++ benchmark suite ``ragoragino/partitionedhashjoin`` (the Blanas SIGMOD'11
no-partitioning and radix-partitioning main-memory hash joins), extended to a
fuller kernel suite (radix sort, filter, hash aggregate) and to multi-chip
execution over a ``jax.sharding.Mesh``.

Architecture (TPU-first, not a translation):

- The reference's latched pointer-chasing hash tables (src/HashTables/) become
  *sorted-array* tables plus vectorized merge kernels: on TPU there are no
  atomics and random HBM gathers run at ~7.5 ns/element, while 1-operand sorts
  stream at ~3 ns/element and merge scans run at full VPU rate.  Conflict
  freedom is by construction, exactly like the reference's scatter phase
  (src/RadixCluster/HashJoin.hpp:394-412) but for every phase.
- The reference's thread pool (src/Common/ThreadPool.*) becomes XLA: a single
  jitted program *is* the staged pipeline; multi-chip parallelism uses
  ``shard_map`` + collectives instead of worker threads.
- The reference's cache/TLB-conscious radix fan-out (src/RadixCluster/) becomes
  a VMEM-conscious partitioner: partitions sized so per-partition state fits
  VMEM during the merge/probe kernels.
"""

from partitionedhashjoin_tpu import config
from partitionedhashjoin_tpu.config import (
    Configuration,
    JoinAlgorithmType,
    OutputType,
    ResultsFormat,
)
from partitionedhashjoin_tpu.data.table import Table

__version__ = "0.1.0"

__all__ = [
    "Configuration",
    "JoinAlgorithmType",
    "OutputType",
    "ResultsFormat",
    "Table",
    "config",
]


def __getattr__(name):
    """Lazy convenience exports (joiners import jax; keep package import light)."""
    lazy = {
        "SortMergeJoiner": ("partitionedhashjoin_tpu.ops.sort_merge", "SortMergeJoiner"),
        "NoPartitioningHashJoiner": (
            "partitionedhashjoin_tpu.ops.no_partitioning",
            "NoPartitioningHashJoiner",
        ),
        "RadixHashJoiner": (
            "partitionedhashjoin_tpu.ops.radix_cluster",
            "RadixHashJoiner",
        ),
        "DistributedShuffleJoiner": (
            "partitionedhashjoin_tpu.parallel.shuffle",
            "DistributedShuffleJoiner",
        ),
        "sequential_table": (
            "partitionedhashjoin_tpu.ops.generators",
            "sequential_table",
        ),
        "zipf_table": ("partitionedhashjoin_tpu.ops.generators", "zipf_table"),
        "hash_aggregate": (
            "partitionedhashjoin_tpu.ops.aggregate",
            "hash_aggregate",
        ),
        "filter_table": ("partitionedhashjoin_tpu.ops.filter", "filter_table"),
        "sort_table": ("partitionedhashjoin_tpu.ops.sort", "sort_table"),
        "radix_sort_table": (
            "partitionedhashjoin_tpu.ops.sort",
            "radix_sort_table",
        ),
        "scan": ("partitionedhashjoin_tpu.query", "scan"),
        "Query": ("partitionedhashjoin_tpu.query", "Query"),
        "execute_sql": ("partitionedhashjoin_tpu.sql", "execute_sql"),
        "explain_sql": ("partitionedhashjoin_tpu.sql", "explain_sql"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'partitionedhashjoin_tpu' has no attribute {name!r}")
