"""Hash aggregate: GROUP BY key with COUNT / SUM / MIN / MAX.

Part of the extended db_exec_kernel suite (BASELINE.json configs[3],
"Filter + hash-aggregate pipeline"); the reference has no aggregate operator.

TPU-native hash aggregation, no sort: the deduplicating claim loop
(ops/hash_table.py::build_dedup_hash_table) maps every row to a canonical
representative row of its key in O(distinct-collision-chain) rounds —
independent of duplication, so Zipf heads cost nothing extra.  Group ids are
densified with a flag + prefix sum, and all aggregates are conflict-free
scatter-adds/mins/maxes onto the group vector (XLA scatter-add is
deterministic on TPU — the reference would have needed its latch/atomic
machinery here).

Output arrays have static capacity = number of input rows; ``num_groups``
bounds the valid prefix.  Group order is hash-table claim order (i.e.
arbitrary but deterministic given the seed), matching unordered GROUP BY
semantics.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from partitionedhashjoin_tpu.data.table import Table
from partitionedhashjoin_tpu.ops import hash_table as ht

_I32_MAX = jnp.iinfo(jnp.int32).max
_I32_MIN = jnp.iinfo(jnp.int32).min


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GroupByResult:
    """GROUP BY output: per-group key + aggregates, valid in [0, num_groups)."""

    keys: jax.Array  # int32[n] group keys
    count: jax.Array  # int32[n] COUNT(*)
    sum: jax.Array  # payload-dtype[n] SUM(payload)
    min: jax.Array  # payload-dtype[n] MIN(payload)
    max: jax.Array  # payload-dtype[n] MAX(payload)
    num_groups: jax.Array  # int32 scalar
    group_of_row: jax.Array  # int32[n] dense group id per input row


@functools.partial(jax.jit, static_argnames=("size", "has_valid"))
def _group_and_aggregate(
    keys: jax.Array,
    payloads: jax.Array,
    seed: jax.Array,
    size: int,
    valid: "jax.Array | None" = None,
    has_valid: bool = False,
) -> GroupByResult:
    n = keys.shape[0]
    _, rep_row = ht.build_dedup_hash_table(
        keys, seed, size, valid=valid, has_valid=has_valid
    )
    # densify representatives -> group ids 0..G-1 (stable in row order);
    # invalid rows keep rep_row == -1 and aggregate into the dump slot
    safe_rep = jnp.where(rep_row >= 0, rep_row, n)
    is_rep_flag = (
        jnp.zeros((n,), jnp.int32).at[safe_rep].max(1, mode="drop")
    )
    dense_of_row = jnp.cumsum(is_rep_flag) - is_rep_flag  # id at rep positions
    gid = jnp.where(
        rep_row >= 0, dense_of_row[jnp.maximum(rep_row, 0)], n
    )
    num_groups = jnp.sum(is_rep_flag)

    ones = jnp.ones((n,), jnp.int32)
    count = jnp.zeros((n,), jnp.int32).at[gid].add(ones, mode="drop")
    sum_ = jnp.zeros((n,), payloads.dtype).at[gid].add(payloads, mode="drop")
    # MIN/MAX keep the payload dtype like SUM does (an int32 cast would
    # silently truncate int64 payloads in min/max only — round-1 ADVICE)
    pinfo = (
        jnp.iinfo(payloads.dtype)
        if jnp.issubdtype(payloads.dtype, jnp.integer)
        else jnp.finfo(payloads.dtype)
    )
    min_ = jnp.full((n,), pinfo.max, payloads.dtype).at[gid].min(
        payloads, mode="drop"
    )
    max_ = jnp.full((n,), pinfo.min, payloads.dtype).at[gid].max(
        payloads, mode="drop"
    )
    group_keys = jnp.zeros((n,), keys.dtype).at[gid].set(keys, mode="drop")
    return GroupByResult(
        keys=group_keys,
        count=count,
        sum=sum_,
        min=min_,
        max=max_,
        num_groups=num_groups,
        group_of_row=jnp.where(gid < n, gid, -1),
    )


def hash_aggregate(table: Table, seed: int = 0) -> GroupByResult:
    """GROUP BY ``table.keys``, aggregating ``table.payloads``."""
    size = ht.table_size_for(table.size)
    seed_dev = jnp.asarray(seed & 0xFFFFFFFF, jnp.uint32)
    return _group_and_aggregate(table.keys, table.payloads, seed_dev, size)


def filter_aggregate(table: Table, predicate, seed: int = 0) -> GroupByResult:
    """Filter → hash-aggregate pipeline (BASELINE.json configs[3]:
    "Filter + hash-aggregate pipeline on generated key/value tables").

    Rows failing ``predicate(keys, payloads)`` are excluded via the dedup
    table's validity mechanism (they are never inserted, keep ``rep_row ==
    -1``, and aggregate into a dropped dump slot) — no materialized
    intermediate table, so XLA fuses the mask directly into the group-by
    scatters.

    Returns ``(GroupByResult of the selected rows, selected_row_count)``;
    ``group_of_row`` is -1 for filtered-out rows.
    """
    mask = predicate(table.keys, table.payloads)
    g = _group_and_aggregate(
        table.keys,
        table.payloads,
        jnp.asarray(seed & 0xFFFFFFFF, jnp.uint32),
        ht.table_size_for(table.size),
        valid=mask,
        has_valid=True,
    )
    return g, jnp.sum(mask.astype(jnp.int32))
