"""Distributed ORDER BY ... LIMIT k over the device mesh.

Every element of the global top-k is necessarily in its own shard's local
top-k, so the exact plan is: per-shard ``lax.top_k`` (streaming, no
relation reorder), ``all_gather`` the S·k candidates (tiny), and one
replicated final ``top_k`` — the classic scatter-gather LIMIT push-down.
Cost: one streaming pass over each shard + S·k rows on the wire.

Companion to ops/order_by.py (single-device) and the distributed
aggregate (parallel/aggregate_shuffle.py); the reference has no ordering
operator (see ops/order_by.py provenance notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from partitionedhashjoin_tpu.data.table import Table, make_table
from partitionedhashjoin_tpu.ops.order_by import _order_key
from partitionedhashjoin_tpu.parallel.mesh import SHARD_AXIS
from partitionedhashjoin_tpu.parallel.shuffle import _shard_map


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "by", "descending")
)
def _dist_top_k(mesh: Mesh, keys, pays, valid, k: int, by: str,
                descending: bool):
    def local(keys, pays, valid):
        col = keys[0] if by == "key" else pays[0]
        other = pays[0] if by == "key" else keys[0]
        ranked = _order_key(col, not descending)
        # invalid rows (host padding) rank strictly below everything real
        ranked = jnp.where(
            valid[0], ranked, jnp.iinfo(ranked.dtype).min
        )
        vals, idx = jax.lax.top_k(ranked, k)
        cand = (vals, other[idx], valid[0][idx])
        gath = tuple(
            jax.lax.all_gather(c, SHARD_AXIS, tiled=True) for c in cand
        )
        gvals, gother, gvalid = gath
        gvals = jnp.where(gvalid, gvals, jnp.iinfo(gvals.dtype).min)
        fvals, fidx = jax.lax.top_k(gvals, k)
        col_out = ~fvals if not descending else fvals
        return col_out[None], gother[fidx][None], gvalid[fidx][None]

    sh = P(SHARD_AXIS)
    return _shard_map(
        local,
        mesh=mesh,
        in_specs=(sh, sh, sh),
        out_specs=(sh, sh, sh),
        check_vma=False,
    )(
        keys.reshape(mesh.devices.size, -1),
        pays.reshape(mesh.devices.size, -1),
        valid.reshape(mesh.devices.size, -1),
    )


def distributed_top_k(
    mesh: Mesh,
    table: Table,
    k: int,
    by: str = "key",
    descending: bool = True,
) -> Table:
    """Exact global ORDER BY ... LIMIT k of a (possibly sharded) table.

    Matches ``ops.order_by.top_k`` on the unsharded data (same
    deterministic value order; the carried column follows its row).  ``k``
    must not exceed the per-shard row count (each shard must be able to
    hold k local candidates).
    """
    if by not in ("key", "payload"):
        raise ValueError(f"by must be 'key' or 'payload', got {by!r}")
    n = table.size
    s = int(mesh.devices.size)
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if k > n:
        raise ValueError(f"k={k} exceeds table size {n}")
    padded = (n + s - 1) // s * s
    keys, pays = table.keys, table.payloads
    if padded != n:
        pad = padded - n
        keys = jnp.concatenate([keys, jnp.zeros((pad,), keys.dtype)])
        pays = jnp.concatenate([pays, jnp.zeros((pad,), pays.dtype)])
    if k > padded // s:
        raise ValueError(
            f"k={k} exceeds the per-shard row count {padded // s}; "
            "use order_by on gathered data for relation-sized limits"
        )
    valid = jnp.arange(padded, dtype=jnp.int32) < n
    col, other, _ = _dist_top_k(mesh, keys, pays, valid, k, by, descending)
    # every shard computed the same replicated answer; take shard 0's copy
    col, other = col[0], other[0]
    if by == "key":
        return make_table(col, other)
    return make_table(other, col)
