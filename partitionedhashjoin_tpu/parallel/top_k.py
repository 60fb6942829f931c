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


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "by", "descending")
)
def _dist_top_k_masked(mesh: Mesh, keys, pays, valid, k: int, by: str,
                       descending: bool):
    """Masked variant: validity-dominant 2-key sorts instead of
    ``lax.top_k`` — an invalid row can NEVER displace a tied valid row
    (the single-device ``_masked_order`` R4 rule; with a sentinel-ranked
    ``top_k`` a valid row whose rank equals the sentinel could lose its
    slot).  Costs a per-shard sort instead of a streaming pass — the
    masked path is a filtered query, mirroring query.py's single-device
    trade.  Also returns the global valid-row count (the result's live
    prefix is ``min(k, n_valid)``)."""

    def local(keys, pays, valid):
        col = keys[0] if by == "key" else pays[0]
        other = pays[0] if by == "key" else keys[0]
        ranked = _order_key(col, not descending)  # larger = better
        invalid = jnp.where(valid[0], 0, 1).astype(jnp.int32)
        # row position as a tie-break key: rows tied on (validity, order
        # value) resolve deterministically by global index, so the
        # carried column follows its row — mirrors _masked_order_impl
        # and the unmasked lax.top_k path (which breaks ties by index).
        # Shard id and local position stay SEPARATE sort keys: a fused
        # shard*n_local+i global position would wrap int32 beyond 2^31
        # total rows and invert the tie order on high shards.
        n_local = col.shape[0]
        pos = jnp.arange(n_local, dtype=jnp.int32)
        inv_s, nrank_s, pos_s, other_s = jax.lax.sort(
            (invalid, ~ranked, pos, other), num_keys=3, is_stable=False
        )
        gath = tuple(
            jax.lax.all_gather(c[:k], SHARD_AXIS, tiled=True)
            for c in (inv_s, nrank_s, pos_s, other_s)
        )
        ginv, gnrank, gpos, gother = gath
        shard = jnp.arange(gpos.shape[0], dtype=jnp.int32) // k
        finv, fnrank, _, _, fother = jax.lax.sort(
            (ginv, gnrank, shard, gpos, gother),
            num_keys=4, is_stable=False,
        )
        ranked_out = ~fnrank[:k]
        col_out = ~ranked_out if not descending else ranked_out
        n_valid = jax.lax.psum(
            jnp.sum(valid[0].astype(jnp.int32)), SHARD_AXIS
        )
        return (
            col_out[None],
            fother[:k][None],
            (finv[:k] == 0)[None],
            jnp.reshape(n_valid, (1,)),
        )

    sh = P(SHARD_AXIS)
    return _shard_map(
        local,
        mesh=mesh,
        in_specs=(sh, sh, sh),
        out_specs=(sh, sh, sh, sh),
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
    mask=None,
):
    """Exact global ORDER BY ... LIMIT k of a (possibly sharded) table.

    Matches ``ops.order_by.top_k`` on the unsharded data (same
    deterministic value order; the carried column follows its row).  ``k``
    must not exceed the per-shard row count (each shard must be able to
    hold k local candidates).

    Returns ``(table, n_live)`` where ``n_live`` is the live prefix of
    the k-row table (rows past it are zeroed).  Without a mask,
    ``n_live == k``; with one (a pushed-down FILTER, query.py R2/R6)
    ``n_live = min(k, #valid rows)`` — fewer than k rows may survive the
    filter, and an invalid row can never be selected (validity-dominant
    sort, see ``_dist_top_k_masked``).  The return shape is the same
    either way so callers can start passing a mask without a type change.
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
    if mask is not None:
        m = jnp.asarray(mask, jnp.bool_)
        if padded != n:
            m = jnp.concatenate([m, jnp.zeros((padded - n,), jnp.bool_)])
        valid = valid & m
        col, other, live, n_valid = _dist_top_k_masked(
            mesh, keys, pays, valid, k, by, descending
        )
        col, other, live = col[0], other[0], live[0]
        n_live = jnp.minimum(n_valid[0], jnp.asarray(k, jnp.int32))
        col = jnp.where(live, col, 0)
        other = jnp.where(live, other, 0)
        out = (
            make_table(col, other) if by == "key"
            else make_table(other, col)
        )
        return out, n_live
    col, other, _ = _dist_top_k(mesh, keys, pays, valid, k, by, descending)
    # every shard computed the same replicated answer; take shard 0's copy
    col, other = col[0], other[0]
    out = (
        make_table(col, other) if by == "key" else make_table(other, col)
    )
    return out, jnp.asarray(k, jnp.int32)
