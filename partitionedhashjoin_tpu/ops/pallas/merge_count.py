"""Fused merge-count Pallas kernel: the scan half of the sort-merge join.

After the stable sort, the XLA path computes the match count with separate
passes (where → cummax → compare → sum ≈ 150 ms at 210M rows on v5e).  This
kernel fuses them into ONE streaming pass: TPU grid steps execute
sequentially on a core, so an SMEM scratch carries the running maximum of
build keys across blocks — the segmented-scan carry the reference never
needed (its probe is row-at-a-time, src/NoPartitioning/HashJoin.hpp:144-157).

Block-local inclusive cummax is hierarchical on the (rows, 128) VMEM tile:
log2(128) masked-roll/max steps along lanes, a log-step scan over row
maxima, then a row-prefix broadcast.  ~15 VPU passes per element ≈ 0.05
ns/el, versus ~0.7 ns/el for the unfused XLA scans.

Semantics (matching ops/sort_merge.py's fast path): a probe row at sorted
position i matches iff the running max over ``where(is_build, key, INT_MIN)``
at i equals its key and the key is not INT_MIN.  The INT_MIN correction and
input padding rules live in the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MIN = jnp.iinfo(jnp.int32).min

#: rows x 128 lanes per grid step; 512*128 = 64K elements = 256KB int32/tile.
_BLOCK_ROWS = 512
LANES = 128
BLOCK = _BLOCK_ROWS * LANES


def _masked_roll_max(x, shift, axis, size):
    """max(x, x shifted down by `shift` along axis, INT_MIN-filled)."""
    rolled = pltpu.roll(x, shift, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.maximum(x, jnp.where(idx >= shift, rolled, _I32_MIN))


def _merge_count_kernel(keys_ref, tags_ref, out_ref, carry_ref, acc_ref):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0] = _I32_MIN
        acc_ref[0] = 0

    keys = keys_ref[:]  # (R, 128) int32, sorted ascending (row-major)
    tags = tags_ref[:]  # (R, 128) int32, 1 = build row
    is_build = tags > 0
    x = jnp.where(is_build, keys, _I32_MIN)

    # inclusive cummax along lanes
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = _masked_roll_max(x, s, 1, LANES)
    # per-row totals -> exclusive scan over rows
    row_last = x[:, LANES - 1 :]  # (R, 1)
    y = row_last
    s = 1
    while s < _BLOCK_ROWS:
        y = _masked_roll_max(y, s, 0, _BLOCK_ROWS)
        s *= 2
    # exclusive shift by one row, then fold in the cross-block carry
    y_shift = pltpu.roll(y, 1, axis=0)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    prefix = jnp.where(row_idx >= 1, y_shift, _I32_MIN)
    prefix = jnp.maximum(prefix, carry_ref[0])
    last_build = jnp.maximum(x, prefix)  # (R, 128) running max incl. carry

    hit = (
        jnp.logical_not(is_build)
        & (last_build == keys)
        & (keys != _I32_MIN)
    )
    acc_ref[0] = acc_ref[0] + jnp.sum(hit.astype(jnp.int32))
    carry_ref[0] = jnp.maximum(carry_ref[0], last_build[_BLOCK_ROWS - 1, LANES - 1])

    @pl.when(step == num_steps - 1)
    def _():
        out_ref[0] = acc_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def merge_count_sorted(
    keys_sorted: jax.Array,
    is_build_sorted: jax.Array,
    interpret: bool = False,
):
    """Count probe hits over the pre-sorted merged arrays (see module doc).

    ``keys_sorted`` ascending; ``is_build_sorted`` marks build rows, which
    precede equal-keyed probe rows (stable sort with builds concatenated
    first).  Inputs are padded here to a block multiple with (INT32_MAX,
    build) rows — appended after genuine INT32_MAX probe rows in sorted
    order, so they can never create a spurious match.
    """
    n = keys_sorted.shape[0]
    if n == 0:
        # a zero-sized grid fails Mosaic layout verification (and would
        # leave the SMEM output unwritten elsewhere)
        return jnp.asarray(0, jnp.int32)
    padded = (n + BLOCK - 1) // BLOCK * BLOCK
    keys = jnp.full((padded,), jnp.iinfo(jnp.int32).max, jnp.int32)
    keys = jax.lax.dynamic_update_slice(keys, keys_sorted.astype(jnp.int32), (0,))
    tags = jnp.ones((padded,), jnp.int32)
    tags = jax.lax.dynamic_update_slice(
        tags, is_build_sorted.astype(jnp.int32), (0,)
    )
    grid = padded // BLOCK
    out = pl.pallas_call(
        _merge_count_kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),  # carry: running build-key max
            pltpu.SMEM((1,), jnp.int32),  # accumulator
        ],
        interpret=interpret,
    )(
        keys.reshape(padded // LANES, LANES),
        tags.reshape(padded // LANES, LANES),
    )
    return out[0]


def supported() -> bool:
    """True when the current default backend runs Mosaic TPU kernels."""
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover
        return False
    return dev.platform in ("tpu", "axon") or "TPU" in str(dev)
