"""Bisect which merge-kernel ingredient SIGABRTs Mosaic's
ApplyVectorLayout pass on chip (vector_extract_strided_slice,
Array::Slice limits<=dim check).  Each stage compiles one mini-kernel
containing a single ingredient; run on the real TPU.

Stages via PHJ_BISECT_STAGES (csv): rotate, reverse, merge, dma, where,
full.  Each compile is ~seconds; a SIGABRT kills only the compile helper
(the process gets an INTERNAL error and moves on).
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from partitionedhashjoin_tpu.ops.pallas import bitonic_sort as bs

STAGES = os.environ.get(
    "PHJ_BISECT_STAGES", "rotate,reverse,merge,where,dma,full"
).split(",")

WIN = bs.WIN_ROWS
ROWS = bs.ROWS
LANES = bs.LANES


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def try_stage(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        log(f"{name}: OK")
    except Exception as e:
        log(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


def main():
    x = jnp.arange(WIN * LANES, dtype=jnp.int32).reshape(WIN, LANES)
    r = jnp.int32(5)

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)

    if "rotate" in STAGES:
        def k(x_ref, r_ref, o_ref):
            o_ref[...] = bs._rotate_left(x_ref[...], r_ref[0])

        try_stage("rotate", lambda: pl.pallas_call(
            k,
            in_specs=[spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=spec,
            out_shape=oshape,
        )(x, jnp.full((1,), 5, jnp.int32)))

    if "reverse" in STAGES:
        def k(x_ref, o_ref):
            o_ref[...] = bs._reverse_block(x_ref[...])

        try_stage("reverse", lambda: pl.pallas_call(
            k, in_specs=[spec], out_specs=spec, out_shape=oshape,
        )(x[:ROWS]))

    if "merge" in STAGES:
        def k(x_ref, o_ref):
            o_ref[...] = bs._bitonic_merge_block([x_ref[...]])[0]

        try_stage("merge_block", lambda: pl.pallas_call(
            k, in_specs=[spec], out_specs=spec, out_shape=oshape,
        )(x[:ROWS]))

    if "where" in STAGES:
        def k(x_ref, o_ref):
            i = bs._flat_iota()
            v = x_ref[...]
            o_ref[...] = jnp.where(i < 100, v, bs._reverse_block(v))

        try_stage("where+reverse", lambda: pl.pallas_call(
            k, in_specs=[spec], out_specs=spec, out_shape=oshape,
        )(x[:ROWS]))

    if "dma" in STAGES:
        # scratch window DMA + dynamic slot read, no vector tricks
        def k(start_ref, hbm, o_ref, win, sem):
            w = pl.program_id(0)
            slot = jax.lax.rem(w, 2)
            pltpu.make_async_copy(
                hbm.at[pl.ds(start_ref[w], ROWS + 1)],
                win.at[slot, pl.ds(0, ROWS + 1)],
                sem.at[slot],
            ).start()
            pltpu.make_async_copy(
                hbm.at[pl.ds(start_ref[w], ROWS + 1)],
                win.at[slot, pl.ds(0, ROWS + 1)],
                sem.at[slot],
            ).wait()
            o_ref[...] = win[slot][:ROWS]

        big = jnp.arange(4 * WIN * LANES, dtype=jnp.int32).reshape(
            4 * WIN, LANES)
        try_stage("dma_window", lambda: pl.pallas_call(
            k,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(2,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (ROWS, LANES), lambda w, *_: (w, 0),
                    memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, WIN, LANES), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((2 * ROWS, LANES), jnp.int32),
        )(jnp.array([0, 8], jnp.int32), big))

    if "full" in STAGES:
        y = bs.sort_blocks_i32(
            jnp.arange(4 * bs.BLK, dtype=jnp.int32)[::-1].astype(jnp.int32)
            if False else
            jax.random.randint(jax.random.PRNGKey(0), (4 * bs.BLK,),
                               -2**31, 2**31 - 1, dtype=jnp.int32))
        try_stage("full_merge_pass", lambda: bs.merge_pass_i32(
            y, jnp.int32(bs.BLK)))


if __name__ == "__main__":
    main()
