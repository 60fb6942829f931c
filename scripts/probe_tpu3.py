"""Round 3: find the supported in-kernel VMEM gather form + measure stream BW."""
import time
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timed(name, fn, *args, iters=3):
    try:
        fn_j = jax.jit(fn)
        out = np.asarray(fn_j(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = np.asarray(fn_j(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:48s} {min(ts)*1e3:9.2f} ms  out={out.ravel()[:2]}")
        return min(ts)
    except Exception as e:  # noqa: BLE001
        print(f"{name:48s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return None

# --- dispatch overhead
x1 = jnp.ones((8, 128), jnp.float32)
timed("tiny op (dispatch overhead)", lambda x: (x + 1).sum(), x1)

# --- stream bandwidth at 400MB
big = jnp.arange(100_000_000, dtype=jnp.int32)
timed("stream sum 100M int32 (400MB)", lambda p: p.sum(), big)
timed("elementwise x+1 100M (read+write 800MB)", lambda p: (p + 1)[::10000001].sum(), big)

# --- Pallas take_along_axis variants
def mk(kind, T, B):
    if kind == "axis1":
        # table (8, T) gathered along lanes; idx (8, T?) -> per (sublane) row gather
        def kern(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
        tbl = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None, :] * 2, (8, 1))
        idx = jax.random.randint(jax.random.PRNGKey(1), (8, T), 0, T, jnp.int32)
        out_shape = jax.ShapeDtypeStruct((8, T), jnp.int32)
        f = pl.pallas_call(kern, out_shape=out_shape,
                           in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                           out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        return f, (tbl, idx)
    if kind == "axis0":
        # table (T, 128); idx (B, 128); gather rows per-lane along sublane axis
        def kern(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)
        tbl = jnp.tile(jnp.arange(T, dtype=jnp.int32)[:, None] * 2, (1, 128))
        idx = jax.random.randint(jax.random.PRNGKey(1), (B, 128), 0, T, jnp.int32)
        out_shape = jax.ShapeDtypeStruct((B, 128), jnp.int32)
        f = pl.pallas_call(kern, out_shape=out_shape,
                           in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                           out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        return f, (tbl, idx)

for kind, T, B in [("axis1", 128, None), ("axis1", 1024, None), ("axis1", 8192, None),
                   ("axis0", 8, 256), ("axis0", 1024, 256), ("axis0", 8192, 256)]:
    f, args = mk(kind, T, B)
    timed(f"pallas take_along_axis {kind} T={T}", f, *args)

# --- throughput: big gather via axis1 within a grid
T = 2048
BLK_ROWS = 512  # (512, T) idx block per grid step

def gath_kernel(t_ref, i_ref, o_ref):
    tbl = t_ref[:]  # (8, T)
    idx = i_ref[:]  # (BLK_ROWS, T)? need idx rows of width T and 8-row table...
    # broadcast gather: reshape idx to (-1, T) rows, gather each row from tbl row 0
    tbl_b = jnp.broadcast_to(tbl[0:1, :], (BLK_ROWS, T))
    o_ref[:] = jnp.take_along_axis(tbl_b, idx, axis=1)

def big_gather(tbl, idx):
    n = idx.shape[0] // BLK_ROWS
    return pl.pallas_call(
        gath_kernel, grid=(n,),
        in_specs=[pl.BlockSpec((8, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BLK_ROWS, T), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK_ROWS, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
    )(tbl, idx)

NROWS = 24576  # 24576*2048 = 50.3M elements
tbl8 = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None, :], (8, 1))
idxbig = jax.random.randint(jax.random.PRNGKey(2), (NROWS, T), 0, T, jnp.int32)
jax.block_until_ready((tbl8, idxbig))
timed(f"pallas 50M gathers from {T}-entry VMEM tbl",
      lambda t, i: big_gather(t, i)[::1111, ::111].sum(), tbl8, idxbig)
