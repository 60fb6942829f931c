"""Microbenchmarks that decide the engine's kernel architecture.

Measures the primitives a hash join can be built from on this TPU:
sort, argsort, searchsorted, gather (take), scatter-add, and an in-kernel
Pallas VMEM dynamic gather. Run on the real chip.
"""
import time
import functools
import jax
import jax.numpy as jnp
import numpy as np

N_PROBE = 50_000_000   # scaled-down probe side (probe 200M later)
N_BUILD = 10_000_000

def timed(name, fn, *args, iters=3):
    try:
        fn_j = jax.jit(fn)
        out = fn_j(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn_j(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:40s} {min(ts)*1e3:10.2f} ms")
        return min(ts)
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
probe = jax.random.randint(k1, (N_PROBE,), 1, N_BUILD + 1, dtype=jnp.int32)
build = jax.random.permutation(k2, jnp.arange(1, N_BUILD + 1, dtype=jnp.int32))
vals = jnp.arange(N_PROBE, dtype=jnp.int32)
jax.block_until_ready((probe, build, vals))

print(f"probe={N_PROBE/1e6}M build={N_BUILD/1e6}M on {jax.devices()[0].device_kind}")

timed("sort probe (keys only)", lambda x: jax.lax.sort(x), probe)
timed("sort probe (key+payload)", lambda x, v: jax.lax.sort((x, v), num_keys=1), probe, vals)
timed("sort build (key only)", lambda x: jax.lax.sort(x), build)
build_sorted = jax.jit(jax.lax.sort)(build)
jax.block_until_ready(build_sorted)
timed("searchsorted probe->build(10M)", lambda p, b: jnp.searchsorted(b, p), probe, build_sorted)
timed("gather 50M from 10M table", lambda t, i: t[i - 1], build, probe)
timed("scatter-add 50M into 10M", lambda i: jnp.zeros(N_BUILD, jnp.int32).at[i - 1].add(1), probe)
timed("bincount-free direct compare+sum", lambda p: jnp.sum((p >= 1) & (p <= N_BUILD)), probe)

# histogram via small-P modular partition count (one-hot sum), P=64
def hist64(p):
    pid = (p & 63)
    oh = (pid[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :])
    return jnp.sum(oh, axis=0, dtype=jnp.int32)
timed("one-hot histogram P=64 (50M)", hist64, probe)

# Pallas: VMEM dynamic gather inside kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TBL = 8192
BLK = 65536

def gather_kernel(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[:]          # (TBL,) table in VMEM
    idx = idx_ref[:]          # (BLK,) indices
    out_ref[:] = jnp.take(tbl, idx, axis=0)

def pallas_gather(tbl, idx):
    grid = idx.shape[0] // BLK
    return pl.pallas_call(
        gather_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TBL,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
    )(tbl, idx)

tbl = jnp.arange(TBL, dtype=jnp.int32)
idx8 = probe[: (N_PROBE // BLK) * BLK] & (TBL - 1)
jax.block_until_ready((tbl, idx8))
timed("pallas VMEM gather (8K tbl, ~50M idx)", pallas_gather, tbl, idx8)

# 2D variant (lane-friendly): table (8, 1024), gather along last axis
def gather2d_kernel(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[:]          # (1, TBL)
    idx = idx_ref[:]          # (8, BLK/8)
    out_ref[:] = jnp.take(tbl[0], idx, axis=0)

def pallas_gather2d(tbl, idx):
    grid = idx.shape[0] // 512
    return pl.pallas_call(
        gather2d_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, TBL), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((512, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
    )(tbl, idx)

idx2d = idx8[: (idx8.shape[0] // (512 * 1024)) * 512 * 1024].reshape(-1, 1024)
tbl2d = tbl.reshape(1, TBL)
jax.block_until_ready((idx2d, tbl2d))
timed("pallas VMEM gather 2D (8K tbl)", pallas_gather2d, tbl2d, idx2d)
