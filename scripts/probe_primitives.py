"""Primitive-cost probes: the measurements behind docs/PERFORMANCE.md.

Every kernel-design decision in the engine traces to a number printed by
this script (CLAUDE.md "Design invariants").  Run on the real chip:

    python scripts/probe_primitives.py --section all
    python scripts/probe_primitives.py --section sort,gather   # subset

Sections:
    stream    dispatch overhead, streaming bandwidth
    sort      XLA sort variants (the flagship's dominant cost)
    gather    XLA gather / scatter / searchsorted
    hist      one-hot histograms, partition-by-sort
    pallas    Mosaic support matrix: take_along_axis forms, in-kernel sort,
              VMEM block ceiling, dynamic-slice DMA, roll throughput
    merge     wide-table in-row binary search (the VMEM merge-join primitive)

Timing method: jit + one warmup, then min-of-3 with a host readback of a
small checksum (``jax.block_until_ready`` returns at enqueue on the axon
relay — docs/PERFORMANCE.md "Operational findings").  Unsupported forms
print FAILED with the error head; that support matrix is load-bearing
documentation (e.g. Mosaic's "Only 2D gather is supported").
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PROBE = 50_000_000
N_BUILD = 10_000_000

_V = pl.BlockSpec(memory_space=pltpu.VMEM)


def timed(name, fn, *args, iters=3, jit=True):
    """min-of-iters wall time with a forced host readback per call."""
    try:
        fn_j = jax.jit(fn) if jit else fn
        out = np.asarray(fn_j(*args))  # warmup + compile
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = np.asarray(fn_j(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:56s} {min(ts) * 1e3:10.2f} ms  out={out.ravel()[:2]}",
              flush=True)
        return min(ts)
    except Exception as e:  # noqa: BLE001 - a support probe failing IS data
        print(f"{name:56s} FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None


def make_relations():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    probe = jax.random.randint(k1, (N_PROBE,), 1, N_BUILD + 1, dtype=jnp.int32)
    build = jax.random.permutation(
        k2, jnp.arange(1, N_BUILD + 1, dtype=jnp.int32)
    )
    vals = jnp.arange(N_PROBE, dtype=jnp.int32)
    jax.block_until_ready((probe, build, vals))
    return probe, build, vals


# ---------------------------------------------------------------------------
# stream
# ---------------------------------------------------------------------------

def section_stream(probe, build, vals):
    x1 = jnp.ones((8, 128), jnp.float32)
    timed("tiny op (dispatch overhead)", lambda x: (x + 1).sum(), x1)
    timed("stream sum 50M int32", lambda p: p.sum(), probe)
    timed("elementwise x+1 50M (read+write) -> checksum",
          lambda p: (p + 1)[::1000001].sum(), probe)


# ---------------------------------------------------------------------------
# sort
# ---------------------------------------------------------------------------

def section_sort(probe, build, vals):
    timed("stable 1-key sort 50M -> checksum",
          lambda x: jax.lax.sort(x)[::1000001].sum(), probe)
    timed("UNstable 1-key sort 50M -> checksum",
          lambda x: jax.lax.sort((x,), num_keys=1, is_stable=False)[0][::1000001].sum(),
          probe)
    timed("stable (key+payload) sort 50M -> checksum",
          lambda x, v: sum(a[::1000001].sum()
                           for a in jax.lax.sort((x, v), num_keys=1)),
          probe, vals)
    timed("UNstable 2-KEY sort 50M -> checksum",
          lambda x, v: sum(a[::1000001].sum()
                           for a in jax.lax.sort((x, v), num_keys=2,
                                                 is_stable=False)),
          probe, vals)
    timed("sort build 10M -> checksum",
          lambda x: jax.lax.sort(x)[::999999].sum(), build)


# ---------------------------------------------------------------------------
# gather / scatter / searchsorted
# ---------------------------------------------------------------------------

def section_gather(probe, build, vals):
    build_sorted = jax.block_until_ready(jax.jit(jax.lax.sort)(build))
    timed("gather 50M from 10M -> checksum",
          lambda t, i: t[i - 1][::1000001].sum(), build, probe)
    small = jnp.arange(65536, dtype=jnp.int32)
    timed("gather 50M from 64K (256KB) -> checksum",
          lambda t, i: t[i & 65535][::1000001].sum(), small, probe)
    timed("4-wide window gather 50M -> checksum",
          lambda t, i: t[(i - 1)[:, None]
                         + jnp.arange(4, dtype=jnp.int32)[None, :]
                         & (N_BUILD - 1)][::1000001, :].sum(),
          build, probe)
    timed("scatter-add 50M into 10M -> checksum",
          lambda i: jnp.zeros(N_BUILD, jnp.int32).at[i - 1].add(1)[::999999].sum(),
          probe)
    timed("scatter-set 50M into 10M -> checksum",
          lambda i: jnp.zeros(N_BUILD, jnp.int32).at[i - 1].set(1)[::999999].sum(),
          probe)
    timed("searchsorted 50M -> 10M -> checksum",
          lambda p, b: jnp.searchsorted(b, p)[::1000001].sum(),
          probe, build_sorted)
    timed("cumsum 50M -> checksum",
          lambda p: jnp.cumsum(p)[::1000001].sum(), probe)
    timed("cummax 50M -> checksum",
          lambda p: jax.lax.cummax(p)[::1000001].sum(), probe)


# ---------------------------------------------------------------------------
# hist
# ---------------------------------------------------------------------------

def section_hist(probe, build, vals):
    def hist64(p):
        oh = (p & 63)[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :]
        return jnp.sum(oh, axis=0, dtype=jnp.int32).sum()

    timed("one-hot histogram P=64 (50M)", hist64, probe)

    def partition_sort(p, v):
        pid = p & 4095
        outs = jax.lax.sort((pid, p, v), num_keys=1, is_stable=True)
        return outs[1][::1000001].sum() + outs[2][::1000001].sum()

    timed("partition via stable sort P=4096 (50M)", partition_sort, probe, vals)

    def partition_sort_2key(p):
        pid = p & 4095
        outs = jax.lax.sort((pid, p), num_keys=2, is_stable=False)
        return outs[1][::1000001].sum()

    timed("partition via UNstable (pid,key) sort P=4096", partition_sort_2key,
          probe)


# ---------------------------------------------------------------------------
# pallas support matrix
# ---------------------------------------------------------------------------

def _pallas(name, kernel, out_shape, ins, **kw):
    def f(*a):
        return pl.pallas_call(kernel, out_shape=out_shape, **kw)(*a)
    return timed(name, f, *ins)


def section_pallas(probe, build, vals):
    # take_along_axis axis=1 (in-row lane gather) — the ONE supported
    # dynamic-gather form (axis=0 fails Mosaic's "Only 2D gather" check)
    def k_tala1(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    for w in (128, 256, 1024, 2048):
        tbl = jnp.tile((jnp.arange(w, dtype=jnp.int32) * 3)[None, :], (8, 1))
        idx = jax.random.randint(jax.random.PRNGKey(1), (8, w), 0, w, jnp.int32)
        _pallas(f"take_along_axis axis1 same-width W={w}", k_tala1,
                jax.ShapeDtypeStruct((8, w), jnp.int32), [tbl, idx],
                in_specs=[_V, _V], out_specs=_V)

    def k_tala0(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    tbl0 = jnp.tile(jnp.arange(256, dtype=jnp.int32)[:, None], (1, 128))
    idx0 = jnp.zeros((8, 128), jnp.int32)
    _pallas("take_along_axis axis0 (known-unsupported)", k_tala0,
            jax.ShapeDtypeStruct((8, 128), jnp.int32), [tbl0, idx0],
            in_specs=[_V, _V], out_specs=_V)

    def k_sort(x_ref, o_ref):
        o_ref[:] = jnp.sort(x_ref[:], axis=-1)

    xs = jax.random.randint(jax.random.PRNGKey(0), (8, 128), 0, 99, jnp.int32)
    _pallas("in-kernel jnp.sort (known-unsupported)", k_sort,
            jax.ShapeDtypeStruct((8, 128), jnp.int32), [xs],
            in_specs=[_V], out_specs=_V)

    # VMEM block ceiling: single in+out blocks of growing size
    def k_copy(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    for mb in (2, 4, 8, 12):
        rows = mb * 1024 * 1024 // (128 * 4)
        xb = jnp.ones((rows, 128), jnp.int32)
        _pallas(f"VMEM single block {mb}MB in + {mb}MB out", k_copy,
                jax.ShapeDtypeStruct((rows, 128), jnp.int32), [xb],
                in_specs=[_V], out_specs=_V)

    # pltpu.roll throughput: 16 rolls over a (512,128) grid-blocked 50M stream
    def k_roll(x_ref, o_ref):
        x = x_ref[:]
        for s in (1, 2, 4, 8, 16, 32, 64, 1, 2, 4, 8, 16, 32, 64, 1, 2):
            x = jnp.maximum(x, pltpu.roll(x, s, axis=1))
        o_ref[:] = x

    n_rows = 393216  # 50.3M elements
    xs50 = jax.random.randint(jax.random.PRNGKey(3), (n_rows, 128), 0,
                              1 << 30, jnp.int32)
    jax.block_until_ready(xs50)

    def f_roll(x):
        return pl.pallas_call(
            k_roll,
            grid=(n_rows // 512,),
            in_specs=[pl.BlockSpec((512, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
        )(x)[::100001, ::127].sum()

    timed("16 lane-rolls+max over 50M (VPU throughput)", f_roll, xs50)

    # dynamic-slice DMA: scalar-prefetched per-step offsets into an HBM
    # operand, copied to a VMEM scratch (the partition-merge access pattern)
    def k_dyndma(off_ref, hbm_ref, o_ref, scratch, sem):
        step = pl.program_id(0)
        dma = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(off_ref[step] * 8, 8)], scratch, sem
        )
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:]

    big = jnp.arange(4096 * 128, dtype=jnp.int32).reshape(4096, 128)
    offs = jnp.asarray([3, 0, 77, 1], jnp.int32)

    def f_dyndma(offs, big):
        return pl.pallas_call(
            k_dyndma,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(4,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                                pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
        )(offs, big)[::7, ::31].sum()

    timed("scalar-prefetch dynamic-slice DMA from HBM", f_dyndma, offs, big)


# ---------------------------------------------------------------------------
# merge: wide-table in-row binary search (the VMEM merge-join primitive)
# ---------------------------------------------------------------------------

def section_merge(probe, build, vals):
    # Each (row, lane) element binary-searches a W-entry sorted table that is
    # REPLICATED per row, via take_along_axis(axis=1) with idx narrower than
    # the table.  If supported + fast, this is the per-partition probe of the
    # radix join (sorted A_p in VMEM, any B block against it).
    def mk_search(w, steps):
        def kernel(t_ref, q_ref, o_ref):
            tbl = t_ref[:]          # (R, W) — every row the same sorted run
            q = q_ref[:]            # (R, 128) queries
            lo = jnp.zeros(q.shape, jnp.int32)
            hi = jnp.full(q.shape, w, jnp.int32)
            for _ in range(steps):
                mid = (lo + hi) >> 1
                got = jnp.take_along_axis(tbl, mid, axis=1)
                go_right = got <= q
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(go_right, hi, mid)
            # predecessor test: tbl[lo-1] == q  (lo = upper_bound)
            pred = jnp.take_along_axis(tbl, jnp.maximum(lo - 1, 0), axis=1)
            o_ref[:] = ((lo > 0) & (pred == q)).astype(jnp.int32)
        return kernel

    R = 512
    for w in (128, 1024, 2048):
        steps = max(1, int(np.ceil(np.log2(w))))
        tbl_row = jnp.sort(
            jax.random.randint(jax.random.PRNGKey(7), (w,), 0, 4 * w, jnp.int32)
        )
        tbl = jnp.tile(tbl_row[None, :], (R, 1))
        q = jax.random.randint(jax.random.PRNGKey(8), (R, 128), 0, 4 * w,
                               jnp.int32)
        _pallas(f"in-row binary search W={w} ({steps} gathers, one block)",
                mk_search(w, steps),
                jax.ShapeDtypeStruct((R, 128), jnp.int32), [tbl, q],
                in_specs=[_V, _V], out_specs=_V)

    # throughput at scale: 50M queries against a replicated 2048-entry run
    w, steps = 2048, 11
    n_rows = 393216
    tbl_row = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(9), (w,), 0, 1 << 30, jnp.int32)
    )
    tblR = jnp.tile(tbl_row[None, :], (R, 1))
    qbig = jax.random.randint(jax.random.PRNGKey(10), (n_rows, 128), 0,
                              1 << 30, jnp.int32)
    jax.block_until_ready((tblR, qbig))

    def f_big(tbl, q):
        return pl.pallas_call(
            mk_search(w, steps),
            grid=(n_rows // R,),
            in_specs=[pl.BlockSpec((R, w), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
        )(tbl, q).sum()

    timed(f"in-row binary search 50M queries vs W={w}", f_big, tblR, qbig)


SECTIONS = {
    "stream": section_stream,
    "sort": section_sort,
    "gather": section_gather,
    "hist": section_hist,
    "pallas": section_pallas,
    "merge": section_merge,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--section", default="all",
                    help="comma list of sections, or 'all'")
    args = ap.parse_args()
    names = (list(SECTIONS) if args.section == "all"
             else [s.strip() for s in args.section.split(",")])
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    probe, build, vals = make_relations()
    print(f"relations: probe={N_PROBE/1e6:.0f}M build={N_BUILD/1e6:.0f}M",
          flush=True)
    for s in names:
        print(f"\n== {s} ==", flush=True)
        SECTIONS[s](probe, build, vals)


if __name__ == "__main__":
    main()
