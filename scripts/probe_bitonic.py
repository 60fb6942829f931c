"""On-chip measurement of the Pallas bitonic/merge sorter phases.

Measures, on the real TPU (run WITHOUT JAX_PLATFORMS=cpu):
  1. phase A  sort_blocks_i32 at 200M     -> in-register network ns/el
  2. phase B  merge_pass_i32 one pass     -> per-pass cost (incl. the
                                             XLA diagonal search)
  3. full     sort_i32 at 200M            -> vs jax.lax.sort's 428 ms
  4. XLA batched minor-axis run sorts     -> does XLA's sort cost scale
                                             as log^2(run length)?
Everything in ONE process (Pallas custom-call fingerprints do not
cache-hit across processes).  Stages gated by PHJ_PROBE_STAGES (csv).
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from partitionedhashjoin_tpu.ops.pallas import bitonic_sort as bs
from partitionedhashjoin_tpu.utils.device import sync

N = int(os.environ.get("PHJ_PROBE_N", 200_000_000))
STAGES = os.environ.get(
    "PHJ_PROBE_STAGES",
    "blocks,merge,full,blockrows,xla_phase_a,tuple,xla_runs",
).split(",")
# CPU smoke of the script logic itself (kernels in interpreter mode):
# PHJ_PROBE_INTERPRET=1 PHJ_PROBE_N=small — timings are meaningless there
INTERPRET = os.environ.get("PHJ_PROBE_INTERPRET", "") == "1"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed(label, fn, *args, repeats=3, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    sync(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    log(f"{label}: {best*1e3:.1f} ms ({best/N*1e9:.3f} ns/el)"
        f"   [first call {compile_s:.1f}s]")
    return out, best


def main():
    log(f"device: {jax.devices()[0]}; N={N}")
    # pad to an EVEN block count: the pair-validation reshapes and the
    # run=n/2 late pass both need padded/2 to be BLK-aligned (at the old
    # BLK-only padding, N=200M gave 24415 blocks — odd — and the stage
    # crashed; caught by the PHJ_PROBE_INTERPRET CPU smoke)
    padded = (N + 2 * bs.BLK - 1) // (2 * bs.BLK) * (2 * bs.BLK)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        return jax.random.randint(
            key, (padded,), -(2**31), 2**31 - 1, dtype=jnp.int32
        )

    x = gen(key)
    sync(x)
    log(f"generated {padded} int32 keys")

    # reference floor: XLA unstable 1-key sort
    @jax.jit
    def xla_sort(x):
        return jax.lax.sort((x,), num_keys=1, is_stable=False)[0]

    _, t_xla = timed("xla unstable 1-key sort (flat)", xla_sort, x)

    @jax.jit
    def checksum(y):
        ok = jnp.all(y[1:] >= y[:-1])
        s = jnp.sum(y.astype(jnp.int64)) if jax.config.jax_enable_x64 else \
            jnp.sum(y.astype(jnp.uint32))
        return ok, s

    t_blocks = t_merge = None
    if "blocks" in STAGES:
        y, t_blocks = timed("phase A sort_blocks_i32", bs.sort_blocks_i32, x,
                            interpret=INTERPRET)
        t = t_blocks
        # validate: every block ascending + multiset preserved (checksum)
        ok = bool(jnp.all(
            y.reshape(-1, bs.BLK)[:, 1:] >= y.reshape(-1, bs.BLK)[:, :-1]
        ))
        same = int(jnp.sum(y.astype(jnp.uint32))) == int(
            jnp.sum(x.astype(jnp.uint32)))
        log(f"  blocks ascending: {ok}, checksum match: {same}")

        if "merge" in STAGES:
            z, t_merge = timed(
                "phase B merge_pass (run=BLK)", bs.merge_pass_i32, y,
                jnp.int32(bs.BLK), interpret=INTERPRET,
            )
            t = t_merge
            ok = bool(jnp.all(
                z.reshape(-1, 2 * bs.BLK)[:, 1:]
                >= z.reshape(-1, 2 * bs.BLK)[:, :-1]
            ))
            same = int(jnp.sum(z.astype(jnp.uint32))) == int(
                jnp.sum(x.astype(jnp.uint32)))
            log(f"  merged pairs ascending: {ok}, checksum match: {same}")
            # a LATE pass: merge runs of padded/2 (one giant pair) to see
            # whether diagonal-search depth/gather cost grows
            big = jnp.int32(padded // 2)
            w, t_late = timed(
                "phase B merge_pass (run=n/2, presorted-halves input)",
                bs.merge_pass_i32,
                xla_runs_sort(x, 2), big, interpret=INTERPRET,
            )
            okb, s = checksum(w)
            log(f"  full-merge ascending: {bool(okb)}, checksum "
                f"{int(s) == int(jnp.sum(x.astype(jnp.uint32)))}")
            t_merge = max(t_merge, t_late)

    # the full sort is ONE fused program (phase A + ~log2(blocks) merge
    # passes); XLA programs beyond ~20-30 s crash the TPU worker
    # (CLAUDE.md), so skip it when the measured per-pass costs say the
    # fused program would trip the watchdog — the phase numbers above
    # already tell the design story in that case
    if "full" in STAGES and t_blocks is not None and t_merge is not None:
        n_passes = max(padded // (bs.ROWS * 128) - 1, 0).bit_length()
        est = t_blocks + n_passes * t_merge
        if est > 15.0:
            log(f"FULL sort_i32 SKIPPED: estimated {est:.1f}s fused program "
                f"({n_passes} passes x {t_merge*1e3:.0f} ms) would trip the "
                "~20-30s TPU worker watchdog")
            STAGES.remove("full")

    if "full" in STAGES:
        y, t = timed("FULL sort_i32", lambda v: bs.sort_i32(v, interpret=INTERPRET), x)
        okb, s = checksum(y)
        same = int(s) == int(jnp.sum(x.astype(jnp.uint32)))
        log(f"  fully ascending: {bool(okb)}, checksum match: {same}")
        log(f"  SPEEDUP vs XLA: {t_xla / t:.2f}x")

    if "blockrows" in STAGES:
        # phase-A block size: each 4x saves two HBM merge passes at zero
        # extra VPU stages (stage counts telescope); ceiling = VMEM/compile
        for rows in (256, 512, 1024):
            try:
                y, t = timed(
                    f"FULL sort_i32 block_rows={rows}",
                    lambda v, r=rows: bs.sort_i32_tuple(
                        v, block_rows=r, interpret=INTERPRET)[0], x,
                )
                okb, s = checksum(y)
                log(f"  ascending: {bool(okb)}, checksum "
                    f"{int(s) == int(jnp.sum(x.astype(jnp.uint32)))},"
                    f"  vs XLA {t_xla / t:.2f}x")
            except Exception as e:  # Mosaic limits surface per-size
                log(f"  block_rows={rows} FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")

    if "xla_phase_a" in STAGES:
        # hybrid: phase A = one batched minor-axis XLA sort (no network
        # compile ceiling -> big blocks -> fewer merge passes), phase B =
        # the Pallas merge passes
        for rows in (512, 2048, 8192, 32768):
            try:
                y, t = timed(
                    f"FULL sort phase_a=xla block_rows={rows}",
                    lambda v, r=rows: bs.sort_i32_tuple(
                        v, block_rows=r, phase_a="xla",
                        interpret=INTERPRET)[0], x,
                )
                okb, s = checksum(y)
                log(f"  ascending: {bool(okb)}, checksum "
                    f"{int(s) == int(jnp.sum(x.astype(jnp.uint32)))},"
                    f"  vs XLA {t_xla / t:.2f}x")
            except Exception as e:
                log(f"  phase_a=xla block_rows={rows} FAILED: "
                    f"{type(e).__name__}: {str(e)[:300]}")

    if "tuple" in STAGES:
        v = jax.random.randint(
            jax.random.PRNGKey(1), (padded,), -(2**31), 2**31 - 1,
            dtype=jnp.int32,
        )

        @jax.jit
        def xla2(x, v):
            return jax.lax.sort((x, v), num_keys=2, is_stable=False)

        _, t2 = timed("xla unstable 2-key sort", lambda a, b: xla2(a, b)[0],
                      x, v)
        y, t = timed(
            "pallas tuple sort k=2",
            lambda a, b: bs.sort_i32_tuple(a, b, interpret=INTERPRET)[0], x, v,
        )
        okb, s = checksum(y)
        log(f"  keys ascending: {bool(okb)}, checksum "
            f"{int(s) == int(jnp.sum(x.astype(jnp.uint32)))},"
            f"  vs XLA 2-key {t2 / t:.2f}x")

    if "xla_runs" in STAGES:
        for runs in (2, 8, 32, 128, 1024):
            L = padded // runs

            @jax.jit
            def rsort(x, runs=runs, L=L):
                return jax.lax.sort(
                    (x.reshape(runs, L),), num_keys=1, is_stable=False,
                    dimension=1,
                )[0].reshape(-1)

            timed(f"xla batched sort {runs} x {L}", rsort, x)


def xla_runs_sort(x, runs):
    L = x.shape[0] // runs

    @jax.jit
    def rsort(x):
        return jax.lax.sort(
            (x.reshape(runs, L),), num_keys=1, is_stable=False, dimension=1
        )[0].reshape(-1)

    return rsort(x)


if __name__ == "__main__":
    main()
