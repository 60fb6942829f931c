"""A/B of the flagship two-run count join's partition-step sort on chip:
jax.lax.sort vs the Pallas bitonic/merge sorter (ops/pallas/bitonic_sort).

Same device data, same probe kernel, one process (Pallas custom-call
fingerprints do not cache-hit across processes) — the only variable is
merge_join.set_sort_impl.  Run WITHOUT JAX_PLATFORMS=cpu.

Env: PHJ_AB_PRIMARY (10M), PHJ_AB_SECONDARY (200M), PHJ_AB_SKEW (1.05),
PHJ_AB_IMPLS (csv of xla,pallas — default both).
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

from partitionedhashjoin_tpu.ops import merge_join
from partitionedhashjoin_tpu.ops.generators import sequential_table, zipf_keys
from partitionedhashjoin_tpu.utils.device import sync

N_A = int(os.environ.get("PHJ_AB_PRIMARY", 10_000_000))
N_B = int(os.environ.get("PHJ_AB_SECONDARY", 200_000_000))
SKEW = float(os.environ.get("PHJ_AB_SKEW", 1.05))
IMPLS = os.environ.get("PHJ_AB_IMPLS", "xla,pallas").split(",")
# CPU smoke of the script logic (kernels interpreted; timings meaningless)
INTERPRET = os.environ.get("PHJ_AB_INTERPRET", "") == "1"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log(f"device: {jax.devices()[0]}; {N_A} ⋈ {N_B}, skew {SKEW}")
    t0 = time.perf_counter()
    a = sequential_table(N_A).keys
    b = zipf_keys(jax.random.PRNGKey(20260816), N_B, SKEW, N_A)
    sync((a, b))
    log(f"generated in {time.perf_counter() - t0:.1f}s")

    results = {}
    for impl in IMPLS:
        merge_join.set_sort_impl(impl)
        t0 = time.perf_counter()
        c = merge_join.two_run_count(a, b, interpret=INTERPRET)
        sync(c)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c = merge_join.two_run_count(a, b, interpret=INTERPRET)
            sync(c)
            best = min(best, time.perf_counter() - t0)
        results[impl] = (best, int(jax.device_get(c)))
        log(f"{impl:7s}: {best*1e3:7.1f} ms  ({N_B/best/1e6:.0f}M rows/s)"
            f"  count={results[impl][1]}  [first call {compile_s:.1f}s]")
    merge_join.set_sort_impl("xla")
    if len(results) == 2:
        counts = {v[1] for v in results.values()}
        assert len(counts) == 1, f"COUNT MISMATCH: {results}"
        log(f"speedup pallas vs xla: "
            f"{results['xla'][0]/results['pallas'][0]:.2f}x")


if __name__ == "__main__":
    main()
