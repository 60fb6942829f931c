"""Stats-driven join planner: pick the cheapest exact strategy from
measured build-side statistics before dispatching the probe.

The reference always runs the operator its flag selected (main.cpp:260-282
switches on the CLI enum and nothing else).  A query engine sits one level
up: it looks at the data first.  On TPU that planning layer is nearly free,
because plan decisions are host-side branches BETWEEN XLA dispatches and
the statistics come from the build sort the general join pays for anyway:

1. Sort the build side (one unstable 1-key sort — 39 ms at 10M, and the
   general two-run join needs exactly this sorted run as its input).
2. Read back three scalars: min, max, and ``covered`` — whether every
   integer in [min, max] occurs at least once (exact: sorted adjacent
   diffs all <= 1; duplicates allowed, Get-count semantics ignore them).
3. Branch on the host:

   - **covered** (every benchmark primary-key relation has this shape —
     the reference generator emits 1..N sequential, DataGenerator/
     Sequential.cpp): membership(q) == (min <= q <= max), so the probe
     collapses to ONE streaming compare+reduce — ~2 ms at 200M rows vs
     ~490 ms of probe sort + kernel probe.  No hashing, no sort, no
     gathers; exactness is unconditional because coverage was proven, not
     sampled.
   - otherwise: the general two-run kernel join (ops/merge_join.py),
     REUSING the already-sorted build run (the stats pass costs nothing
     extra); on backends without the Mosaic kernel, the XLA sort-merge
     count (ops/sort_merge.py).

The planner preserves Get semantics (each probe row counted once iff its
key exists among build keys) bit-for-bit with every other joiner — see
tests/test_planner.py's oracle and agreement cases, and the fuzz harness.

int64 keys work end-to-end under x64: stats and the interval count are
plain XLA (no Mosaic 32-bit limits), the general fallback routes to the
hi/lo-plane kernel (merge_probe.ranged_merge_count_i64).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from partitionedhashjoin_tpu.data.table import Table
from partitionedhashjoin_tpu.utils.logger import get_new_logger
from partitionedhashjoin_tpu.utils.results import IHashJoinTimer, NoOpHashJoinTimer


class BuildStats(NamedTuple):
    """Host-side build statistics driving the plan choice."""

    n: int
    key_min: int
    key_max: int
    #: True iff every integer in [key_min, key_max] occurs among the keys
    #: (duplicates permitted) — proven from the sorted run, never sampled.
    covered: bool


@jax.jit
def _sort_build(keys: jax.Array) -> jax.Array:
    return jax.lax.sort((keys,), num_keys=1, is_stable=False)[0]


@jax.jit
def _sorted_stats(a_sorted: jax.Array):
    """(min, max, covered) of a sorted key run.

    ``covered``: a sorted integer sequence covers its span iff no adjacent
    gap exceeds 1 — exact for any mix of duplicates.
    """
    lo = a_sorted[0]
    hi = a_sorted[-1]
    # wrap-safe gap test: true adjacent gaps are >= 0 (sorted) and < 2^w;
    # a gap >= 2^(w-1) wraps NEGATIVE in the key dtype (e.g. build
    # [INT32_MIN, INT32_MAX]: gap 2^32-1 -> -1), so "covered" requires the
    # computed diff to be non-negative as well as <= 1
    d = a_sorted[1:] - a_sorted[:-1]
    covered = jnp.all((d >= 0) & (d <= 1))
    return lo, hi, covered


@functools.partial(jax.jit, static_argnames=())
def _interval_count(
    probe_keys: jax.Array, lo: jax.Array, hi: jax.Array
) -> jax.Array:
    """Number of probe rows with lo <= key <= hi — the dense-build probe.
    One fused streaming pass; counts fit int32 (n_probe < 2^31)."""
    return jnp.sum(
        ((probe_keys >= lo) & (probe_keys <= hi)).astype(jnp.int32)
    )


def build_stats(build_keys: jax.Array) -> tuple[BuildStats, jax.Array]:
    """Sort the build keys and derive plan statistics.

    Returns (stats, sorted_keys); the sorted run is handed to the general
    join when the fast path does not apply, so the stats pass is free.
    """
    n = int(build_keys.shape[0])
    a_sorted = _sort_build(build_keys)
    if n == 0:
        return BuildStats(0, 0, 0, False), a_sorted
    lo, hi, covered = _sorted_stats(a_sorted)
    lo, hi, covered = jax.device_get((lo, hi, covered))
    return BuildStats(n, int(lo), int(hi), bool(covered)), a_sorted


def _plan(build_keys: jax.Array, probe_keys: jax.Array):
    """Stage 1: normalize dtypes, sort the build side, choose the plan.

    Returns (plan_name, execute) where execute() -> count array."""
    from partitionedhashjoin_tpu.ops import merge_join, sort_merge

    dtype = sort_merge._key_dtype(build_keys, probe_keys)
    build_keys = jnp.asarray(build_keys, dtype)
    probe_keys = jnp.asarray(probe_keys, dtype)

    stats, a_sorted = build_stats(build_keys)
    if stats.covered:
        lo = jnp.asarray(stats.key_min, dtype)
        hi = jnp.asarray(stats.key_max, dtype)
        return "interval", lambda: _interval_count(probe_keys, lo, hi)

    if merge_join.supported():
        from partitionedhashjoin_tpu.ops.pallas import merge_probe

        def kernel_probe():
            # reuse the sorted build run the stats pass produced
            b_sorted = jax.lax.sort(
                (probe_keys,), num_keys=1, is_stable=False
            )[0]
            if dtype == jnp.int64:
                return merge_probe.ranged_merge_count_i64(a_sorted, b_sorted)
            if jax.config.jax_enable_x64:
                # x64-off call guard, as in merge_join.two_run_count
                from jax._src.config import enable_x64 as _enable_x64

                with _enable_x64(False):
                    return merge_probe.ranged_merge_count_prepared(
                        a_sorted, b_sorted
                    )
            return merge_probe.ranged_merge_count_prepared(a_sorted, b_sorted)

        return "kernel", kernel_probe
    return "sort-merge", lambda: sort_merge.sort_merge_count(
        build_keys, probe_keys
    )


def planned_count(
    build_keys: jax.Array, probe_keys: jax.Array
) -> tuple[jax.Array, str]:
    """Get-semantics match count via the cheapest applicable plan.

    Returns (count, plan_name) with plan_name in {"interval", "kernel",
    "sort-merge"} for observability/testing.
    """
    if build_keys.shape[0] == 0 or probe_keys.shape[0] == 0:
        return jnp.asarray(0, jnp.int32), "interval"
    plan, execute = _plan(build_keys, probe_keys)
    return execute(), plan


class PlannedJoiner:
    """Planner-routed joiner with the reference's ``run(a, b, timer)``
    driver shape (src/NoPartitioning/HashJoin.hpp:60-103 for the phase
    protocol).  The build sort + stats readback is attributed to the build
    phase (it constructs the "index" the plan consults); the chosen probe
    to the probe phase."""

    def __init__(self, seed: Optional[int] = None) -> None:
        # seed unused (no hashing in any planned path); API symmetry
        self._logger = get_new_logger("PlannedJoiner")
        #: plan chosen by the most recent run (observability/tests)
        self.last_plan: Optional[str] = None

    def run(
        self,
        table_a: Table,
        table_b: Table,
        timer: Optional[IHashJoinTimer] = None,
    ) -> int:
        timer = timer or NoOpHashJoinTimer()
        if table_a.keys.shape[0] == 0 or table_b.keys.shape[0] == 0:
            timer.set_build_phase_begin()
            timer.set_build_phase_end()
            timer.set_probe_phase_begin()
            timer.set_probe_phase_end()
            self.last_plan = "interval"
            return 0
        timer.set_build_phase_begin()
        plan, execute = _plan(table_a.keys, table_b.keys)
        timer.set_build_phase_end()
        timer.set_probe_phase_begin()
        count = int(jax.device_get(execute()))
        timer.set_probe_phase_end()
        self.last_plan = plan
        self._logger.info(
            "Plan %s: number of joined tuples: %d", plan, count
        )
        return count
