"""ops/planner.py: stats-driven plan selection with exact fallbacks.

The planner's contract: identical Get-semantics counts to every other
joiner, with the interval fast path taken ONLY when coverage of
[min, max] is proven from the sorted build run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from partitionedhashjoin_tpu.data.table import Table
from partitionedhashjoin_tpu.ops import planner
from partitionedhashjoin_tpu.ops.sort_merge import sort_merge_count


def _oracle(build, probe):
    return int(np.isin(np.asarray(probe), np.asarray(build)).sum())


def test_dense_sequential_build_takes_interval_plan():
    build = jnp.arange(1, 1001, dtype=jnp.int32)
    probe = jnp.asarray(
        np.random.default_rng(0).integers(-50, 1200, 5000), jnp.int32
    )
    count, plan = planner.planned_count(build, probe)
    assert plan == "interval"
    assert int(count) == _oracle(build, probe)


def test_duplicates_still_covered():
    # coverage with duplicates: [1,2,2,3] covers [1,3]
    build = jnp.asarray([3, 1, 2, 2, 3, 1], jnp.int32)
    probe = jnp.asarray([0, 1, 2, 3, 4, 2], jnp.int32)
    count, plan = planner.planned_count(build, probe)
    assert plan == "interval"
    assert int(count) == 4


def test_gap_build_falls_back_exactly():
    # [1..1000] minus one interior key: NOT covered; interval would
    # overcount probes hitting the hole
    build = np.arange(1, 1001, dtype=np.int32)
    build = np.delete(build, 499)
    probe = np.random.default_rng(1).integers(1, 1001, 4000).astype(np.int32)
    count, plan = planner.planned_count(
        jnp.asarray(build), jnp.asarray(probe)
    )
    assert plan != "interval"
    assert int(count) == _oracle(build, probe)


def test_negative_dense_range():
    build = jnp.arange(-500, -100, dtype=jnp.int32)
    probe = jnp.asarray([-501, -500, -101, -100, 0, -300], jnp.int32)
    count, plan = planner.planned_count(build, probe)
    assert plan == "interval"
    assert int(count) == 3


def test_int32_extremes():
    hi = np.iinfo(np.int32).max
    build = jnp.asarray(np.arange(hi - 9, hi, dtype=np.int64), jnp.int32)
    # build covers [hi-9, hi-1]; probes include hi (absent) and hi-1
    probe = jnp.asarray([hi, hi - 1, hi - 9, hi - 10], jnp.int32)
    count, plan = planner.planned_count(build, probe)
    assert plan == "interval"
    assert int(count) == 2


def test_agreement_with_sort_merge_on_random_inputs():
    rng = np.random.default_rng(7)
    for trial in range(5):
        build = rng.integers(0, 300, 400).astype(np.int32)
        probe = rng.integers(0, 400, 900).astype(np.int32)
        got, plan = planner.planned_count(
            jnp.asarray(build), jnp.asarray(probe)
        )
        ref = int(sort_merge_count(jnp.asarray(build), jnp.asarray(probe)))
        assert int(got) == ref == _oracle(build, probe), (trial, plan)


def test_empty_relations():
    empty = jnp.zeros((0,), jnp.int32)
    keys = jnp.asarray([1, 2, 3], jnp.int32)
    assert int(planner.planned_count(empty, keys)[0]) == 0
    assert int(planner.planned_count(keys, empty)[0]) == 0


def test_int64_dense_and_sparse():
    with jax.enable_x64(True):
        base = jnp.int64(1) << jnp.int64(40)
        build = base + jnp.arange(0, 100, dtype=jnp.int64)
        probe = base + jnp.asarray([-1, 0, 50, 99, 100], jnp.int64)
        count, plan = planner.planned_count(build, probe)
        assert plan == "interval"
        assert int(count) == 3

        sparse = base + jnp.asarray([0, 2, 4, 6], jnp.int64)
        count, plan = planner.planned_count(sparse, probe)
        assert plan != "interval"
        assert int(count) == 1  # only base+0 matches


def test_joiner_timer_and_last_plan():
    from partitionedhashjoin_tpu.utils.results import (
        HashJoinTimer,
        Parameters,
    )

    a = Table(
        keys=jnp.arange(1, 501, dtype=jnp.int32),
        payloads=jnp.zeros((500,), jnp.int32),
    )
    b = Table(
        keys=jnp.asarray(
            np.random.default_rng(3).integers(1, 501, 2000), jnp.int32
        ),
        payloads=jnp.zeros((2000,), jnp.int32),
    )
    joiner = planner.PlannedJoiner()
    timer = HashJoinTimer(Parameters())
    count = joiner.run(a, b, timer)
    assert count == 2000
    assert joiner.last_plan == "interval"


def test_build_stats_fields():
    stats, a_sorted = planner.build_stats(
        jnp.asarray([5, 3, 4, 7], jnp.int32)
    )
    assert (stats.n, stats.key_min, stats.key_max, stats.covered) == (
        4,
        3,
        7,
        False,
    )
    assert np.all(np.diff(np.asarray(a_sorted)) >= 0)


def test_wraparound_gap_not_covered():
    """Round-2 review finding: an adjacent gap >= 2^31 wraps negative in
    int32 and previously proved 'covered', making the interval plan count
    EVERY in-range probe row (probe [5] vs build [INT32_MIN, INT32_MAX]
    returned 1).  The wrap-safe test requires diffs in [0, 1]."""
    lo32, hi32 = np.iinfo(np.int32).min, np.iinfo(np.int32).max
    build = jnp.asarray([lo32, hi32], jnp.int32)
    probe = jnp.asarray([5, lo32, hi32], jnp.int32)
    count, plan = planner.planned_count(build, probe)
    assert plan != "interval"
    assert int(count) == 2  # only the endpoints match

    with jax.enable_x64(True):
        lo64, hi64 = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        build = jnp.asarray([lo64, hi64], jnp.int64)
        probe = jnp.asarray([5, lo64], jnp.int64)
        count, plan = planner.planned_count(build, probe)
        assert plan != "interval"
        assert int(count) == 1
