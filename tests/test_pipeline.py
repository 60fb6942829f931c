"""Host task-runtime tests (utils/pipeline.py).

Ports the reference's runtime semantics (SURVEY.md §2 row 4): batch
completion futures, staged pipeline ordering with a barrier between stages,
failure short-circuit of later stages, and error aggregation that preserves
real exceptions (the reference slices them to std::exception, appendix 5).
"""

import threading
import time

from partitionedhashjoin_tpu.utils.pipeline import (
    Pipeline,
    TasksErrorHolder,
    ThreadPool,
)


def test_single_task_and_batch():
    pool = ThreadPool(workers=3)
    hits = []
    holder = pool.push(lambda: hits.append(1)).result()
    assert holder.empty() and hits == [1]
    holder = pool.push([lambda: hits.append(2)] * 5).result()
    assert holder.empty() and len(hits) == 6
    pool.stop()


def test_batch_runs_in_parallel():
    pool = ThreadPool(workers=4)
    barrier = threading.Barrier(4, timeout=5)
    holder = pool.push([barrier.wait] * 4).result()  # deadlocks if serial
    assert holder.empty()
    pool.stop()


def test_pipeline_stage_ordering_is_a_barrier():
    pool = ThreadPool(workers=4)
    order = []
    lock = threading.Lock()

    def task(stage):
        def run():
            time.sleep(0.01 if stage == 0 else 0)
            with lock:
                order.append(stage)
        return run

    pipe = Pipeline().add([task(0)] * 4).add([task(1)] * 4)
    assert pool.push(pipe).result().empty()
    # every stage-0 task completes before any stage-1 task starts
    assert order[:4] == [0, 0, 0, 0] and order[4:] == [1, 1, 1, 1]
    pool.stop()


def test_pipeline_failure_short_circuits_later_stages():
    pool = ThreadPool(workers=2)
    ran = []

    def boom():
        raise ValueError("stage failed")

    pipe = (
        Pipeline()
        .add([lambda: ran.append("s0")])
        .add([boom, lambda: ran.append("s1")])
        .add([lambda: ran.append("s2")])
    )
    holder = pool.push(pipe).result()
    assert not holder.empty()
    assert isinstance(holder.pop(), ValueError)  # real exception preserved
    assert str(holder.pop()) == "stage failed"
    assert "s2" not in ran  # stage after failure never ran
    assert "s1" in ran  # in-flight same-stage task completed
    pool.stop()


def test_error_holder_aggregates_multiple():
    holder = TasksErrorHolder()
    holder.add(ValueError("a"))
    holder.add(KeyError("b"))
    assert len(holder.errors) == 2 and not holder.empty()


def test_single_worker_pipeline_does_not_deadlock():
    pool = ThreadPool(workers=1)
    pipe = Pipeline().add([lambda: None] * 3).add([lambda: None])
    assert pool.push(pipe).result(timeout=10).empty()
    pool.stop()


def test_default_worker_count():
    import os

    pool = ThreadPool()
    assert pool.get_number_of_workers() == max(1, (os.cpu_count() or 2) - 1)
    pool.stop()
