"""Parallel-execution probes — the B6/B7 (mtiming/rtiming) analogue.

The reference's mtiming/rtiming plugins (`mrapps/mtiming.go:21-64`,
`mrapps/rtiming.go:19-62`) have each task drop a presence file, count
live peers, and sleep 1 s so overlapping tasks observe each other;
the job then asserts the observed parallelism. Spark's analogue:
every task records its wall-clock (start, end) interval (after an
identical 1 s sleep), and the driver computes the maximum interval
overlap — plus a live poll of the SparkStatusTracker (the Python face
of the listener bus) while the stage runs.

The required overlap derives from the session's task slots
(sc.defaultParallelism — local[4] in the test session, local[32] in
the driver): all slots fill within milliseconds of stage launch, so
we assert slots-1 (one short, for scheduler jitter on a loaded
machine), still far above the 2 the reference asserts.
"""

from __future__ import annotations

import threading
import time

_N_TASKS = 16


def _min_parallel(sc) -> int:
    return max(2, min(_N_TASKS, sc.defaultParallelism) - 1)


def _max_overlap(intervals):
    events = sorted([(s, 1) for s, _ in intervals]
                    + [(e, -1) for _, e in intervals])
    cur = best = 0
    for _, d in events:
        cur += d
        best = max(best, cur)
    return best


def _make_timed_partition():
    # returned as a nested function so cloudpickle ships it by value
    # (the tests package is not importable on executors)
    def timed(_):
        import time as _t
        start = _t.time()
        _t.sleep(1.0)
        yield (start, _t.time())
    return timed


def test_map_tasks_run_in_parallel(spark):
    """Map-side (no shuffle ancestry): one stage of 16 sleeping
    tasks; >= 8 must overlap, and the status tracker must observe
    >= 8 active at once while the stage runs."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    observed = []
    done = threading.Event()

    def poll():
        while not done.is_set():
            for sid in tracker.getActiveStageIds():
                info = tracker.getStageInfo(sid)
                if info:
                    observed.append(info.numActiveTasks)
            time.sleep(0.05)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        intervals = (sc.parallelize(range(_N_TASKS), _N_TASKS)
                     .mapPartitions(_make_timed_partition()).collect())
    finally:
        done.set()
        t.join(timeout=5)

    assert len(intervals) == _N_TASKS
    overlap = _max_overlap(intervals)
    need = _min_parallel(sc)
    assert overlap >= need, f"only {overlap} map tasks overlapped (need {need})"
    assert observed and max(observed) >= need, (
        f"status tracker saw at most {max(observed or [0])} active tasks")


def test_reduce_tasks_run_in_parallel(spark):
    """Reduce-side (post-shuffle stage, rtiming analogue): the
    sleeping tasks sit downstream of a partitionBy shuffle, so the
    overlap measures reduce-task parallelism."""
    sc = spark.sparkContext
    intervals = (sc.parallelize(range(_N_TASKS * 10), 4)
                 .map(lambda x: (x % _N_TASKS, x))
                 .partitionBy(_N_TASKS)
                 .mapPartitions(_make_timed_partition())
                 .collect())
    assert len(intervals) == _N_TASKS
    overlap = _max_overlap(intervals)
    need = _min_parallel(sc)
    assert overlap >= need, f"only {overlap} reduce tasks overlapped (need {need})"
