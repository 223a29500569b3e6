"""Executor-kill chaos test (round-9 verdict #8): the modern analogue
of the reference's crash.go contract (``mrapps/crash.go:22-34`` —
workers die mid-job, the coordinator reassigns, output must equal a
crash-free run), applied to the surfaces where state makes recovery
non-trivial:

1. **q_streaming_exactly_once_sink** — a SIGKILL lands on one executor
   JVM while the availableNow stream is landing epochs through
   foreachBatch. Spark retries the lost tasks on the surviving
   executor (standalone worker relaunches the dead one); the
   per-epoch overwrite landing makes re-delivery idempotent, so the
   final aggregate must be row-identical to a crash-free run.
2. **q_dedup_clusters (checkpointed CC loop)** — the loop pins each
   round with ``localCheckpoint(eager=True)``, which stores blocks on
   executors WITHOUT lineage: an executor loss can make those blocks
   unrecoverable by design (the speed/recoverability trade
   localCheckpoint buys). The contract under chaos is therefore
   at-least-once at the JOB level: if the in-flight job survives
   (kill landed between rounds / blocks replicated to the survivor),
   its output must be identical; if Spark aborts it on the lost
   blocks, one driver-level rerun must produce identical output.
   Production at 100 TB swaps in reliable checkpoints
   (``sc.setCheckpointDir`` + ``.checkpoint()``) to upgrade this to
   in-job recovery; the test records which path was exercised.

Needs real executor PROCESSES (local[] threads cannot be killed), so
it builds its own ``local-cluster[2, 4, 2048]`` session in a
subprocess-friendly standalone script:
    python tools/chaos_kill_executor.py
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _executor_pids() -> list[int]:
    """Executor JVM pids via /proc cmdline scan (no psutil in the
    container). local-cluster executors run CoarseGrainedExecutorBackend
    as separate processes — exactly what makes this chaos test real."""
    pids = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if b"CoarseGrainedExecutorBackend" in cmd:
            pids.append(int(d))
    return sorted(pids)


def _rows(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def _kill_one_mid_run(done: threading.Event, killed: dict) -> None:
    """Wait for >=2 live executors, give the job a beat to get work
    onto both, then SIGKILL the first executor. Records whether the
    kill landed before the job finished."""
    deadline = time.time() + 120
    while time.time() < deadline and not done.is_set():
        pids = _executor_pids()
        if len(pids) >= 2:
            time.sleep(1.0)  # let tasks land on it
            if done.is_set():
                break
            try:
                os.kill(pids[0], signal.SIGKILL)
                killed["pid"] = pids[0]
                killed["before_finish"] = not done.is_set()
            except OSError:
                continue
            return
        time.sleep(0.2)


def _run_with_kill(fn) -> tuple[list[tuple] | None, dict, Exception | None]:
    """Run fn() in a thread while the killer thread takes out an
    executor. Returns (rows, kill-record, error)."""
    done = threading.Event()
    killed: dict = {}
    out: dict = {}

    def work():
        try:
            out["rows"] = _rows(fn())
        except Exception as exc:  # noqa: BLE001 - recorded, adjudicated
            out["err"] = exc
        finally:
            done.set()

    wt = threading.Thread(target=work)
    kt = threading.Thread(target=_kill_one_mid_run, args=(done, killed))
    wt.start()
    kt.start()
    wt.join(timeout=600)
    done.set()
    kt.join(timeout=10)
    return out.get("rows"), killed, out.get("err")


def main() -> int:
    spark = (
        SparkSession.builder
        # two REAL executor JVMs (4 cores / 2 GB each); 4 task
        # attempts so the lost executor's tasks retry on the survivor
        .master("local-cluster[2, 4, 2048]")
        .appName("chaos-kill-executor")
        .config("spark.task.maxFailures", "4")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from my_mapreduce_spark.registry import REGISTRY, _ensure_loaded
    _ensure_loaded()

    report: dict = {}
    ok = True

    # ---- clean baselines (same session, before any chaos) ----
    eo = REGISTRY["q_streaming_exactly_once_sink"].fn
    cc = REGISTRY["q_dedup_clusters"].fn
    clean_eo = _rows(eo(spark, SF_DIR))
    clean_cc = _rows(cc(spark, SF_DIR))

    # ---- chaos 1: exactly-once sink ----
    rows, killed, err = _run_with_kill(lambda: eo(spark, SF_DIR))
    if err is not None:
        # a kill can race the foreachBatch commit; one driver retry is
        # within the at-least-once contract — but record it happened
        report["exactly_once_retried_after_abort"] = repr(err)[:200]
        rows = _rows(eo(spark, SF_DIR))
    report["exactly_once"] = {
        "killed_pid": killed.get("pid"),
        "kill_before_finish": killed.get("before_finish", False),
        "identical": rows == clean_eo,
        "in_job_recovery": err is None,
    }
    ok &= rows == clean_eo and killed.get("pid") is not None

    # ---- chaos 2: checkpointed CC loop ----
    rows, killed, err = _run_with_kill(lambda: cc(spark, SF_DIR))
    path = "in-job task retry"
    if err is not None:
        # lost localCheckpoint blocks abort the job by design; the
        # recovery contract is one deterministic driver-level rerun
        path = "driver-level rerun (localCheckpoint blocks lost)"
        rows = _rows(cc(spark, SF_DIR))
    report["cc_loop"] = {
        "killed_pid": killed.get("pid"),
        "kill_before_finish": killed.get("before_finish", False),
        "identical": rows == clean_cc,
        "recovery_path": path,
    }
    ok &= rows == clean_cc and killed.get("pid") is not None

    print(json.dumps(report, indent=1))
    if ok:
        print("chaos: output identical to clean run after executor kill")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
