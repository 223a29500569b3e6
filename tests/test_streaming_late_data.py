"""Watermark finalization semantics, deterministically provoked.

Two parquet files become two micro-batches (maxFilesPerTrigger=1,
file order pinned by modification time): batch 1 carries hours
10..20 and advances the watermark to 19:09 (delay 1h, max ts
20:09); batch 2 carries hours 0..5 — entirely behind the watermark.

Pinned (empirically verified on this Spark) append-mode windowed-
aggregation behavior:

- a window is EMITTED exactly when the watermark passes its end —
  batch 1's hours 10..18 finalize after the watermark update, 19
  and 20 stay open forever (availableNow ends before any later
  watermark) and never reach the sink;
- late input is NOT pre-filtered: the stale file creates its own
  window state, which the already-advanced watermark finalizes in
  the same batch — late windows surface as late *emissions*, not
  silent drops (numRowsDroppedByWatermark stays 0 here). A pipeline
  that needs late data suppressed must filter on ingest (compare
  q_streaming_left_outer_join's cutoff), not assume the watermark
  does it.

Either way the invariant that matters downstream holds: every
emitted window is complete at emission time w.r.t. the data the
engine had accepted.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

_DELAY = "1 hour"


def _mk_events(spark, hours, n_per_hour=10):
    rows = [
        (h * n_per_hour + i,
         datetime(2024, 3, 1, h, i % 60, 0, tzinfo=timezone.utc),
         float(h))
        for h in hours for i in range(n_per_hour)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double")


def test_watermark_finalization_and_late_emission(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _mk_events(spark, range(10, 21)).coalesce(1) \
        .write.parquet(os.path.join(src, "f1"))
    time.sleep(1.1)  # distinct mtimes fix the batch order
    _mk_events(spark, range(0, 6)).coalesce(1) \
        .write.parquet(os.path.join(src, "f2"))

    schema = "event_id long, ts timestamp, value double"
    stream = (spark.readStream.schema(schema).format("parquet")
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").load(src)
              .withWatermark("ts", _DELAY)
              .groupBy(F.window("ts", "1 hour").alias("w"))
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.hour("w.start").alias("h"), "n"))
    sink = "late_data_sink"
    q = (stream.writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    try:
        # the run saw both batches, and the watermark advanced off
        # batch 1's max event time (20:09 - 1h)
        batches = {p["batchId"]: p for p in q.recentProgress}
        assert batches[0]["numInputRows"] == 110
        assert batches[1]["numInputRows"] == 60
        assert batches[1]["eventTime"]["watermark"] \
            == "2024-03-01T19:09:00.000Z"

        got = {(r.h, r.n) for r in spark.table(sink).collect()}
        on_time = {(h, 10) for h in range(10, 19)}   # finalized by wm
        late = {(h, 10) for h in range(0, 6)}        # late emissions
        # hours 19/20 remain open at query end: never emitted
        assert got == on_time | late, got
    finally:
        spark.catalog.dropTempView(sink)
