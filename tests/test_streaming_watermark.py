"""Watermark semantics: late rows are dropped, not silently merged.

Two checkpointed availableNow runs over a file source:

- run 1 sees on-time events up to 12:05 → watermark persists at
  11:05; append mode finalizes and emits the [10:00, 11:00) window;
- run 2 adds a LATE event (10:30, below the restored watermark) and
  an on-time one (13:05). The late row's window is already
  finalized: it must not be re-emitted or recounted anywhere.

This is the production contract (bounded state + deterministic
drops) that the availableNow-over-complete-data queries in
streaming/jobs.py don't exercise.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _write(src, name, rows):
    # microsecond parquet timestamps — nanos would collide with the
    # session's nanosAsLong conf (io._ensure_runtime_confs)
    pd.DataFrame({"ts": pd.to_datetime(rows), "v": range(len(rows))}).to_parquet(
        src / name, coerce_timestamps="us")


def _run(spark, src, ckpt, out):
    agg = (
        spark.readStream.schema("ts timestamp, v long").parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .count()
        .select(F.date_format("w.start", "HH:mm").alias("win"), "count")
    )
    # file sink: the one append-mode sink that supports checkpoint
    # recovery (memory does not)
    q = (agg.writeStream.format("parquet").option("path", str(out))
         .outputMode("append").option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return sorted((r.win, r["count"])
                  for r in spark.read.parquet(str(out)).collect())


def test_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    out = tmp_path / "out"

    _write(src, "b1.parquet",
           ["2024-01-01 10:05", "2024-01-01 11:05", "2024-01-01 12:05"])
    out1 = _run(spark, src, ckpt, out)
    # watermark = 12:05 - 1h = 11:05 → only the 10:00 window is final
    assert out1 == [("10:00", 1)]

    _write(src, "b2.parquet",
           ["2024-01-01 10:30",   # LATE: below the restored watermark
            "2024-01-01 13:05"])  # on-time: advances watermark to 12:05
    out2 = _run(spark, src, ckpt, out)
    # the 11:00 window finalizes with its single on-time row; the
    # late 10:30 row is dropped — were it accepted, a duplicate
    # ("10:00", 1) row would appear in the cumulative append output
    assert out2 == [("10:00", 1), ("11:00", 1)]
