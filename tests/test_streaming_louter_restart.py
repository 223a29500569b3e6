"""LEFT OUTER stream-stream join across checkpointed restarts: the
outer side's unmatched-state must survive a restart and null-emit
only once its watermark window truly expires — never early, never
twice.

Three checkpointed availableNow runs over one file source:

- run 1: a click with no purchase → buffered, nothing emitted (its
  no-match verdict is not yet knowable);
- run 2: an in-window purchase for a SECOND click (matched row
  emits) plus a watermark-advancing event far in the future — the
  restored click 1 state is now expired, so its null-extended row
  must emit in THIS run, exactly once;
- run 3: nothing new → no output (the null row must not re-emit
  from restored state).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _write(src, name, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "kind"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(src / name, coerce_timestamps="us")


def _run(spark, src, ckpt, out):
    ev = (spark.readStream
          .schema("event_id long, ts timestamp, user_id long, kind string")
          .parquet(str(src))
          .withWatermark("ts", "1 hour"))
    clicks = (ev.where(F.col("kind") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts")))
    purchases = (ev.where(F.col("kind") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("p_user"),
                         F.col("ts").alias("p_ts")))
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select("click_id", "purchase_id")
    q = (joined.writeStream.format("parquet").option("path", str(out))
         .outputMode("append").option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return sorted(
        ((r.click_id, r.purchase_id) for r in
         spark.read.parquet(str(out)).collect()),
        key=repr)


def test_outer_null_emission_survives_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    _write(src, "b1.parquet", [
        (1, "2024-01-01 10:00", 7, "click"),   # will never match
    ])
    assert _run(spark, src, ckpt, out) == []

    _write(src, "b2.parquet", [
        (2, "2024-01-01 10:05", 9, "click"),
        (3, "2024-01-01 10:10", 9, "purchase"),  # matches click 2
        (4, "2024-01-01 14:00", 5, "purchase"),  # watermark → 13:00,
                                                 # expires click 1's window
    ])
    got = _run(spark, src, ckpt, out)
    assert got == sorted([(1, None), (2, 3)], key=repr), got

    # a third run with no new data must not re-emit the null row
    assert _run(spark, src, ckpt, out) == sorted([(1, None), (2, 3)],
                                                 key=repr)
