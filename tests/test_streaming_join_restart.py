"""Stream-stream join across checkpointed restarts: buffered state
survives, matches spanning the restart are emitted exactly once, and
watermark-expired state stops matching.

Two checkpointed availableNow runs over a file source feeding a
time-bounded click->purchase self-join (the q_streaming_click_
attribution shape):

- run 1 delivers a click with no purchase yet -> no output, but the
  click is buffered in the join state store;
- run 2 delivers an in-window purchase for that click (must match
  against the RESTORED state), plus a purchase far beyond the join
  window (must not match), plus a watermark-advancing event.
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
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES"))
    ).select("click_id", "purchase_id")
    q = (joined.writeStream.format("parquet").option("path", str(out))
         .outputMode("append").option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return sorted((r.click_id, r.purchase_id)
                  for r in spark.read.parquet(str(out)).collect())


def test_join_state_survives_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    _write(src, "b1.parquet", [
        (1, "2024-01-01 10:00", 7, "click"),        # buffered, no match yet
    ])
    assert _run(spark, src, ckpt, out) == []

    _write(src, "b2.parquet", [
        (2, "2024-01-01 10:10", 7, "purchase"),     # matches restored click 1
        (3, "2024-01-01 12:00", 7, "purchase"),     # outside the 30-min bound
        (4, "2024-01-01 12:00", 9, "click"),        # advances watermark only
    ])
    # exactly one match, formed across the restart from checkpointed
    # join state; the out-of-window purchase must not pair
    assert _run(spark, src, ckpt, out) == [(1, 2)]
