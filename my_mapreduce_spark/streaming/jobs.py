"""Structured Streaming twin of the batch event-window queries.

The reference has no streaming at all (SURVEY.md §2C); this module
provides the real ``readStream → window agg → writeStream`` pipeline
the north star asks for, runnable in a test/driver context via the
``availableNow`` trigger (process everything currently in the
source, then stop — which makes the result deterministic and equal
to the batch query, so it can carry a full DuckDB oracle).

Production shape: the same code with a file/Kafka source, a real
watermark dropping late data, and an append-mode sink; here the
sink is an in-memory table the caller reads back.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.io import _ensure_runtime_confs
from my_mapreduce_spark.registry import register


def run_hourly_stream(spark: SparkSession, sf_dir: str,
                      watermark: str = "2 hours") -> DataFrame:
    """Run the hourly tumbling aggregation as a streaming query over
    the events parquet, to completion (availableNow), and return the
    materialized result.

    The nanosecond ``ts`` arrives as a long (nanosAsLong, like the
    batch path) and is converted with integer DIV; the watermark
    bounds state for a continuous run — with availableNow + complete
    output it does not drop anything, so the result equals the batch
    q_events_hourly exactly.
    """
    _ensure_runtime_confs(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        # FileStreamSource requires a directory; glob-filter to the
        # events file within the sf dir
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", F.timestamp_micros(F.expr("ts_ns DIV 1000")))
        .withWatermark("ts", watermark)
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )
    sink = f"hourly_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    query.awaitTermination()
    return (
        spark.table(sink)
        .select(F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("hour"),
                "event_type", "n_events", "sum_value", "avg_value")
    )


@register(
    "q_streaming_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value,
           ROUND(AVG(value), 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "events", "window"),
)
def q_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming pipeline, gated by the same oracle as its batch
    twin — proof the streaming and batch semantics coincide."""
    return run_hourly_stream(spark, sf_dir)
