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


_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def run_sessionize_stream(spark: SparkSession, sf_dir: str,
                          gap_us: int = _GAP_US) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization
    via ``applyInPandasWithState``.

    State per user is ``(last_ts_us, session_seq)``. Each micro-batch
    sorts its group's rows by (ts, event_id), continues the running
    session numbering from state, emits every event annotated with
    its session number (append mode — no final flush needed), and
    writes the advanced state back. This is the pattern for stateful
    operators Structured Streaming lacks natively; at scale state
    lives in the state store keyed by user, and a watermark bounds
    it (availableNow over a finite source here, so no eviction).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    _ensure_runtime_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def sessionize(key, pdfs, state: GroupState):
        (user_id,) = key
        last_ts, seq = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        seqs = []
        for ts in rows["ts_us"]:
            if last_ts is None or ts - last_ts > gap_us:
                seq += 1
            seqs.append(seq)
            last_ts = ts
        state.update((int(last_ts), int(seq)))
        yield pd.DataFrame({"user_id": user_id, "event_id": rows["event_id"],
                            "session_seq": seqs})

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumnRenamed("ts", "ts_ns")
        .select("user_id", "event_id",
                F.expr("ts_ns DIV 1000").alias("ts_us"))
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType="user_id long, event_id long, session_seq long",
        stateStructType="last_ts long, seq long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    query = (out.writeStream.format("memory").queryName(sink)
             .outputMode("append").trigger(availableNow=True).start())
    query.awaitTermination()
    return spark.table(sink)


@register(
    "q_streaming_sessionize",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
    flagged AS (
        SELECT *,
               CASE WHEN ts_us - LAG(ts_us) OVER w > {_GAP_US}
                     OR LAG(ts_us) OVER w IS NULL
                    THEN 1 ELSE 0 END AS ns
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
    SELECT user_id, event_id,
           CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM flagged
    """,
    tags=("streaming", "stateful", "session", "events"),
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful sessionizer, oracle-gated: the per-event session
    numbers it streams out must equal the batch window computation
    (LAG + running sum of gap flags) row for row."""
    return run_sessionize_stream(spark, sf_dir)
