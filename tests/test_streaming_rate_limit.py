"""Streaming source rate limiting: ``maxFilesPerTrigger`` bounds each
micro-batch's input, availableNow drains the backlog across MULTIPLE
micro-batches, and the rate-limited final answer still equals the
unthrottled batch aggregation.

This is the production backpressure knob for file-fed streams: a
burst of landed files must not become one giant micro-batch that
blows executor memory — it must be metered through at a bounded
rows-per-trigger cost. The assertions pin (a) more than one
micro-batch ran, (b) every micro-batch's numInputRows stayed within
the largest single file, (c) result == batch groupBy on the same
input.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

_N_FILES = 4


def test_max_files_per_trigger_bounds_batches(spark, tmp_path):
    from my_mapreduce_spark.io import load_table

    # land the backlog: events split across N parquet files
    src = str(tmp_path / "backlog")
    events = load_table(spark, SF_DIR, "events") \
        .select("event_id", "event_type", "value")
    events.repartition(_N_FILES).write.parquet(src)
    n_rows = events.count()
    per_file_max = (
        spark.read.parquet(src)
        .groupBy(F.input_file_name()).count()
        .agg(F.max("count")).collect()[0][0])

    sink = f"rate_limit_{uuid.uuid4().hex[:8]}"
    stream = (spark.readStream.schema(events.schema).format("parquet")
              .option("maxFilesPerTrigger", "1")
              .load(src)
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 4).alias("sum_value")))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (stream.writeStream.format("memory").queryName(sink)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    # metered: one file per trigger -> multiple batches, each bounded
    assert len(progress) >= _N_FILES, \
        f"expected >= {_N_FILES} micro-batches, got {len(progress)}"
    assert all(p["numInputRows"] <= per_file_max for p in progress)
    assert sum(p["numInputRows"] for p in progress) == n_rows

    # throttling changed the schedule, not the answer
    got = {tuple(r) for r in spark.table(sink).collect()}
    want = {tuple(r) for r in
            (spark.read.parquet(src).groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 4).alias("sum_value"))).collect()}
    spark.catalog.dropTempView(sink)
    assert got == want
