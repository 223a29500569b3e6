"""Mergeable-sketch operators (SURVEY.md §2D approximate family).

HyperLogLog sketches as first-class data: build per-partition
sketches once, store them, and merge them later — the pattern behind
incremental distinct-user pipelines, where re-scanning 100 TB of
history to refresh a distinct count is replaced by unioning KB-sized
sketch blobs. Spark ships Apache DataSketches HLL as
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
(Spark 3.5+).

No DuckDB oracle: DuckDB's approx_count_distinct is a different HLL
implementation, so estimates differ by design. The registry entry is
rows-only; tests/test_sketches.py asserts the two load-bearing
properties instead — estimates within 2% of exact distinct counts,
and the union of daily sketches giving the IDENTICAL estimate to a
single whole-range sketch (mergeability is lossless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register


def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day) HLL sketch of distinct users — the
    materialization step. Sketches are ~KB binary blobs regardless
    of row count, so this relation is tiny even at 100 TB input."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.hll_sketch_agg("user_id").alias("sk"),
                 F.count(F.lit(1)).alias("n_events")))


@register(
    "q_hll_user_sketches",
    oracle=None,  # rows-only: engine-specific HLL estimates (see module doc)
    tags=("sketch", "approx", "incremental"),
)
def q_hll_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via merged daily HLL sketches:
    build per-day sketches (the incremental unit), then
    ``hll_union_agg`` them per type and estimate. The exact
    equivalent re-shuffles every event by user; the sketch path
    shuffles only (type, day) partials — at 100 TB the difference is
    the whole job."""
    daily = daily_user_sketches(spark, sf_dir)
    return (daily.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.sum("n_events").alias("n_events"),
                 F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .alias("est_users")))
