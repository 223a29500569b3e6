"""Temporal join operators over ``events``: as-of join and range join.

The reference has no joins at all (SURVEY.md §2C — its ceiling is
group-by-key at ``mr/worker.go:194-204``); these are the two
time-series join shapes a training-data/event pipeline needs that
stock SQL engines special-case (DuckDB has ASOF JOIN; Spark does
not), implemented here with scale-correct plans:

- **as-of join** — union-then-window: tag both sides, union, one
  window per key carrying the latest left-side payload forward.
  ONE shuffle on the join key, no range explosion, no skew beyond
  the key's own cardinality. This is the plan that survives 100 TB;
  the naive alternative (theta join ``ts_l <= ts_r`` + row_number)
  is quadratic per key.
- **range join** — bucketed equi-join: quantize time into
  interval-width buckets, replicate each probe row into the 2
  covering buckets, equi-join on (key, bucket), then apply the
  exact range predicate. Turns an O(n^2-per-key) theta join into a
  near-equi join whose fan-out is bounded by bucket occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_RANGE_US = 300 * 1_000_000  # 5-minute follow window


@register(
    "q_asof_join",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
               FROM events),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    v AS (SELECT * FROM e WHERE event_type = 'view'),
    j AS (
        SELECT p.event_id AS purchase_id, p.user_id,
               v.event_id AS prior_view_id,
               p.ts_us - v.ts_us AS gap_us,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts_us DESC, v.event_id DESC) AS rn
        FROM p JOIN v ON v.user_id = p.user_id AND v.ts_us <= p.ts_us)
    SELECT purchase_id, user_id, prior_view_id, gap_us FROM j WHERE rn = 1
    """,
    tags=("join", "asof", "events"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent view by the same
    user at or before it (inclusive as-of), via union-then-window.

    Rows of both sides are unioned and sorted within each user by
    (ts, side, event_id) — views sort before a purchase at the same
    microsecond, making the as-of inclusive — and a running
    ``last(view_payload, ignorenulls)`` carries the answer to each
    purchase row. Single shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("ts_us"))
    payload_t = "struct<event_id:bigint,ts_us:bigint>"
    views = (e.where(F.col("event_type") == "view")
             .select("user_id", "ts_us", F.lit(0).alias("side"), "event_id",
                     F.struct("event_id", "ts_us").cast(payload_t).alias("v")))
    purchases = (e.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts_us", F.lit(1).alias("side"), "event_id",
                         F.lit(None).cast(payload_t).alias("v")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts_us", "side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        views.unionByName(purchases)
        .withColumn("pv", F.last("v", ignorenulls=True).over(w))
        .where((F.col("side") == 1) & F.col("pv").isNotNull())
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("pv.event_id").alias("prior_view_id"),
                (F.col("ts_us") - F.col("pv.ts_us")).alias("gap_us"))
    )


@register(
    "q_range_join_follow",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
    SELECT a.event_id, a.user_id, COUNT(*) AS n_follow
    FROM e a JOIN e b
      ON b.user_id = a.user_id
     AND b.ts_us > a.ts_us AND b.ts_us <= a.ts_us + {_RANGE_US}
    GROUP BY a.event_id, a.user_id
    """,
    tags=("join", "range", "non-equi", "events"),
)
def q_range_join_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many same-user events follow within 5 minutes
    (events with at least one follower).

    Bucketed range join: time is quantized into 5-minute buckets;
    every probe row is replicated into its own and the next bucket
    (the only two a follower can live in), the join is a plain
    equi-join on (user_id, bucket), and the exact interval predicate
    filters inside the matched bucket pair. At 100 TB this keeps the
    shuffle key space fine-grained (user x bucket) instead of
    per-user cross products.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
    probe = e.withColumn(
        "bkt", F.explode(F.array(F.expr(f"ts_us DIV {_RANGE_US}"),
                                 F.expr(f"ts_us DIV {_RANGE_US} + 1"))))
    build = e.select(F.col("event_id").alias("b_event_id"),
                     F.col("user_id").alias("b_user_id"),
                     F.col("ts_us").alias("b_ts_us"),
                     F.expr(f"ts_us DIV {_RANGE_US}").alias("b_bkt"))
    return (
        probe.join(build,
                   (F.col("user_id") == F.col("b_user_id"))
                   & (F.col("bkt") == F.col("b_bkt"))
                   & (F.col("b_ts_us") > F.col("ts_us"))
                   & (F.col("b_ts_us") <= F.col("ts_us") + _RANGE_US))
        .groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )
