"""Window functions — ranking, running frames, lag/lead.

New capability vs the reference (SURVEY.md §2C: no window functions).
Every ORDER BY inside a window carries a unique tiebreaker column so
results are deterministic and oracle-comparable; ``events`` ordering
uses the raw nanosecond ``ts_ns`` (not the derived microsecond
timestamp) so Spark and DuckDB sort identically.

Scale note: a window's partition key is its shuffle key — all of
these partition on mid/high-cardinality keys (brand, customer,
user), never on a constant, so no single-task global sort appears
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register


def _r4(c):
    return F.round(c, 4)


@register(
    "q_window_rank_topn",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rnk
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rnk
          FROM part)
    WHERE rnk <= 3
    """,
    tags=("window", "topk"),
)
def q_window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest parts per brand — the distributed top-N idiom
    (row_number + filter, never a global sort + limit per group)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (part.select("p_brand", "p_partkey", "p_retailprice",
                        F.row_number().over(w).alias("rnk"))
            .where(F.col("rnk") <= 3))


@register(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
    tags=("window", "frame"),
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend with an explicit ROWS frame;
    (o_orderdate, o_orderkey) ordering is unique, so the frame is
    deterministic across engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        _r4(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0))
            ).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "q_window_lag_events",
    oracle="""
    SELECT user_id, event_id,
           ROUND(value - LAG(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 4) AS value_delta,
           CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS BIGINT)
               AS gap_us
    FROM events
    """,
    tags=("window", "lag", "events"),
)
def q_window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deltas between consecutive events (sessionization
    building block). Both engines compare at MICROsecond precision:
    DuckDB truncates the nanosecond parquet timestamps to µs on
    read, so µs (with event_id tiebreak) is the finest granularity
    the oracle can see."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.expr("ts_ns DIV 1000")  # integer div: ns > 2^53, float division drifts
    w = Window.partitionBy("user_id").orderBy(ts_us, "event_id")
    return ev.select(
        "user_id", "event_id",
        _r4(F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
    )


@register(
    "q_window_share_of_brand",
    oracle="""
    SELECT p_partkey, p_brand,
           ROUND(p_retailprice / SUM(p_retailprice) OVER (PARTITION BY p_brand), 6)
               AS brand_share,
           ROUND(AVG(p_retailprice) OVER (
               PARTITION BY p_brand ORDER BY p_size, p_partkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_price
    FROM part
    """,
    tags=("window", "frame"),
)
def q_window_share_of_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded window aggregate (share of brand total) + a bounded
    moving average over a ROWS frame in one pass."""
    part = load_table(spark, sf_dir, "part")
    w_all = Window.partitionBy("p_brand")
    w_mov = (Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
             .rowsBetween(-2, 0))
    return part.select(
        "p_partkey", "p_brand",
        F.round(F.col("p_retailprice") / F.sum("p_retailprice").over(w_all), 6)
            .alias("brand_share"),
        _r4(F.avg("p_retailprice").over(w_mov)).alias("moving_avg_price"),
    )


@register(
    "q_window_ntile",
    oracle="""
    WITH t AS (
        SELECT c_custkey, c_acctbal,
               ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        FROM customer)
    SELECT quartile,
           COUNT(*) AS n_customers,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM t GROUP BY quartile
    """,
    tags=("window", "ntile", "stats"),
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count quartile assignment — EXACT ``ntile(4)`` semantics
    (first N mod 4 buckets take the extra row; (bal, key) order makes
    assignment deterministic under balance ties) computed WITHOUT a
    single-partition global window, so the shipped plan is the scale
    plan even when the input is fact-sized.

    Two-pass range rank (functions/ranking.distributed_row_number,
    shared with q_vocab_rank_scalable):
    (1) repartitionByRange on (c_acctbal, c_custkey) — the composite
    key is unique, so no tie straddles a partition boundary — then
    row_number within each range partition, which is shuffle-
    parallel. (2) per-partition counts (at most
    spark.sql.shuffle.partitions rows) are prefix-summed into
    broadcast base offsets; global rank = base + local rank. The
    quartile is then closed-form from (rank, N):
    ntile(k) puts rows 1..rem*(q+1) into buckets of size q+1 and the
    rest into buckets of size q, with q = N div k, rem = N mod k.
    The only global-order window runs over the partition-counts
    relation, bounded by a conf, never by data."""
    from my_mapreduce_spark.functions.ranking import distributed_row_number

    cust = load_table(spark, sf_dir, "customer")
    ranked = distributed_row_number(
        cust.select("c_acctbal", "c_custkey"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        out="r", total_col="n_total")
    # ntile(4) closed form: q = N div 4, rem = N mod 4; first rem
    # buckets hold q+1 rows. greatest(q,1) guards the N<4 degenerate
    # case where the otherwise-branch divides by zero.
    q = (F.col("n_total") / 4).cast("long")
    rem = F.col("n_total") % 4
    big = rem * (q + F.lit(1))
    quartile = F.when(
        F.col("r") <= big,
        ((F.col("r") - 1) / (q + 1)).cast("long") + 1,
    ).otherwise(
        rem + ((F.col("r") - big - 1) / F.greatest(q, F.lit(1))).cast("long")
        + 1)
    return (ranked.select("c_acctbal", quartile.alias("quartile"))
            .groupBy("quartile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.min("c_acctbal"), 2).alias("min_bal"),
                 F.round(F.max("c_acctbal"), 2).alias("max_bal")))
