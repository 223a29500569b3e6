"""Weighted sampling, robust rolling/anomaly statistics, and the
shared-text SQL surface (SURVEY.md §2C/§2D north-star depth).

- ``q_weighted_sample``: Efraimidis–Spirakis weighted sampling
  without replacement (the principled way to draw a fixed-size
  sample where longer/higher-weight docs are proportionally more
  likely — used for mixture construction and eval-set draws);
  deterministic via md5-derived uniforms, so fully oracle-checked.
- ``q_rolling_median``: exact sliding-window median per user over
  ``events`` — the robust denoiser for metric streams.
- ``q_mad_outliers``: median-absolute-deviation robust z-score
  outlier counts per event type (the outlier rule that, unlike
  mean/stddev z-scores, is not dragged by the outliers themselves).
- ``q_sql_cte_pipeline``: ONE ANSI SQL text executed verbatim by
  BOTH engines — ``spark.sql(SQL)`` is the query, the identical
  string is the DuckDB oracle. Demonstrates the engine's SQL entry
  surface (the reference has no SQL surface at all; SURVEY §2C).

Scale shape (100 TB): the weighted sample is one scan + a
TakeOrderedAndProject top-k (per-partition partial top-k, O(k)
driver rows); the rolling median is a user-partitioned bounded row
frame (state = 7 rows per partition slot, no global window); MAD is
two broadcast-join passes of per-type scalar percentiles; the SQL
pipeline is a star join (dims broadcast) + one hash agg + a
per-region rank window over nation-cardinality rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_SAMPLE_K = 25
_FRAME = 6            # rolling window: current row + 6 preceding
_MAD_Z = 3.5          # robust z-score cutoff (0.6745 * dev / MAD)

# u in (0,1) from the first 13 md5 hex digits (52 bits — exact in a
# double); Efraimidis–Spirakis key = -ln(u)/w, smallest k win.
_U_SQL = ("(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) "
          "AS UBIGINT) + 0.5) / 4503599627370496.0")


@register(
    "q_weighted_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               -ln({_U_SQL}) / n_chars AS k
        FROM documents),
    ranked AS (
        SELECT doc_id, n_chars, k,
               ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rnk
        FROM keyed)
    SELECT doc_id, n_chars, ROUND(k, 6) AS wkey, rnk
    FROM ranked WHERE rnk <= {_SAMPLE_K}
    """,
    tags=("sampling", "pipeline"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement, k={k}, weight=n_chars,
    via the Efraimidis–Spirakis exponential race: each doc draws
    u~U(0,1) (deterministically, from md5(doc_id)) and the k docs
    with the smallest -ln(u)/weight win — exactly equivalent to
    sequential weighted draws without replacement, but expressible
    as a stateless per-row key + top-k, which is why it is THE
    distributed weighted-sampling algorithm.

    One scan, no shuffle except the sort+limit top-k
    (TakeOrderedAndProject: per-partition partial top-k, k rows to
    the driver side of the plan) — at 100 TB the cost is the scan.
    """.format(k=_SAMPLE_K)
    docs = load_table(spark, sf_dir, "documents")
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("double") + 0.5) / float(2 ** 52)
    keyed = docs.select(
        "doc_id", "n_chars", (-F.log(u) / F.col("n_chars")).alias("k"))
    w = Window.orderBy("k", "doc_id")
    return (keyed.orderBy("k", "doc_id").limit(_SAMPLE_K)
            .withColumn("rnk", F.row_number().over(w))
            .select("doc_id", "n_chars", F.round("k", 6).alias("wkey"),
                    "rnk"))


@register(
    "q_rolling_median",
    oracle=f"""
    SELECT event_id, user_id, value,
           ROUND(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_FRAME} PRECEDING AND CURRENT ROW), 6)
               AS rolling_med
    FROM events
    """,
    tags=("windows", "robust-stats"),
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of ``value`` over each user's last
    {n} events (row frame, ordered by ts) — the robust smoother for
    noisy per-entity metric streams; both engines interpolate
    (Spark ``percentile`` == DuckDB ``quantile_cont``).

    The window is user-partitioned with a BOUNDED row frame: state
    per open frame is {n}+1 rows, partitions distribute by user —
    no single-partition window, no growth with history length
    beyond the per-user sort. At 100 TB this is one shuffle on
    user_id plus a linear pass.
    """.format(n=_FRAME + 1)
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-_FRAME, 0))
    return ev.select(
        "event_id", "user_id", "value",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6)
        .alias("rolling_med"))


@register(
    "q_mad_outliers",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type),
    mad AS (
        SELECT e.event_type, med.med,
               quantile_cont(abs(e.value - med.med), 0.5) AS mad
        FROM events e JOIN med USING (event_type)
        GROUP BY e.event_type, med.med),
    flagged AS (
        SELECT e.event_type, mad.med, mad.mad,
               CASE WHEN mad.mad > 0
                    AND abs(0.6745 * (e.value - mad.med) / mad.mad)
                        > {_MAD_Z}
                    THEN 1 ELSE 0 END AS is_out
        FROM events e JOIN mad USING (event_type))
    SELECT event_type, COUNT(*) AS n,
           ROUND(med, 6) AS med, ROUND(mad, 6) AS mad,
           CAST(SUM(is_out) AS BIGINT) AS n_outliers
    FROM flagged GROUP BY event_type, med, mad
    """,
    tags=("robust-stats", "quality"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type via the MAD rule:
    modified z = 0.6745*(x - median)/MAD, flag |z| > {z} — the
    standard robust alternative to mean/stddev z-scores (which the
    outliers themselves inflate; median/MAD have a 50% breakdown
    point).

    Two passes over events, each ending in a per-type SCALAR
    (|event_types| rows, broadcast back) — exact medians computed
    where the data lives, never collected; the flag pass is a
    broadcast hash join + map-side-combinable count. At 100 TB:
    2 scans + 2 type-keyed aggs, no large shuffle.
    """.format(z=_MAD_Z)
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    mad = (ev.join(F.broadcast(med), "event_type")
           .groupBy("event_type", "med")
           .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad")))
    z = F.abs(0.6745 * (F.col("value") - F.col("med")) / F.col("mad"))
    flagged = (ev.join(F.broadcast(mad), "event_type")
               .select("event_type", "med", "mad",
                       F.when((F.col("mad") > 0) & (z > _MAD_Z), 1)
                       .otherwise(0).alias("is_out")))
    return (flagged.groupBy("event_type", "med", "mad")
            .agg(F.count("*").alias("n"),
                 F.sum("is_out").cast("long").alias("n_outliers"))
            .select("event_type", "n", F.round("med", 6).alias("med"),
                    F.round("mad", 6).alias("mad"), "n_outliers"))


# ONE SQL text, two engines: spark.sql(_PIPELINE_SQL) is the query,
# the same string is the DuckDB oracle. Restricted to the ANSI
# intersection both engines parse identically.
_PIPELINE_SQL = """
WITH cust_rev AS (
    SELECT r.r_name AS region, n.n_name AS nation,
           SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
    GROUP BY r.r_name, n.n_name),
ranked AS (
    SELECT region, nation, rev,
           ROW_NUMBER() OVER (PARTITION BY region
                              ORDER BY rev DESC, nation) AS rnk
    FROM cust_rev)
SELECT region, nation, ROUND(rev, 4) AS revenue, rnk
FROM ranked WHERE rnk <= 3
"""


@register(
    "q_sql_cte_pipeline",
    oracle=_PIPELINE_SQL,
    tags=("sql-surface", "relational"),
)
def q_sql_cte_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nations by revenue within each region since 1996,
    written as ONE ANSI SQL text (CTEs + 4-way star join + window
    rank) that `spark.sql` executes verbatim — and the oracle runs
    the IDENTICAL string in DuckDB. This pins the SQL entry surface
    itself: same parse, same semantics, same answer. The reference
    has no SQL surface (SURVEY §2C); this is the capability a user
    switching from any SQL engine exercises first.

    Catalyst plans it like the hand-built DataFrame twin would:
    dims broadcast onto the lineitem scan (orderdate filter pushed
    down), one hash agg, and the rank window runs per-region over
    nation-cardinality rows — nothing here is SQL-surface overhead.
    """
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_PIPELINE_SQL)
