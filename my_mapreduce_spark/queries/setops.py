"""Set operations, global top-k, and union-based pipelines.

New capability vs the reference (SURVEY.md §2C: no set operations,
no limit/top-k — its only sort is per-reduce-partition at
``mr/worker.go:188``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register


@register(
    "q_set_ops",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey
                          FROM customer WHERE c_mktsegment = 'BUILDING'),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey
                          FROM supplier WHERE s_acctbal < 0)
    SELECT 'union' AS op, nationkey FROM (SELECT * FROM cust_nations UNION SELECT * FROM supp_nations)
    UNION ALL
    SELECT 'intersect', nationkey FROM (SELECT * FROM cust_nations INTERSECT SELECT * FROM supp_nations)
    UNION ALL
    SELECT 'except', nationkey FROM (SELECT * FROM cust_nations EXCEPT SELECT * FROM supp_nations)
    """,
    tags=("setop",),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (set semantics) between the nation
    sets of BUILDING customers and negative-balance suppliers, tagged
    by operator in one result."""
    cust = (load_table(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_nationkey").alias("nationkey")).distinct())
    supp = (load_table(spark, sf_dir, "supplier")
            .where(F.col("s_acctbal") < 0)
            .select(F.col("s_nationkey").alias("nationkey")).distinct())
    return (
        cust.union(supp).distinct().select(F.lit("union").alias("op"), "nationkey")
        .unionAll(cust.intersect(supp).select(F.lit("intersect").alias("op"), "nationkey"))
        .unionAll(cust.exceptAll(supp).distinct()
                  .select(F.lit("except").alias("op"), "nationkey"))
    )


@register(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("topk", "sort"),
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject
    — each partition contributes its local top 20 and the driver
    merges k*partitions rows, never a full global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(20))


@register(
    "q_union_by_name",
    oracle="""
    SELECT party, party_key, ROUND(acctbal, 4) AS acctbal
    FROM (
        SELECT 'customer' AS party, c_custkey AS party_key, c_acctbal AS acctbal
        FROM customer WHERE c_acctbal > 9900
        UNION ALL
        SELECT 'supplier', s_suppkey, s_acctbal
        FROM supplier WHERE s_acctbal > 9900
    )
    """,
    tags=("setop", "union"),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-schema UNION ALL (unionByName after projection
    to a common shape): all high-balance parties in one stream."""
    cust = (load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9900)
            .select(F.lit("customer").alias("party"),
                    F.col("c_custkey").alias("party_key"),
                    F.round("c_acctbal", 4).alias("acctbal")))
    supp = (load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 9900)
            .select(F.lit("supplier").alias("party"),
                    F.col("s_suppkey").alias("party_key"),
                    F.round("s_acctbal", 4).alias("acctbal")))
    return cust.unionByName(supp)


_PAGE = 50
_CURSOR_AT = 100  # keyset cursor = the 100th row under the total order


@register(
    "q_keyset_pagination",
    oracle=f"""
    WITH ranked AS (
        SELECT o_orderkey, o_orderdate, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders)
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice,
           CAST(rn - {_CURSOR_AT} AS BIGINT) AS page_pos
    FROM ranked
    WHERE rn > {_CURSOR_AT} AND rn <= {_CURSOR_AT} + {_PAGE}
    """,
    tags=("setops", "pagination", "topk"),
)
def q_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination — the scalable alternative to
    OFFSET: fetch the page AFTER a cursor tuple with a pushdown-able
    tuple comparison + sort + LIMIT, instead of sorting and skipping
    100 rows.

    The cursor here is derived from the data (the 100th row's
    (date, key) under the total order) via a broadcast 1-row
    aggregate of a partial top-k — so the whole query is two
    TakeOrderedAndProject passes, no global sort, no offset scan.
    The oracle states the same page as ROW_NUMBER bounds (the
    specification OFFSET would implement).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice")
    cursor = (orders.orderBy("o_orderdate", "o_orderkey")
              .limit(_CURSOR_AT)
              .agg(F.max(F.struct("o_orderdate", "o_orderkey"))
                   .alias("cur")))
    after = (orders.crossJoin(F.broadcast(cursor))
             .where(F.struct("o_orderdate", "o_orderkey") > F.col("cur"))
             .orderBy("o_orderdate", "o_orderkey").limit(_PAGE))
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return after.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("page_pos"))


_SET_OPS_ALL_SQL = """
WITH a AS (SELECT CAST(l_quantity AS BIGINT) AS v
           FROM lineitem WHERE l_orderkey % 2 = 0),
     b AS (SELECT CAST(l_quantity AS BIGINT) AS v
           FROM lineitem WHERE l_linenumber >= 3),
     ia AS (SELECT v FROM a INTERSECT ALL SELECT v FROM b),
     ea AS (SELECT v FROM a EXCEPT ALL SELECT v FROM b)
SELECT 'intersect_all' AS op, v, CAST(COUNT(*) AS BIGINT) AS n
FROM ia GROUP BY v
UNION ALL
SELECT 'except_all' AS op, v, CAST(COUNT(*) AS BIGINT) AS n
FROM ea GROUP BY v
"""


@register(
    "q_set_ops_all",
    oracle=_SET_OPS_ALL_SQL,
    tags=("setops", "multiset", "sql-surface"),
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the MULTISET set operations
    (bag semantics: a value occurring x times in A and y times in B
    survives INTERSECT ALL min(x,y) times and EXCEPT ALL max(x-y,0)
    times), pinned with ONE SQL text on both engines; q_set_ops
    covers the DISTINCT-semantics trio, and the per-value counts
    reported here are exactly the multiplicities plain INTERSECT
    would collapse.

    Catalyst rewrites both into a single aggregate computing the two
    multiplicities then a generate/replicate — one shuffle on the
    value, map-side partial counts, no join; the same plan an
    explicit count-and-min aggregation would produce, which is why
    the ALL variants scale identically to a groupBy at 100 TB."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SET_OPS_ALL_SQL)
