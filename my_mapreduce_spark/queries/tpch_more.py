"""Deeper TPC-H-style coverage over the fixture star schema.

Follows the shapes of TPC-H Q4/Q7/Q10/Q12/Q14/Q18/Q19, adapted to
the fixture's columns (no commitdate/receiptdate/shipmode/partsupp —
see FIXTURES.md); none of this exists in the reference (SURVEY.md
§2C: no joins at all). Every query is a scan → broadcast-or-shuffle
join → partial-agg pipeline; dimension tables (nation, supplier,
part, customer at test SF) are broadcast, lineitem⋈orders is the
only at-scale shuffle, and all date/brand/size predicates sit
directly on scan columns so they push into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "q4_late_shipment",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("relational", "join", "semi", "subquery"),
)
def q4_late_shipment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter having at least one line
    shipped >60 days after order date, counted per priority.

    EXISTS becomes a left-semi join whose condition mixes the equi
    key with a non-equi date predicate; the quarter filter pushes
    into the orders scan before the join.
    """
    o = (load_table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1996-04-01"))))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"))


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    tags=("relational", "join", "aggregate"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations per ship
    year. Five-way join; nation and supplier broadcast, the nation
    filter prunes both dimension sides before the fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = load_table(spark, sf_dir, "nation")
    n1 = na.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = na.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .where(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
               | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a
    quarter. The returnflag and quarter predicates push into the two
    fact scans; customer/nation broadcast; top-k is a global sort of
    the small aggregated result only."""
    cu = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= _ts("1996-07-01"))
                & (F.col("o_orderdate") < _ts("1996-10-01"))))
    li = (load_table(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R"))
    na = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    tags=("relational", "join", "aggregate"),
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → orderpriority): line counts per
    linestatus split by order priority class, one ship year."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= _ts("1996-01-01"))
                 & (F.col("l_shipdate") < _ts("1997-01-01")))
          .select("l_orderkey", "l_linestatus"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
    tags=("relational", "join", "aggregate"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from PROMO parts.
    part is broadcast; the month predicate prunes the fact scan."""
    li = (load_table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= _ts("1996-01-01"))
                 & (F.col("l_shipdate") < _ts("1996-02-01"))))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(F.round(100.0 * F.sum(F.when(F.col("p_type") == "PROMO", disc)
                                   .otherwise(0.0)) / F.sum(disc), 4)
             .alias("promo_revenue"))
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_totalprice, ROUND(sum_qty, 4) AS sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    tags=("relational", "join", "aggregate", "subquery"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300, with their
    customer. The HAVING aggregate runs first (partial map-side sum),
    and only the few surviving orderkeys join outward."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 300))
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "o_totalprice", F.round("sum_qty", 4).alias("sum_qty"))
    )


@register(
    "q19_disjunctive_filter",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("relational", "join", "pushdown"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a 3-branch disjunctive brand/size/
    quantity predicate. Catalyst extracts the common subexpressions
    (brand ∈ {...}, quantity range hull) as pushable conjuncts while
    the full disjunction evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 40)))
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
        .alias("revenue"))


@register(
    "q8_market_share",
    oracle="""
    WITH flat AS (
        SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO')
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM flat GROUP BY o_year
    """,
    tags=("relational", "join", "aggregate"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part volume sold into a
    region, per year. Eight-way join; every dimension broadcasts and
    the region/part filters prune before the fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_type") == "PROMO").select("p_partkey"))
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = load_table(spark, sf_dir, "nation")
    re = (load_table(spark, sf_dir, "region")
          .where(F.col("r_name") == "ASIA").select("r_regionkey"))
    n1 = (na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
          .select(F.col("n_nationkey").alias("c_nk")))
    n2 = na.select(F.col("n_nationkey").alias("s_nk"),
                   F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cu), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nk") == F.col("c_nationkey"))
        .join(F.broadcast(n2), F.col("s_nk") == F.col("s_nationkey"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
            / F.sum(vol), 6).alias("mkt_share"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1995-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "join", "aggregate", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue over one
    quarter. The revenue CTE is computed once and reused for both
    the max (a 1-row aggregate, broadcast back) and the final
    filter — no second lineitem scan. The shipdate predicate pushes
    to the parquet reader. (No s_address/s_phone in the fixture;
    output keys + name.)"""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = (
        li.where((F.col("l_shipdate") >= _ts("1995-01-01"))
                 & (F.col("l_shipdate") < _ts("1995-04-01")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("total_revenue")))
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        su.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name",
                F.round("total_revenue", 2).alias("total_revenue")))


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(l_extendedprice) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'BRAND_1'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    tags=("tpch", "join", "correlated-subquery"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand.
    The correlated per-part average decorrelates into a per-part
    aggregate joined back on partkey — both sides shuffle once on
    the same key (no per-row subquery execution). The brand filter
    broadcasts through part before the fact join. (Fixture has no
    p_container; the brand predicate alone selects the part set.)"""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_brand") == "BRAND_1").select("p_partkey"))
    brand_li = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    per_part_avg = (li.groupBy(F.col("l_partkey").alias("ap_partkey"))
                    .agg((F.avg("l_quantity") * 0.2).alias("qty_cut")))
    return (
        brand_li.join(per_part_avg,
                      F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice").cast("double") / 7.0, 2)
             .alias("avg_yearly")))


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
        SELECT l.l_suppkey, l.l_orderkey,
               (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS is_late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F')
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN late l1 ON s.s_suppkey = l1.l_suppkey
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late)
    GROUP BY s_name
    """,
    tags=("tpch", "join", "exists", "anti-join"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    finished multi-supplier orders. The fixture lacks commit/receipt
    dates, so "late" is shipdate > orderdate + 90 days; the EXISTS /
    NOT EXISTS pair becomes a semi-join plus an anti-join on the
    same (orderkey, suppkey-inequality) condition — each a single
    key-colocated shuffle of the late relation, never a per-row
    subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .where(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .select("l_suppkey", "l_orderkey",
                    (F.col("l_shipdate")
                     > F.date_add(F.col("o_orderdate"), 90)).alias("is_late")))
    l1 = late.where(F.col("is_late")).select(
        F.col("l_suppkey").alias("k1"), F.col("l_orderkey").alias("ok1"))
    others = late.select(F.col("l_suppkey").alias("k2"),
                         F.col("l_orderkey").alias("ok2"), "is_late")
    cand = l1.join(
        others,
        (F.col("ok2") == F.col("ok1")) & (F.col("k2") != F.col("k1")),
        "left_semi")
    sole = cand.join(
        others.where(F.col("is_late")),
        (F.col("ok2") == F.col("ok1")) & (F.col("k2") != F.col("k1")),
        "left_anti")
    return (sole.join(F.broadcast(su), F.col("s_suppkey") == F.col("k1"))
            .groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait")))


@register(
    "q22_prospects",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0),
    frequent AS (
        SELECT o_custkey FROM orders GROUP BY 1 HAVING COUNT(*) >= 5)
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM frequent WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("tpch", "anti-join", "subquery"),
)
def q22_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded, low-engagement customers (above
    -average balance, NOT among the >= 5-order frequent buyers),
    grouped by nation. Adapted to the fixture twice over: no phone
    column (nation key replaces the country code) and every customer
    has placed an order (the generator covers all custkeys), so the
    classic never-ordered NOT EXISTS would be vacuously empty —
    frequent-buyer exclusion keeps the anti-join shape AND a
    non-trivial result at every SF. Scalar-subquery average
    broadcasts; the NOT EXISTS is one anti-join against the
    pre-aggregated frequent-buyer key set."""
    cu = load_table(spark, sf_dir, "customer")
    o_keys = (load_table(spark, sf_dir, "orders")
              .groupBy("o_custkey")
              .agg(F.count(F.lit(1)).alias("n_orders"))
              .where(F.col("n_orders") >= 5)
              .select("o_custkey"))
    avg_bal = (cu.where(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("ab")))
    return (
        cu.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))
