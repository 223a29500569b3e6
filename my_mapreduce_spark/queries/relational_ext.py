"""Relational breadth: join varieties, subqueries, grouping sets.

All new capability vs the reference (SURVEY.md §2C: it has no joins
of any kind — its ceiling is group-by-key at ``mr/worker.go:194-204``).
Every query is written so Catalyst can do the heavy lifting:
broadcast hints on dimension sides, semi/anti joins expressed as
joins (not row filters over collects), subqueries in decorrelated
join form. Scale note per query in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register


def _r4(c):
    return F.round(c, 4)


@register(
    "q6_revenue_change",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "aggregate", "pushdown"),
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the
    pushdown showcase. All four predicates reach the parquet scan
    (min/max row-group pruning on shipdate at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q_semi_join",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
    """,
    tags=("relational", "join"),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: suppliers with at least one max-quantity
    shipment. Semi join short-circuits per key — no fact-side
    duplication, and the supplier side stays broadcast-able."""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 49)
    return (sup.join(li, sup.s_suppkey == li.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name"))


@register(
    "q_anti_join",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
    """,
    tags=("relational", "join"),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: parts never shipped at max quantity."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 49)
    return (part.join(li, part.p_partkey == li.l_partkey, "left_anti")
            .select("p_partkey", "p_brand"))


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    tags=("relational", "join", "aggregate"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join + double aggregation (order count
    per customer, then histogram of counts). The outer join keeps
    zero-order customers; COUNT(o_orderkey) counts non-nulls only."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q_correlated_subquery",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p
    WHERE p_retailprice > 1.05 * (SELECT AVG(p2.p_retailprice)
                                  FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
    tags=("relational", "subquery"),
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (parts priced >5% above their brand
    average), written in its decorrelated join form — the rewrite
    Catalyst itself would produce: one agg over the correlation key,
    broadcast back. No per-row subquery execution at any scale."""
    part = load_table(spark, sf_dir, "part")
    brand_avg = part.groupBy("p_brand").agg(F.avg("p_retailprice").alias("_avg"))
    return (
        part.join(F.broadcast(brand_avg), "p_brand")
        .where(F.col("p_retailprice") > 1.05 * F.col("_avg"))
        .select("p_partkey", "p_brand", "p_retailprice")
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice), 4) AS sum_price
    FROM lineitem
    WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)
    GROUP BY l_returnflag
    """,
    tags=("relational", "subquery"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (above-average quantity), as a cross-join of a
    1-row aggregate — Spark broadcasts the scalar automatically."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.agg(F.avg("l_quantity").alias("_avg"))
    return (
        li.join(F.broadcast(avg_qty))
        .where(F.col("l_quantity") > F.col("_avg"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_items"),
             _r4(F.sum("l_extendedprice")).alias("sum_price"))
    )


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("relational", "aggregate", "grouping-sets"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping sets — (flag,status), (flag), ()."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 _r4(F.sum("l_quantity")).alias("sum_qty")))


@register(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "aggregate", "grouping-sets"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two low-cardinality dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return (orders.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 _r4(F.sum("o_totalprice")).alias("sum_price")))


@register(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("relational", "aggregate", "distinct"),
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates — Spark plans an expand +
    two-phase aggregate; at scale prefer approx_count_distinct
    (see q_approx_distinct) when exactness isn't required."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.count_distinct("l_partkey").alias("n_parts"),
                 F.count_distinct("l_suppkey").alias("n_supps"),
                 F.count(F.lit(1)).alias("n_items")))


@register(
    "q_approx_distinct",
    oracle=None,  # HLL estimates are engine-specific; rows-only check
    tags=("relational", "aggregate", "approx"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB answer to
    q_distinct_agg: mergeable sketches, no expand, bounded memory.
    Estimates are engine-specific so the oracle is rows-only; the
    unit test asserts <5% relative error vs the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
                 F.approx_count_distinct("l_suppkey", 0.02).alias("approx_supps")))


@register(
    "q_theta_join_price_band",
    oracle="""
    SELECT b.band_name, COUNT(*) AS n_parts,
           ROUND(AVG(p.p_retailprice), 4) AS avg_price
    FROM part p
    JOIN (VALUES ('budget',   900.0, 930.0),
                 ('standard', 930.0, 960.0),
                 ('premium',  960.0, 1000.0)) AS b(band_name, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_name
    """,
    tags=("relational", "join", "non-equi"),
)
def q_theta_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny in-memory band table —
    planned as BroadcastNestedLoopJoin, which is exactly right when
    one side is a handful of rows."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 900.0, 930.0), ("standard", 930.0, 960.0),
         ("premium", 960.0, 1000.0)],
        "band_name string, lo double, hi double")
    return (
        part.join(F.broadcast(bands),
                  (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi))
        .groupBy("band_name")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             _r4(F.avg("p_retailprice")).alias("avg_price"))
    )


@register(
    "q_null_safe_join",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN NULL
                    ELSE CAST(floor(c_acctbal) AS BIGINT) // 1000 END
                   AS bal_band
        FROM customer),
    o AS (
        SELECT o_custkey,
               CASE WHEN o_totalprice > 250000 THEN NULL
                    ELSE CAST(floor(o_totalprice) AS BIGINT) // 50000 END
                   AS price_band,
               o_totalprice
        FROM orders),
    bands AS (
        SELECT DISTINCT bal_band FROM c),
    matched AS (
        SELECT b.bal_band AS band,
               COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS total_price
        FROM bands b JOIN o
          ON b.bal_band IS NOT DISTINCT FROM o.price_band
        GROUP BY 1)
    SELECT band, n_orders, total_price FROM matched
    """,
    tags=("join", "null-semantics", "relational"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): the
    NULL band on each side must MATCH (one output group), where a
    plain ``=`` would silently drop every NULL-keyed row — the
    semantics corner that matters whenever a derived join key can be
    'unknown' on both sides (sentinel buckets, optional dimensions).

    Catalyst plans ``<=>`` as a hash join (EqualNullSafe is a valid
    equi-join key), NOT a nested loop — same single-shuffle cost as
    ``=``; the distinct band side is dimension-sized and broadcast.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c = cust.select(
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.floor(F.floor("c_acctbal") / 1000).cast("bigint"))
        .alias("bal_band"))
    o = orders.select(
        F.when(F.col("o_totalprice") > 250000, F.lit(None))
        .otherwise(F.floor(F.floor("o_totalprice") / 50000).cast("bigint"))
        .alias("price_band"),
        "o_totalprice")
    bands = c.distinct()
    return (F.broadcast(bands)
            .join(o, bands.bal_band.eqNullSafe(o.price_band))
            .groupBy(F.col("bal_band").alias("band"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price")))


@register(
    "q_basket_brand_affinity",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
    bs AS (SELECT brand, COUNT(*) AS n_brand FROM ob GROUP BY 1),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               COUNT(*) AS n_both
        FROM ob a JOIN ob b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY 1, 2)
    SELECT brand_a, brand_b, n_both,
           ROUND(n_both * 1.0 / (SELECT n_orders FROM n), 6) AS support,
           ROUND(n_both * 1.0 * (SELECT n_orders FROM n)
                 / (x.n_brand * y.n_brand), 6) AS lift
    FROM pairs JOIN bs x ON brand_a = x.brand
               JOIN bs y ON brand_b = y.brand
    WHERE n_both >= 5
    """,
    tags=("relational", "basket", "affinity", "join"),
)
def q_basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between part brands: support and lift
    for every brand pair co-occurring in ≥5 orders — the co-purchase
    signal behind recommendations ('brands bought together').

    The (order, brand) relation distincts once (the only
    corpus-sized agg); the pair join is order-keyed with a<b
    orientation — fan-out is per-order brand count squared (baskets
    are small), never |orders|²; brand marginals and the order total
    are dimension-sized broadcasts. lift>1 = genuinely associated,
    not just popular.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (li.join(part, li.l_partkey == part.p_partkey)
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("p_brand").alias("brand")).distinct())
    n = ob.agg(F.count_distinct("okey").alias("n_orders"))
    bs = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("n_brand"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (a.join(b, (F.col("a.okey") == F.col("b.okey"))
                    & (F.col("a.brand") < F.col("b.brand")))
             .groupBy(F.col("a.brand").alias("brand_a"),
                      F.col("b.brand").alias("brand_b"))
             .agg(F.count(F.lit(1)).alias("n_both"))
             .where(F.col("n_both") >= 5))
    return (pairs
            .join(F.broadcast(bs.alias("x")),
                  F.col("brand_a") == F.col("x.brand"))
            .join(F.broadcast(bs.alias("y")),
                  F.col("brand_b") == F.col("y.brand"))
            .crossJoin(F.broadcast(n))
            .select("brand_a", "brand_b", "n_both",
                    F.round(F.col("n_both") / F.col("n_orders"), 6)
                    .alias("support"),
                    F.round(F.col("n_both") * F.col("n_orders")
                            / (F.col("x.n_brand") * F.col("y.n_brand")),
                            6).alias("lift")))


@register(
    "q_grouping_id_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           COUNT(*) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("relational", "rollup", "grouping"),
)
def q_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with ``grouping_id`` — the bit that makes rollups safe
    on nullable columns: GROUPING() distinguishes 'NULL because the
    rollup aggregated this level away' from 'NULL in the data',
    which the COALESCE label alone cannot. Same map-side-combined
    rollup agg as q_rollup, plus the grouping-bit projection.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
             (F.grouping("l_returnflag") * 2
              + F.grouping("l_linestatus")).cast("bigint").alias("gid"))
        .select(F.coalesce("l_returnflag", F.lit("<all>"))
                .alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("<all>"))
                .alias("linestatus"),
                "gid", "n_rows", "total_price"))


@register(
    "q_weighted_median",
    oracle="""
    WITH r AS (
        SELECT l_returnflag, l_extendedprice,
               CAST(l_quantity AS BIGINT) AS w,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_w,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_returnflag) AS total_w
        FROM lineitem)
    SELECT l_returnflag AS returnflag,
           CAST(MAX(total_w) AS BIGINT) AS total_weight,
           MIN(CASE WHEN 2 * cum_w >= total_w
                    THEN l_extendedprice END) AS weighted_median
    FROM r GROUP BY l_returnflag
    """,
    tags=("stats", "percentile", "window"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — 'the price a
    median UNIT shipped at', which an unweighted median misstates
    whenever quantity correlates with price. Spec'd exactly: the
    smallest price whose cumulative weight reaches half the total,
    with the half test as ``2·cum ≥ total`` in bigint (no 0.5
    float). One partitioned running-sum window + one hash agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wsum = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("w")
    ).select(
        "l_returnflag", "l_extendedprice",
        F.sum("w").over(wsum).alias("cum_w"),
        F.sum("w").over(wtot).alias("total_w"))
    return (r.groupBy(F.col("l_returnflag").alias("returnflag"))
            .agg(F.max("total_w").cast("bigint").alias("total_weight"),
                 F.min(F.when(2 * F.col("cum_w") >= F.col("total_w"),
                              F.col("l_extendedprice")))
                 .alias("weighted_median")))


_AP_MINSUP_FLOOR = 5
_AP_MINSUP_DENOM = 15000  # minsup = max(5, n_baskets DIV 15000): support
                          # tracks corpus size, so the threshold is the
                          # same FRACTION of baskets at every sf


def _apriori_oracle() -> str:
    return f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey,
               p.p_brand || '/' || p.p_type AS item
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    thr AS (SELECT GREATEST({_AP_MINSUP_FLOOR},
                            COUNT(DISTINCT okey) // {_AP_MINSUP_DENOM})
                   AS minsup FROM ob),
    t AS (
        SELECT a.item AS item_a, x.item AS item_b, y.item AS item_c,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM ob a
        JOIN ob x ON a.okey = x.okey AND a.item < x.item
        JOIN ob y ON a.okey = y.okey AND x.item < y.item
        GROUP BY 1, 2, 3)
    SELECT item_a, item_b, item_c, n_orders
    FROM t, thr WHERE n_orders >= thr.minsup
    """


@register(
    "q_itemsets_apriori",
    oracle=_apriori_oracle(),
    tags=("relational", "basket", "itemsets", "apriori"),
)
def q_itemsets_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets over (brand/type) order baskets with
    A-PRIORI candidate pruning (Agrawal/Srikant 1994): frequent
    items (L1) -> frequent pairs (L2) -> triples counted ONLY where
    all three sub-pairs are L2-frequent (anti-monotonicity: a
    triple cannot beat minsup if any sub-pair misses it). minsup is
    RELATIVE — max(5, baskets DIV 15000) — so the semantics and the
    pruning power are sf-invariant. The oracle is the brute-force
    triple self-join with the same HAVING, proving per run that
    the pruning is lossless.

    Scale shape: baskets build with ONE combiner-reduced shuffle
    (collect_set deduplicates in the agg, no separate distinct);
    the L1 prune is an array_intersect against the collected
    frequent-item vocabulary (bounded by the catalog, 150 here —
    the same bounded-collect contract as the PQ codebooks); pair
    and triple INSTANCES generate array-locally inside each basket
    row (zero shuffle — combination explode over arrays bounded by
    basket size), and the three L2 membership checks are BROADCAST
    left-semi joins applied BEFORE the triple aggregate, so the
    only triple-shaped shuffle is already candidate-pruned. At
    100 TB the cubic term never touches the network except where
    every sub-pair clears minsup — the classic candidate-
    generation cut that makes market-basket mining feasible on
    full order histories. Reference parity: none; north-star §2D
    mining depth next to q_basket_brand_affinity's pair tier.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand",
                                                    "p_type")
    b = (li.join(part, li.l_partkey == part.p_partkey)
         .select(F.col("l_orderkey").alias("okey"),
                 F.concat_ws("/", "p_brand", "p_type").alias("item"))
         .groupBy("okey")
         .agg(F.array_sort(F.collect_set("item")).alias("items"))
         .persist())
    try:
        minsup = b.agg(F.greatest(
            F.lit(_AP_MINSUP_FLOOR),
            F.expr(f"count(1) DIV {_AP_MINSUP_DENOM}"))).collect()[0][0]
        l1 = [r[0] for r in
              (b.select(F.explode("items").alias("item"))
               .groupBy("item").agg(F.count(F.lit(1)).alias("n"))
               .where(F.col("n") >= minsup).select("item").collect())]
        if not l1:  # zero-row / all-infrequent input: typed empty result
            return spark.createDataFrame(
                [], "item_a string, item_b string, item_c string, "
                    "n_orders long")
        bf = (b.select("okey",
                       F.array_intersect("items", F.lit(l1)).alias("items"))
              .where(F.size("items") >= 2))
        pr = bf.select(F.explode(F.expr("""
            flatten(transform(items, (x, i) ->
              transform(slice(items, i + 2, size(items)), y ->
                struct(x AS i1, y AS i2))))""")).alias("p"))
        l2 = (pr.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
              .where(F.col("n") >= minsup).select("p.i1", "p.i2"))
        tr = (bf.where(F.size("items") >= 3)
              .select(F.explode(F.expr("""
                flatten(flatten(transform(items, (x, i) ->
                  transform(slice(items, i + 2, size(items)), (y, j) ->
                    transform(slice(items, i + j + 3, size(items)), z ->
                      struct(x AS i1, y AS i2, z AS i3))))))"""))
                      .alias("t")))
        trip = (tr.join(F.broadcast(l2),
                        (F.col("t.i1") == F.col("i1"))
                        & (F.col("t.i2") == F.col("i2")), "leftsemi")
                .join(F.broadcast(l2.select(F.col("i1").alias("j1"),
                                            F.col("i2").alias("j2"))),
                      (F.col("t.i2") == F.col("j1"))
                      & (F.col("t.i3") == F.col("j2")), "leftsemi")
                .join(F.broadcast(l2.select(F.col("i1").alias("k1"),
                                            F.col("i2").alias("k2"))),
                      (F.col("t.i1") == F.col("k1"))
                      & (F.col("t.i3") == F.col("k2")), "leftsemi")
                .groupBy(F.col("t.i1").alias("item_a"),
                         F.col("t.i2").alias("item_b"),
                         F.col("t.i3").alias("item_c"))
                .agg(F.count(F.lit(1)).alias("n_orders"))
                .where(F.col("n_orders") >= minsup))
        # localCheckpoint materializes the result so it survives the
        # unpersist of `b` below WITHOUT routing result bytes through
        # the driver (the old collect+createDataFrame idiom).
        return trip.localCheckpoint(eager=True)
    finally:
        b.unpersist()


# ---------------------------------------------------------------------------
# Lateral join — ONE SQL text, both engines
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n CROSS JOIN LATERAL (
    SELECT c_name, c_acctbal FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
      AND c.c_acctbal > 0
    ORDER BY c_acctbal DESC, c_name LIMIT 2) t
"""


@register(
    "q_lateral_topn",
    oracle=_LATERAL_SQL,
    tags=("sql-surface", "relational", "join", "lateral"),
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: per nation, its top-2 positive-
    balance customers — ONE ANSI SQL text executed verbatim by
    ``spark.sql`` AND as the DuckDB oracle (the q_sql_cte_pipeline
    contract, extended to the lateral-join surface Spark added in
    3.2; the reference has no SQL surface at all, SURVEY §2C).

    Catalyst decorrelates the LATERAL into a partitioned rank window
    over customer keyed by c_nationkey joined back to nation — i.e.
    the same plan as the hand-written window top-n, NOT a per-row
    re-execution of the subquery. One shuffle on nationkey; at 100 TB
    the window partitions are nation-bounded and the nation side is
    broadcast.
    """
    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


_HIER_FANOUT = 10   # parent(k) = k DIV 10: a forest of decimal tries


@register(
    "q_hierarchy_rollup",
    oracle=f"""
    WITH p AS (
        SELECT p_partkey AS k,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
        FROM part),
    anc AS (
        -- list_distinct: short keys hit node 0 on several quotients
        -- (42 -> [42, 4, 0, 0, ...]); without dedup the root would
        -- multiple-count each part by (8 - digits)
        SELECT k, cents,
               unnest(list_distinct([k,
                       k // {_HIER_FANOUT},
                       k // {_HIER_FANOUT ** 2},
                       k // {_HIER_FANOUT ** 3},
                       k // {_HIER_FANOUT ** 4},
                       k // {_HIER_FANOUT ** 5},
                       k // {_HIER_FANOUT ** 6},
                       k // {_HIER_FANOUT ** 7}])) AS node
        FROM p),
    roll AS (
        SELECT node,
               CAST(COUNT(*) AS BIGINT) AS subtree_parts,
               CAST(SUM(cents) AS BIGINT) AS subtree_cents
        FROM anc GROUP BY node)
    SELECT node,
           CAST(CASE WHEN node = 0 THEN 0
                ELSE length(CAST(node AS VARCHAR)) END AS BIGINT)
               AS depth,
           subtree_parts, subtree_cents
    FROM roll
    WHERE subtree_parts >= 2
    """,
    tags=("relational", "hierarchy", "rollup", "tree", "part"),
)
def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (subtree) rollup over a part taxonomy — the
    org-chart / category-tree aggregate warehouses express with
    recursive CTEs: every node's subtree part count and exact-cents
    retail value. The taxonomy is the synthetic decimal trie
    parent(k) = k DIV 10 (key 4217 sits under 421 under 42 under 4
    under root 0), so ancestry is CLOSED-FORM: each part explodes to
    its <= 8 ancestors as a pure expression — no recursion, no
    iteration, no join to a parent table — and the rollup is ONE
    combiner-reduced aggregate over the exploded relation.

    That closed form is the scale point: a recursive/iterative
    ancestor walk shuffles per LEVEL (the CC-loop shape), while a
    bounded-depth encoded hierarchy (materialized-path or digit-trie
    keys, as here) rolls up any corpus in a single exchange with 8x
    map-side fanout; DuckDB states the identical unnest. Depth is
    digit count; single-part leaves are cut (subtree_parts >= 2) to
    keep the output the aggregation surface, not a copy of the scan.
    """
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.round(F.col("p_retailprice") * 100).cast("bigint")
        .alias("cents"))
    # integer DIV, not float division + cast: keys past 2^53 would
    # silently round under double arithmetic at real scale
    # array_distinct: a key with d < 8 digits reaches node 0 on every
    # quotient past the d-th — without dedup the root (and only the
    # root) would count each part (8 - d) extra times
    anc = p.select(
        "cents",
        F.explode(F.array_distinct(F.array(*[
            F.expr(f"k DIV {_HIER_FANOUT ** i}") if i else F.col("k")
            for i in range(8)]))).alias("node"))
    roll = (anc.groupBy("node")
            .agg(F.count(F.lit(1)).alias("subtree_parts"),
                 F.sum("cents").alias("subtree_cents")))
    depth = F.when(F.col("node") == 0, F.lit(0)).otherwise(
        F.length(F.col("node").cast("string"))).cast("bigint")
    return (roll.where(F.col("subtree_parts") >= 2)
            .select("node", depth.alias("depth"),
                    "subtree_parts", "subtree_cents"))
