"""Scalar function surface: string, math, date/time, JSON.

New capability vs the reference (SURVEY.md §2C: "no date/math/json
functions" — its only scalar ops are strconv.Itoa and len). Each
query is a pure projection/aggregation exercising a function family
with oracle-matched semantics; everything stays inside whole-stage
codegen (no Python UDFs anywhere in this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                               AS name_upper,
           length(p_name)                              AS name_len,
           substr(p_name, 1, 8)                        AS name_prefix,
           replace(p_type, 'ECONOMY', 'ECO')           AS type_short,
           concat(p_brand, ':', p_type)                AS brand_type,
           CASE WHEN p_name LIKE '%steel%' THEN 1 ELSE 0 END AS has_steel,
           ltrim(rtrim(concat(' ', p_name, ' ')))      AS name_trimmed,
           reverse(p_brand)                            AS brand_rev
    FROM part
    """,
    tags=("scalar", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/length/substr/replace/concat/like/trim/reverse."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.when(F.col("p_name").like("%steel%"), 1).otherwise(0).alias("has_steel"),
        F.ltrim(F.rtrim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" ")))).alias("name_trimmed"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_extendedprice - 1000.0), 4)  AS abs_diff,
           CAST(floor(l_quantity / 7) AS BIGINT)     AS qty_bucket,
           CAST(ceil(l_discount * 100) AS BIGINT)    AS disc_pct,
           ROUND(sqrt(l_extendedprice), 6)           AS price_sqrt,
           ROUND(ln(l_extendedprice + 1), 6)         AS price_ln,
           ROUND(power(l_tax + 1, 2), 6)             AS tax_sq,
           CAST(l_partkey % 16 AS BIGINT)            AS pk_mod
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    tags=("scalar", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/floor/ceil/sqrt/ln/power/modulo (sampled by key so the
    result set stays compact at any SF)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 4).alias("abs_diff"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        (F.col("l_partkey") % 16).alias("pk_mod"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year  FROM o_orderdate)            AS o_year,
           EXTRACT(month FROM o_orderdate)            AS o_month,
           EXTRACT(day   FROM o_orderdate)            AS o_day,
           CAST(isodow(o_orderdate) AS BIGINT)        AS o_isodow,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS o_quarter,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')
                                                       AS due_date,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
    tags=("scalar", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract year/month/day/quarter, ISO weekday, date arithmetic,
    truncation — emitted as numbers/strings for engine-neutral
    comparison (Spark weekday() is 0=Monday; ISO dow = weekday+1)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("o_isodow"),
        F.quarter("o_orderdate").cast("bigint").alias("o_quarter"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
            .alias("due_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
            .alias("month_start"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "events"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column,
    aggregated per type — get_json_object stays JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.avg(k), 4).alias("avg_k"),
                 F.max(k).alias("max_k")))


@register(
    "q_events_hourly",
    oracle="""
    WITH c AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sc
        FROM events GROUP BY 1, 2)
    SELECT hour, event_type, n AS n_events,
           sc / 100.0 AS sum_value,
           ((2 * sc * 100 + n) // (2 * n)) / 10000.0 AS avg_value
    FROM c
    """,
    tags=("scalar", "date", "events", "window-agg"),
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling rollup of the event stream in batch form —
    the batch twin of the Structured Streaming job in
    streaming/jobs.py (same grouping, same aggregates).

    Exact-integer arithmetic: ``value`` is 2-decimal by contract, so
    sums accumulate as bigint CENTS (order-independent, engine-
    independent) and the 4-dp average is integer half-up rounding —
    the float-summation-order seam the sf0.1 sweep exposed in the
    naive ROUND(SUM(double)) form is closed by construction."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    c = (ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type")
         .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("sc")))
    return c.select(
        "hour", "event_type", F.col("n").alias("n_events"),
        (F.col("sc") / 100.0).alias("sum_value"),
        (F.expr("(2 * sc * 100 + n) DIV (2 * n)") / 10000.0)
        .alias("avg_value"))


@register(
    "q_argmax_events",
    oracle="""
    SELECT event_type,
           arg_max(event_id, value * 100000 + event_id) AS top_event_id,
           arg_max(user_id,  value * 100000 + event_id) AS top_user_id,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "aggregate", "argmax", "events"),
)
def q_argmax_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max aggregation (max_by / arg_max): the row attributes of
    each type's highest-value event, without a self-join or window.
    The ordering key is value*1e5 + event_id — values carry 2
    decimals, so the composite is integral and UNIQUE, making the
    argmax deterministic on both engines (bare max_by ties are
    engine-arbitrary). One map-side-combinable aggregate; the
    window/self-join alternatives shuffle far more."""
    ev = load_table(spark, sf_dir, "events")
    score = F.col("value") * 100000 + F.col("event_id")
    return (ev.groupBy("event_type")
            .agg(F.max_by("event_id", score).alias("top_event_id"),
                 F.max_by("user_id", score).alias("top_user_id"),
                 F.round(F.max("value"), 4).alias("max_value")))


@register(
    "q_null_semantics",
    oracle="""
    WITH t AS (
        SELECT c_mktsegment,
               NULLIF(CAST(round(c_acctbal) AS BIGINT) % 5, 2) AS x,
               NULLIF(CAST(round(c_acctbal) AS BIGINT) % 7, 3) AS y
        FROM customer)
    SELECT c_mktsegment,
           COUNT(*)                        AS n,
           COUNT(x)                        AS n_x,
           CAST(COUNT(*) - COUNT(x) AS BIGINT) AS n_x_null,
           ROUND(AVG(x), 6)                AS avg_x,
           CAST(SUM(CASE WHEN x IS NOT DISTINCT FROM y THEN 1 ELSE 0 END)
                AS BIGINT)                 AS nsafe_eq,
           CAST(SUM(CASE WHEN x = y THEN 1 ELSE 0 END) AS BIGINT) AS plain_eq,
           MIN(COALESCE(x, 99))            AS min_coalesced
    FROM t GROUP BY c_mktsegment
    """,
    tags=("scalar", "null-semantics"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null-semantics parity: null-skipping COUNT/AVG, null-safe
    equality (``<=>`` vs ``=`` — the plain form drops null pairs,
    the null-safe form counts null==null as true), NULLIF
    null-injection and COALESCE recovery, per market segment.
    Engines differ here more often than anywhere else; the oracle
    pins Spark to ANSI behavior column by column."""
    cust = load_table(spark, sf_dir, "customer")
    xv = F.nullif(F.round("c_acctbal").cast("bigint") % 5, F.lit(2))
    yv = F.nullif(F.round("c_acctbal").cast("bigint") % 7, F.lit(3))
    t = cust.select("c_mktsegment", xv.alias("x"), yv.alias("y"))
    return (t.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("x").alias("n_x"),
                 (F.count(F.lit(1)) - F.count("x")).alias("n_x_null"),
                 F.round(F.avg("x"), 6).alias("avg_x"),
                 F.sum(F.when(F.expr("x <=> y"), 1).otherwise(0)).alias("nsafe_eq"),
                 F.sum(F.when(F.col("x") == F.col("y"), 1).otherwise(0))
                 .alias("plain_eq"),
                 F.min(F.coalesce("x", F.lit(99))).alias("min_coalesced")))


@register(
    "q_listagg_ordered",
    oracle="""
    WITH d AS (
        SELECT DISTINCT n.n_name, c.c_mktsegment
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
    SELECT n_name,
           COUNT(*) AS n_segments,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment)
               AS segments_csv
    FROM d GROUP BY n_name
    """,
    tags=("scalar", "aggregate", "string"),
)
def q_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation: Spark 4
    ``LISTAGG(...) WITHIN GROUP (ORDER BY ...)`` vs DuckDB's
    ``string_agg(... ORDER BY ...)`` over a pre-distincted relation
    (LISTAGG DISTINCT + WITHIN GROUP together trips a SortOrder cast
    bug in this Spark build; the distinct belongs upstream anyway —
    it halves the agg input) — the report-building
    aggregate whose output is only stable when the in-group order is
    pinned (unordered collect_list would hash-mismatch run to run).
    Broadcast dim join + one hash agg over nation-cardinality groups.
    """
    from my_mapreduce_spark.io import register_views

    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql("""
        WITH d AS (
            SELECT DISTINCT n.n_name, c.c_mktsegment
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
        SELECT n_name,
               COUNT(*) AS n_segments,
               listagg(c_mktsegment, ',')
                   WITHIN GROUP (ORDER BY c_mktsegment) AS segments_csv
        FROM d GROUP BY n_name
    """)


@register(
    "q_try_arithmetic",
    oracle="""
    SELECT l_linenumber,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div_null,
           CAST(SUM(CASE WHEN l_quantity = 1 THEN 0 ELSE
                    (2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000
                     + (CAST(l_quantity AS BIGINT) - 1))
                    // (2 * (CAST(l_quantity AS BIGINT) - 1)) END) AS BIGINT)
               AS sum_unit_micros,
           CAST(SUM(CASE WHEN TRY_CAST(
                    CASE WHEN l_discount > 0.05
                         THEN CAST(l_quantity AS VARCHAR)
                         ELSE l_returnflag END AS DOUBLE) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable
    FROM lineitem
    GROUP BY l_linenumber
    """,
    tags=("scalar", "ansi", "try-functions", "error-handling"),
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe scalar surface: ``try_divide`` (NULL instead
    of a divide-by-zero job failure) and ``try_cast`` (NULL instead
    of a malformed-cast failure), aggregated so every row exercises
    the error path or the value path.

    This is the dirty-data contract at 100 TB: one malformed row
    must not kill a million-task job, and the NULL-on-error rows
    stay COUNTABLE (n_div_null / n_uncastable are the data-quality
    tallies a pipeline alerts on — the query IS the quarantine
    report). The castability probe mixes numeric strings (quantity)
    with alpha flags so BOTH try_cast outcomes occur. DuckDB has no
    try_divide, so the oracle states the identical semantics with
    NULLIF; try_cast exists in both engines.
    Embarrassingly parallel: one scan, one hash agg, every
    expression whole-stage-codegen'd.
    """
    li = load_table(spark, sf_dir, "lineitem")
    unit = F.try_divide("l_extendedprice",
                        F.col("l_quantity") - F.lit(1))
    return (li.groupBy("l_linenumber")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.when(unit.isNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_div_null"),
                 # per-row unit price as half-up integer MICROS
                 # (cents*10000, the repo's exact-rational idiom): each
                 # row contributes one exact bigint, so the SUM is
                 # order-independent on any partitioning — no
                 # ROUND(SUM(double)) summation-order seam, and no
                 # double->decimal cast (engines disagree on that
                 # rounding path). Headroom: ~2e11/row, exact to ~4e7
                 # max-price rows per group.
                 F.sum(F.expr(
                     "CASE WHEN l_quantity = 1 THEN CAST(0 AS BIGINT) ELSE "
                     "(2 * CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
                     " * 10000 + (CAST(l_quantity AS BIGINT) - 1)) "
                     "DIV (2 * (CAST(l_quantity AS BIGINT) - 1)) END"))
                 .alias("sum_unit_micros"),
                 F.sum(F.when(F.expr(
                     "try_cast(CASE WHEN l_discount > 0.05 "
                     "THEN CAST(l_quantity AS STRING) "
                     "ELSE l_returnflag END AS DOUBLE)").isNull(),
                              1).otherwise(0))
                 .cast("bigint").alias("n_uncastable")))


_MAP_MIN_EVENTS = 3


@register(
    "q_map_hof",
    oracle=f"""
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    t AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1)
    SELECT c.user_id, c.event_type, c.n,
           ROUND(c.n * 1.0 / t.total, 6) AS share
    FROM c JOIN t USING (user_id)
    WHERE c.n >= {_MAP_MIN_EVENTS}
    """,
    tags=("scalar", "map-type", "higher-order-functions", "events"),
)
def q_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed higher-order functions — the HOF family the library
    had not yet pinned (array HOFs: q_array_hof; lambda transforms:
    dedup/shingles): per user, an event_type→count MAP is built with
    ``map_from_entries``, pruned with ``map_filter`` (types with
    fewer than _MAP_MIN_EVENTS=3 events drop INSIDE the map, no
    explode-refilter round trip), shares via ``transform_values``
    against ``aggregate`` over ``map_values``, then exploded back to
    rows so the relational oracle can state the same result.

    All four map ops run inside whole-stage codegen on the already-
    aggregated (user × type) relation — one shuffle total, identical
    to the plain relational plan, which is the point: the map API is
    expressiveness (nested per-key state in ONE column), not a new
    execution cost.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = (ev.groupBy("user_id", "event_type")
                .agg(F.count(F.lit(1)).alias("n")))
    m = (per_type.groupBy("user_id")
         .agg(F.map_from_entries(
             F.collect_list(F.struct("event_type", "n"))).alias("m")))
    total = F.aggregate(F.map_values("m"), F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x)
    kept = F.map_filter("m", lambda k, v: v >= _MAP_MIN_EVENTS)
    shares = F.transform_values(
        kept, lambda k, v: F.round(v * 1.0 / F.col("total"), 6))
    return (m.withColumn("total", total)
            .withColumn("kept", kept)
            .withColumn("shares", shares)
            .select("user_id",
                    F.explode("kept").alias("event_type", "n"),
                    "shares")
            .select("user_id", "event_type", "n",
                    F.element_at("shares", F.col("event_type"))
                    .alias("share")))


@register(
    "q_decimal_exact_money",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR)
               AS sum_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST(l_discount AS DECIMAL(18, 2))) AS VARCHAR)
               AS sum_disc_value,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR)
               AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("scalar", "decimal", "types", "money"),
)
def q_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL money arithmetic — the type-system answer to the
    float-summation seam BASELINE.md documents (the cents idiom is
    the bigint-typed equivalent): prices cast to DECIMAL(18,2) sum
    EXACTLY in any order on any partitioning, products carry scale
    4, and both engines agree digit-for-digit at every tested scale
    by construction, no rounding discipline required.

    Results are emitted as canonical strings because that is the
    point being pinned: the decimal VALUE is exact, so its decimal
    rendering is engine-independent (a double column can never make
    this promise). Spark plans decimal aggregation inside whole-
    stage codegen with map-side partials — same shape as the double
    version, exactness is free at 100 TB until precision exceeds
    Decimal(38), which 18+log10(rows) bounds far above any fixture.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (li.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(price).cast("string").alias("sum_price"),
                 F.sum(price * disc).cast("string").alias("sum_disc_value"),
                 F.max(price).cast("string").alias("max_price")))


@register(
    "q_bitwise_agg",
    oracle="""
    SELECT event_type,
           CAST(bit_and(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS all_bits,
           CAST(bit_or(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS any_bits,
           CAST(bit_xor(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS xor_checksum,
           CAST(bit_count(bit_or(CAST(ROUND(value * 100) AS BIGINT)))
                AS BIGINT) AS any_popcount
    FROM events GROUP BY event_type
    """,
    tags=("scalar", "aggregate", "bitwise"),
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AGGREGATES (bit_and / bit_or / bit_xor / bit_count)
    over integer cents per event type — the bit-domain surface the
    scalar family had not yet pinned. These are the primitives of
    order-insensitive content checksums (bit_xor is what
    q_table_diff_checksums builds its bucket digests from), bitmap
    rollups, and flag-column consolidation; all are commutative and
    associative, so they combine map-side and never care about
    partitioning — the same exactness class as the cents sums.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (ev.groupBy("event_type")
            .agg(F.bit_and(cents).alias("all_bits"),
                 F.bit_or(cents).alias("any_bits"),
                 F.bit_xor(cents).alias("xor_checksum"),
                 F.bit_count(F.bit_or(cents)).cast("bigint")
                 .alias("any_popcount")))


_NOT_IN_SQL = """
SELECT
    (SELECT COUNT(*) FROM part
      WHERE p_partkey % 25 NOT IN
            (SELECT NULLIF(c_nationkey, 3) FROM customer))
        AS n_not_in,
    (SELECT COUNT(*) FROM part p
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE NULLIF(c.c_nationkey, 3) = p.p_partkey % 25))
        AS n_not_exists,
    (SELECT COUNT(*) FROM customer WHERE NULLIF(c_nationkey, 3) IS NULL)
        AS n_null_keys
"""


@register(
    "q_not_in_null_trap",
    oracle=_NOT_IN_SQL,
    tags=("sql-surface", "null-semantics", "subquery", "anti-join"),
)
def q_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN three-valued-logic trap, pinned with ONE SQL text
    on both engines (the q_sql_cte_pipeline contract): when the
    in-list contains a NULL, ``x NOT IN (list)`` is never TRUE (it
    is FALSE or UNKNOWN), so n_not_in is 0 whenever n_null_keys > 0
    — while the NOT EXISTS anti-join ignores the NULL keys and
    returns the count users actually meant. Both engines implement
    the standard's semantics identically; q_anti_join is the
    production anti-join shape, this query is the documented reason
    it is written with NOT EXISTS.

    Catalyst plans NOT IN as a null-aware anti join — a broadcast
    NAAJ here since the subquery side is dimension-sized; at scale a
    null-aware anti join degenerates to a broadcast nested loop when
    the build side can hold NULLs, which is itself the performance
    argument for NOT EXISTS.
    """
    for t in ("part", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_NOT_IN_SQL)


_GROUP_BY_ALL_SQL = """
SELECT l_returnflag,
       l_linestatus,
       l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM lineitem
GROUP BY ALL
"""


@register(
    "q_group_by_all",
    oracle=_GROUP_BY_ALL_SQL,
    tags=("sql-surface", "aggregate", "group-by-all"),
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the analyst-ergonomics SQL surface (group
    by every non-aggregate select expression), pinned with ONE SQL
    text on both engines (the q_not_in_null_trap contract): Spark
    3.4+ and DuckDB resolve the same three grouping keys from the
    select list (returnflag, linestatus, linenumber), so adding a projected column to the query cannot
    silently change grouping semantics differently per engine.

    Plans identically to the explicit GROUP BY: one scan, map-side
    partial hash aggregation over (returnflag, linestatus,
    linenumber) — grouping-key inference is purely an analysis-time
    rewrite, free at any scale. Sums use the exact-cents bigint
    discipline (BASELINE.md float-seam taxonomy)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUP_BY_ALL_SQL)


@register(
    "q_month_arithmetic",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH,
                    '%Y-%m-%d') AS plus_1m,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 13 MONTH,
                    '%Y-%m-%d') AS plus_13m,
           strftime(CAST(o_orderdate AS DATE) - INTERVAL 2 MONTH,
                    '%Y-%m-%d') AS minus_2m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_end,
           CAST(EXTRACT(day FROM last_day(CAST(o_orderdate AS DATE)))
                AS BIGINT) AS days_in_month
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    tags=("scalar", "date", "month-arithmetic"),
)
def q_month_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month arithmetic with END-OF-MONTH CLAMPING — the
    semantics billing/retention pipelines depend on: Jan 31 + 1
    month = Feb 29 (leap) / Feb 28, never Mar 2; 13-month and
    negative offsets cross year boundaries; last_day() and
    days-in-month derive the clamp target. Spark's add_months and
    DuckDB's + INTERVAL n MONTH implement the same clamp, which is
    exactly what this query pins (a day-based 30*n approximation
    diverges on 62% of month ends). All outputs are dates-as-strings
    — no timezone or float seam; pure projection, embarrassingly
    parallel, sampled by key to stay compact at any SF."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_1m"),
        F.date_format(F.add_months(d, 13), "yyyy-MM-dd").alias("plus_13m"),
        F.date_format(F.add_months(d, -2), "yyyy-MM-dd").alias("minus_2m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofmonth(F.last_day(d)).cast("bigint").alias("days_in_month"),
    )


_LONG_TOK = 8  # tokens this long are absent from ~1/5 of fixture docs


@register(
    "q_explode_outer",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id,
               list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                           x -> len(x) >= {_LONG_TOK}) AS w
        FROM documents)
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(GREATEST(len(w), 1)) AS BIGINT) AS n_rows_outer,
           CAST(SUM(CASE WHEN len(w) = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_no_match,
           CAST(SUM(len(w)) AS BIGINT) AS n_tokens
    FROM t GROUP BY source
    """,
    tags=("scalar", "explode", "null-semantics", "documents"),
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer`` — NULL-preserving array explosion: a
    document whose filtered token array is EMPTY survives as one
    NULL-token row instead of vanishing (plain ``explode`` is an
    implicit inner join against the array; the _outer variant is the
    left join). The filter keeps only long (>= 8-char)
    tokens so ~1/5 of fixture docs genuinely hit the empty-array
    path — both semantics are exercised, and the oracle states the
    row algebra arithmetically (GREATEST(len, 1) rows per doc).

    Why it matters in a pipeline: per-token quality joins written
    with plain explode silently DROP token-less documents from
    document-level rollups — the outer explode is how a fan-out
    stage stays row-complete. Same single-pass generate + hash-agg
    plan as q_posexplode_tokens; the NULL rows cost nothing extra.
    """
    docs = load_table(spark, sf_dir, "documents")
    from my_mapreduce_spark.functions.text import tokens
    w = F.filter(tokens(), lambda x: F.length(x) >= _LONG_TOK)
    ex = (docs.select("source", "doc_id", w.alias("w"))
          .select("source", "doc_id", F.explode_outer("w").alias("tok")))
    return (ex.groupBy("source")
            .agg(F.count_distinct("doc_id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_rows_outer"),
                 F.sum(F.when(F.col("tok").isNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_docs_no_match"),
                 F.sum(F.when(F.col("tok").isNotNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_tokens")))


_REX_PATTERN = "th[a-z]+"   # identical regex text on both engines


@register(
    "q_regexp_extract_all",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_REX_PATTERN}')))
                AS BIGINT) AS n_matches,
           CAST(SUM(CASE WHEN len(regexp_extract_all(text,
                        '{_REX_PATTERN}')) = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_no_match,
           CAST(SUM(len(list_distinct(regexp_extract_all(text,
                        '{_REX_PATTERN}')))) AS BIGINT)
               AS n_distinct_per_doc_sum
    FROM documents GROUP BY source
    """,
    tags=("scalar", "string", "regex", "documents"),
)
def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``regexp_extract_all`` — ALL matches of a pattern per row as
    an array (the single-match regexp_extract's plural sibling, and
    the primitive under span extraction / PII candidate harvesting):
    per source, total match count, docs with zero matches, and the
    sum of per-doc distinct-match counts (exercising array_distinct
    over the extracted array without an explode round-trip).

    Both engines run the same regex TEXT; match counting stays
    JVM-side inside whole-stage codegen (one scan, one hash agg) —
    the same embarrassingly-parallel shape as q_string_funcs. At
    100 TB the regex cost is per-row CPU with no shuffle beyond the
    source-cardinality aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    # idx=0 = the whole match (Spark defaults to capture group 1)
    m = F.regexp_extract_all("text", F.lit(_REX_PATTERN), F.lit(0))
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.size(m)).cast("bigint").alias("n_matches"),
                 F.sum(F.when(F.size(m) == 0, 1).otherwise(0))
                 .cast("bigint").alias("n_docs_no_match"),
                 F.sum(F.size(F.array_distinct(m))).cast("bigint")
                 .alias("n_distinct_per_doc_sum")))
