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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.functions.text import tokens
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


_CM_DEPTH = 4
_CM_WIDTH = 256
_CM_PROBES = ("spark", "join", "vector", "table", "query", "the")


def _cm_probes_sql() -> str:
    return ", ".join(f"'{t}'" for t in _CM_PROBES)


@register(
    "q_countmin_tokens",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(list_filter(
                   regexp_split_to_array(text, '[^a-z0-9]+'),
                   x -> x <> '')) AS token
        FROM documents),
    rows_ AS (SELECT unnest(range({_CM_DEPTH})) AS row_i),
    cells AS (
        SELECT row_i,
               CAST(('0x' || substr(md5(row_i || '|' || token), 1, 8))
                    AS BIGINT) % {_CM_WIDTH} AS col,
               COUNT(*) AS c
        FROM toks CROSS JOIN rows_
        GROUP BY row_i, col),
    probes AS (SELECT unnest([{_cm_probes_sql()}]) AS token),
    pcells AS (
        SELECT token, row_i,
               CAST(('0x' || substr(md5(row_i || '|' || token), 1, 8))
                    AS BIGINT) % {_CM_WIDTH} AS col
        FROM probes CROSS JOIN rows_),
    est AS (
        SELECT p.token, MIN(c.c) AS est
        FROM pcells p JOIN cells c USING (row_i, col)
        GROUP BY p.token),
    exact AS (
        SELECT token, COUNT(*) AS exact
        FROM toks WHERE token IN ({_cm_probes_sql()})
        GROUP BY token)
    SELECT token, est, exact, est - exact AS overcount
    FROM est JOIN exact USING (token)
    """,
    tags=("sketch", "approx", "countmin"),
)
def q_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of the corpus token frequencies (4 rows x
    256 columns, md5-derived hash family), probed for a fixed token
    set and compared against exact counts — unlike the HLL entry
    this one is FULLY oracle-checked, because the md5 hash family
    computes identically in DuckDB.

    Build: one token scan; each occurrence increments 4 cells
    (explode of a 4-literal array), and the (row, col) hash
    aggregate IS the sketch — per-partition partials are map-side
    combined, so what shuffles is at most 4*256 cells per task,
    and the merged sketch is 4*256 longs TOTAL regardless of
    corpus size. That boundedness is the operator's point at 100 TB:
    the sketch of a petabyte token stream is still 8 KB, and
    distributing the build is just this same hash agg.

    Probe: est(t) = min over rows of cell(row, h_row(t)) — the CM
    guarantee est >= exact always holds (tests assert it), with
    overshoot ~ N/256 colliding mass per row.
    """
    toks = (load_table(spark, sf_dir, "documents")
            .select(F.explode(tokens("text")).alias("token")))
    rows_ = F.explode(F.array(*[F.lit(i) for i in range(_CM_DEPTH)]))
    col = F.conv(F.substring(
        F.md5(F.concat_ws("|", F.col("row_i"), F.col("token"))), 1, 8),
        16, 10).cast("bigint") % _CM_WIDTH
    cells = (toks.withColumn("row_i", rows_)
             .select("row_i", col.alias("col"))
             .groupBy("row_i", "col").agg(F.count("*").alias("c")))

    probes = spark.createDataFrame([(t,) for t in _CM_PROBES], "token string")
    pcells = (probes.withColumn("row_i", rows_)
              .select("token", "row_i", col.alias("col")))
    est = (pcells.join(cells, ["row_i", "col"])
           .groupBy("token").agg(F.min("c").alias("est")))
    exact = (toks.where(F.col("token").isin(*_CM_PROBES))
             .groupBy("token").agg(F.count("*").alias("exact")))
    return (est.join(exact, "token")
            .select("token", "est", "exact",
                    (F.col("est") - F.col("exact")).alias("overcount")))


@register(
    "q_bitmap_exact_distinct",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, user_id
        FROM events)
    SELECT event_type,
           COUNT(DISTINCT day) AS n_days,
           COUNT(DISTINCT user_id) AS exact_users
    FROM daily GROUP BY event_type
    """,
    tags=("sketch", "bitmap", "distinct", "incremental"),
)
def q_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via Spark 4 bitmap
    aggregates — the precise twin of q_hll_user_sketches (2% HLL).

    Per (event_type, day, bitmap-bucket) the user ids collapse to a
    fixed 4KB bitmap (``bitmap_construct_agg`` over
    ``bitmap_bit_position``); daily bitmaps OR-merge
    (``bitmap_or_agg``) into per-type bitmaps whose set bits are the
    exact distinct count. Unlike COUNT(DISTINCT), the partial state
    is CONSTANT-SIZE per bucket and mergeable across days/partitions
    — the materialized-rollup pattern: store daily bitmaps once,
    answer any date-range distinct query by OR-ing them, no re-scan
    of the raw events. The oracle checks the counts against plain
    COUNT(DISTINCT).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("day"),
                  "user_id")
        .groupBy("event_type", "day",
                 F.bitmap_bucket_number("user_id").alias("bkt"))
        .agg(F.bitmap_construct_agg(
            F.bitmap_bit_position("user_id")).alias("bm"))
    )
    merged = (daily.groupBy("event_type", "bkt")
              .agg(F.bitmap_or_agg("bm").alias("bm")))
    counts = (merged.groupBy("event_type")
              .agg(F.sum(F.bitmap_count("bm")).alias("exact_users")))
    days = (daily.select("event_type", "day").distinct()
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_days")))
    return (counts.join(F.broadcast(days), "event_type")
            .select("event_type", "n_days", "exact_users"))


_BLOOM_M = 131072          # bits (2^17) — sized so sf0.1's ~10k keys
_BLOOM_K = 3               # hash functions (md5-salted, cross-engine)


@register(
    "q_bloom_filter_fpr",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders),
    kpos AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(j || '|' || key), 1, 8))
                    AS BIGINT) % {_BLOOM_M} AS pos
        FROM keys CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS j)),
    nbits AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM kpos),
    probes AS (SELECT c_custkey AS key FROM customer
               UNION ALL
               SELECT c_custkey + 10000000000 FROM customer),
    ppos AS (
        SELECT key, j,
               CAST(('0x' || substr(md5(j || '|' || key), 1, 8))
                    AS BIGINT) % {_BLOOM_M} AS pos
        FROM probes CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS j)),
    hits AS (
        SELECT p.key, COUNT(*) AS n_hit
        FROM ppos p JOIN kpos b ON p.pos = b.pos
        GROUP BY p.key),
    verdicts AS (
        SELECT pr.key,
               COALESCE(h.n_hit, 0) = {_BLOOM_K} AS bloom_pass,
               k.key IS NOT NULL AS actual
        FROM probes pr
        LEFT JOIN hits h ON h.key = pr.key
        LEFT JOIN keys k ON k.key = pr.key),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
               CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keys,
               CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_bloom_pass,
               CAST(SUM(CASE WHEN bloom_pass AND NOT actual
                    THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
               CAST(SUM(CASE WHEN NOT actual THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_negatives
        FROM verdicts)
    SELECT n_probes, n_keys, bits_set, n_bloom_pass, false_pos,
           n_negatives,
           ROUND(CAST(false_pos AS DOUBLE) / NULLIF(n_negatives, 0), 6)
               AS fpr_measured,
           ROUND(CAST(bits_set * bits_set * bits_set AS DOUBLE)
                 / ({_BLOOM_M}::BIGINT * {_BLOOM_M} * {_BLOOM_M}), 6)
               AS fpr_uniform
    FROM agg CROSS JOIN nbits
    """,
    tags=("sketch", "bloom", "join-pruning"),
)
def q_bloom_filter_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a REAL Bloom filter (m=131072 bits, k=3 md5-salted
    hashes) over the distinct buyer keys in orders, probe it with
    every customer key, and measure it: bits set, pass count,
    false positives against the exact anti-join truth, measured FPR
    on the true negatives, and the uniform-fill FPR estimate
    (fill_fraction^k, computed as an exact integer cube over m^3 —
    no transcendental seam). The probe set is every customer key
    PLUS every key shifted by 10^10 — the shifted half is
    guaranteed absent (this fixture gives every customer at least
    one order), so the negative path is genuinely exercised and
    every bloom pass there is a measured false positive.

    This is the runtime-filter idiom measured end-to-end: at 100 TB
    the filter's bit-position set (<= m rows, m fixed) is
    BROADCAST to prune a huge probe-side scan before the real join
    — the declarative cousin of Spark's own runtime bloom pruning
    (which q_runtime_bloom's test asserts at plan level); here the
    filter is explicit data, so its precision is auditable. Both
    relations shuffle only key-sized rows; the only pair-shaped
    work is probe-position x set-position equi-join, bounded by
    k * probes.

    The md5 hash family makes every bit position identical on both
    engines, so the whole pipeline — including the measured FPR —
    is oracle-exact, the same trick q_countmin_tokens plays with
    its cell family.

    Reference parity: none; north-star §2D sketch depth.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    js = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("j")
    pos = (F.conv(F.substring(
        F.md5(F.concat_ws("|", F.col("j"), F.col("key"))), 1, 8), 16, 10)
        .cast("bigint") % _BLOOM_M).alias("pos")
    keys = orders.select(F.col("o_custkey").alias("key")).distinct()
    kpos = keys.select("key", js).select(pos).distinct()
    nbits = kpos.agg(F.count(F.lit(1)).alias("bits_set"))
    probes = (cust.select(F.col("c_custkey").alias("key"))
              .unionAll(cust.select(
                  (F.col("c_custkey") + F.lit(10_000_000_000))
                  .alias("key"))))
    ppos = probes.select("key", js).select("key", pos)
    hits = (ppos.join(F.broadcast(kpos), "pos")
            .groupBy("key").agg(F.count(F.lit(1)).alias("n_hit")))
    verdicts = (probes
                .join(hits, "key", "left")
                .join(keys.withColumn("actual", F.lit(True)),
                      "key", "left")
                .select(
                    (F.coalesce(F.col("n_hit"), F.lit(0)) == _BLOOM_K)
                    .alias("bloom_pass"),
                    F.coalesce(F.col("actual"), F.lit(False))
                    .alias("actual")))
    agg = verdicts.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("actual"), 1).otherwise(0)).alias("n_keys"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("actual"), 1)
              .otherwise(0)).alias("false_pos"),
        F.sum(F.when(~F.col("actual"), 1).otherwise(0))
        .alias("n_negatives"))
    m3 = float(_BLOOM_M) ** 3
    return (agg.crossJoin(F.broadcast(nbits))
            .select("n_probes", "n_keys", "bits_set", "n_bloom_pass",
                    "false_pos", "n_negatives",
                    F.round(F.try_divide(
                        F.col("false_pos").cast("double"),
                        F.col("n_negatives")), 6)
                    .alias("fpr_measured"),
                    F.round((F.col("bits_set") * F.col("bits_set")
                             * F.col("bits_set")).cast("double")
                            / F.lit(m3), 6).alias("fpr_uniform")))


_KMV_K = 64
_KMV_DENOM = float(1 << 52)  # 52-bit hash -> exact double in [0,1)


@register(
    "q_kmv_sketch_intersect",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT event_type, user_id FROM events),
    h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('u|' || CAST(user_id AS VARCHAR)),
                     1, 13)) AS BIGINT) AS hv
        FROM du),
    r AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY hv) AS rnk
        FROM h),
    sk AS (
        SELECT event_type,
               list_sort(array_agg(hv)) AS sketch,
               CAST(MAX(rnk) AS BIGINT) AS n_kept
        FROM r WHERE rnk <= {_KMV_K}
        GROUP BY event_type),
    ex AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS exact_common
        FROM du a JOIN du b ON b.user_id = a.user_id
                           AND b.event_type > a.event_type
        GROUP BY 1, 2),
    pairs AS (
        SELECT sa.event_type AS type_a, sb.event_type AS type_b,
               sa.sketch AS ska, sb.sketch AS skb,
               sa.n_kept AS na, sb.n_kept AS nb,
               list_sort(list_distinct(sa.sketch || sb.sketch))
                   [1:{_KMV_K}] AS uni
        FROM sk sa JOIN sk sb ON sb.event_type > sa.event_type),
    est AS (
        SELECT type_a, type_b, na, nb,
               CASE WHEN len(uni) < {_KMV_K} THEN 1.0
                    ELSE uni[{_KMV_K}] / {_KMV_DENOM!r} END AS theta,
               len(list_filter(uni, x ->
                   list_contains(ska, x) AND list_contains(skb, x)))
                   AS n_common_k
        FROM pairs)
    SELECT e.type_a, e.type_b,
           ROUND(e.n_common_k / e.theta, 4) AS est_common,
           ex.exact_common
    FROM est e JOIN ex ON ex.type_a = e.type_a AND ex.type_b = e.type_b
    """,
    tags=("sketch", "kmv", "distinct", "intersection"),
)
def q_kmv_sketch_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values (theta-style) sketch intersection: per event
    type, keep the 64 smallest md5 hashes of its DISTINCT
    users; for each type pair, merge to the union's k smallest,
    take theta = the k-th smallest as the sampled fraction of hash
    space, and estimate the user overlap as (matching values under
    theta) / theta — the Beyer et al. 2007 / theta-sketch set-
    operation estimator, here next to its EXACT answer so the
    output is the estimator's own error report. Every hash is md5
    (engine-portable), so unlike a probabilistic sketch the whole
    pipeline is deterministic and fully oracle-checked; sketches
    smaller than k are exact (theta = 1), the standard KMV
    degenerate case. The third distinct-counting tier:
    q_bitmap_exact_distinct (exact, dense), q_hll_user_sketches
    (approximate, opaque binary), and KMV (approximate, mergeable
    AND set-operable — HLL unions but cannot intersect without
    inclusion-exclusion blowup).

    Scale shape: one distinct (type, user) collapse, one
    type-partitioned top-k window over the distinct relation, then
    ALL set arithmetic happens on |types| k-element arrays
    (array-local HOFs, zero shuffle); the exact verifier is a
    user-keyed self-join of the distinct relation — the one
    corpus-sized join, present only because the query reports its
    own error. Drop it in production and the cost is one scan +
    |types| * k longs of state. Reference parity: none; north-star
    §2D sketch depth.
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    h = du.select(
        "event_type",
        F.conv(F.substring(
            F.md5(F.concat(F.lit("u|"), F.col("user_id").cast("string"))),
            1, 13), 16, 10).cast("bigint").alias("hv"))
    w = Window.partitionBy("event_type").orderBy("hv")
    sk = (h.withColumn("rnk", F.row_number().over(w))
          .where(F.col("rnk") <= _KMV_K)
          .groupBy("event_type")
          .agg(F.array_sort(F.collect_list("hv")).alias("sketch"),
               F.max("rnk").cast("bigint").alias("n_kept")))
    sb = sk.select(F.col("event_type").alias("type_b"),
                   F.col("sketch").alias("skb"),
                   F.col("n_kept").alias("nb"))
    sa = sk.select(F.col("event_type").alias("type_a"),
                   F.col("sketch").alias("ska"),
                   F.col("n_kept").alias("na"))
    pairs = (sa.join(sb, F.col("type_b") > F.col("type_a"))
             .withColumn("uni", F.slice(
                 F.array_sort(F.array_distinct(
                     F.concat(F.col("ska"), F.col("skb")))),
                 1, _KMV_K)))
    theta = (F.when(F.size("uni") < _KMV_K, F.lit(1.0))
             .otherwise(F.element_at("uni", _KMV_K) / _KMV_DENOM))
    n_common_k = F.size(F.filter(
        "uni", lambda x: F.array_contains(F.col("ska"), x)
        & F.array_contains(F.col("skb"), x)))
    est = pairs.select("type_a", "type_b", theta.alias("theta"),
                       n_common_k.alias("n_common_k"))
    dub = du.select(F.col("event_type").alias("e_type"),
                    F.col("user_id").alias("e_user"))
    ex = (du.join(dub, (F.col("e_user") == F.col("user_id"))
                  & (F.col("e_type") > F.col("event_type")))
          .groupBy(F.col("event_type").alias("x_a"),
                   F.col("e_type").alias("x_b"))
          .agg(F.count(F.lit(1)).alias("exact_common")))
    return (est.join(F.broadcast(ex),
                     (F.col("x_a") == F.col("type_a"))
                     & (F.col("x_b") == F.col("type_b")))
            .select("type_a", "type_b",
                    F.round(F.col("n_common_k") / F.col("theta"), 4)
                    .alias("est_common"),
                    "exact_common"))


@register(
    "q_bitmap_distinct_agg",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM customer GROUP BY c_nationkey
    """,
    tags=("aggregates", "bitmap", "distinct", "sketch", "spark4",
          "customer"),
)
def q_bitmap_distinct_agg(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """EXACT distinct counting through the bitmap aggregate family
    (Spark 3.5/4 builtins: ``bitmap_bucket_number`` /
    ``bitmap_bit_position`` / ``bitmap_construct_agg`` /
    ``bitmap_count``): each key sets one bit in a fixed 4 KB bitmap
    per 32k-id bucket, buckets OR-merge map-side, and the distinct
    count is the popcount sum. Unlike COUNT(DISTINCT) — whose
    partial state is the value SET and whose multi-distinct plans
    expand the input — bitmap partial state is bounded at 4 KB per
    (group, bucket) whatever the row count, and the bitmaps
    themselves are storable: a materialized per-partition bitmap
    table answers distinct-count rollups later via bitmap_or_agg
    WITHOUT rescanning the facts (the incremental-view trick HLL
    gives approximately, exact here because customer ids are dense
    integers). The oracle is plain COUNT(DISTINCT) — the bitmap path
    must reproduce it exactly, value-hash checked.

    Scale shape: one shuffle on (group, bucket) with 4 KB values and
    map-side ORs, then a popcount rollup per group; n_rows rides
    along to pin that the pre-aggregation sees every row. Dense-id
    domains only (the bucket space is id/32768) — arbitrary strings
    go through q_approx_distinct / q_hll_user_sketches instead.
    """
    cu = load_table(spark, sf_dir, "customer")
    per_bucket = (cu.selectExpr(
        "c_nationkey",
        "bitmap_bucket_number(c_custkey) AS bkt",
        "bitmap_bit_position(c_custkey) AS pos")
        .groupBy("c_nationkey", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"),
             F.count(F.lit(1)).alias("n")))
    return (per_bucket.groupBy("c_nationkey")
            .agg(F.sum(F.expr("bitmap_count(bm)")).cast("bigint")
                 .alias("n_customers"),
                 F.sum("n").cast("bigint").alias("n_rows")))
