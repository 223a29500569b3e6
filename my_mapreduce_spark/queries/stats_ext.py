"""Rank statistics, agreement, concentration, and drift — the
fifth round-4 batch (SURVEY §2C/§2D statistics depth).

- ``q_spearman_corr``: Spearman rank correlation (ordinal-rank
  variant) between account balance and lifetime order revenue —
  the monotone-association screen that Pearson misses when the
  relationship is nonlinear or heavy-tailed.
- ``q_cohens_kappa``: chance-corrected agreement of the stopword
  language classifier against its labels — the honest version of
  "accuracy" when class priors are skewed.
- ``q_gini_concentration``: Gini coefficient + top-decile share of
  customer revenue — the inequality/concentration census (who
  carries the corpus: the dataset-curation analogue is source or
  domain concentration before mixing).
- ``q_psi_drift``: per-bin Population Stability Index terms of
  each source's doc-length distribution against the ``src0``
  reference — the binned drift monitor deployed next to
  q_source_kl_divergence (token space) and q_ks_test (exact ECDF).
- ``q_shard_pack_cumsum``: byte-budgeted training-shard assignment
  via a DISTRIBUTED global prefix sum (next-fit by running total —
  the shard-writer planning step of a corpus export).
- ``q_crosscorr_leadlag``: lead-lag cross-correlation between the
  click and purchase hourly series at lags -3..+3 — which signal
  leads which, the time-series causality screen.

Every statistic here is a closed form of EXACT integer moments
(ranks, cents, counts) — the no-accumulation-seam discipline of
q_ab_test_welch/q_groupwise_ols: float appears only in the final
deterministic expression, so results are bit-stable across cluster
layouts and engines.

Scale shape (100 TB): the two rank queries use the two-pass
range-partitioned machinery in functions/ranking.py (never a
data-sized single-partition window); PSI/kappa/crosscorr run on
category-, class-, and hour-bounded relations after one scan each.
Reference parity: none — north-star §2D statistics/curation depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.functions.ranking import (
    distributed_prefix_sum,
    distributed_row_number,
)
from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_SHARD_TARGET = 25_000           # chars per training shard
_HOUR_US = 3_600_000_000         # microseconds per hour
_PSI_BINS = 10
_PSI_REF = "src0"                # drift reference source


@register(
    "q_spearman_corr",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS rev
        FROM orders GROUP BY 1),
    b AS (
        SELECT c_custkey, c_acctbal,
               COALESCE(rev, CAST(0 AS DECIMAL(18,2))) AS rev
        FROM customer LEFT JOIN rev ON c_custkey = o_custkey),
    r AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey)
                    AS BIGINT) AS rx,
               CAST(ROW_NUMBER() OVER (ORDER BY rev, c_custkey)
                    AS BIGINT) AS ry
        FROM b),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx) AS BIGINT) AS sx,
               CAST(SUM(ry) AS BIGINT) AS sy,
               CAST(SUM(rx * rx) AS BIGINT) AS sxx,
               CAST(SUM(ry * ry) AS BIGINT) AS syy,
               CAST(SUM(rx * ry) AS BIGINT) AS sxy
        FROM r)
    SELECT n AS n_customers,
           ROUND((n * sxy - sx * sy) * 1.0
                 / SQRT((n * sxx - sx * sx) * 1.0
                        * (n * syy - sy * sy)), 6) AS spearman_rho
    FROM m
    """,
    tags=("stats", "correlation", "rank", "spearman"),
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account
    balance and their lifetime order revenue (customers without
    orders count as 0 revenue) — the monotone-association measure:
    Pearson on the RANKS, immune to outliers and monotone
    transforms. Ties are resolved ordinally by ``c_custkey``
    (deterministic on both engines), the standard ordinal-rank
    variant; revenue is summed in exact DECIMAL(18,2) so rank order
    never depends on float accumulation order.

    All six moments (n, Σrx, Σry, Σrx², Σry², Σrxry) are exact
    bigints; rho is ONE deterministic double expression of them
    (bigint sums hold to n ≈ 2.6M rows — beyond that the sums swap
    to DECIMAL(38,0), same plan). Both global ranks come from
    functions/ranking.distributed_row_number — two-pass range
    partition + broadcast prefix offsets, shuffle-parallel, never a
    data-sized single-partition window — then meet in one equi-join
    on the customer key and collapse to a 1-row moment aggregate
    with map-side partials. Cost at 100 TB: two range shuffles of
    (key, value) pairs + one key join; no driver-side data.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("rev")))
    # persisted (caller-released): both rank passes range-shuffle the
    # SAME materialized relation instead of re-running the join
    b = (cust.join(rev, cust.c_custkey == rev.o_custkey, "left")
         .select("c_custkey", "c_acctbal",
                 F.coalesce("rev", F.lit(0).cast("decimal(18,2)"))
                 .alias("rev"))
         .persist())
    rx = distributed_row_number(
        b.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        out="rx").select("c_custkey", "rx")
    ry = distributed_row_number(
        b.select("c_custkey", "rev"),
        [F.col("rev"), F.col("c_custkey")],
        out="ry").select("c_custkey", "ry")
    m = (rx.join(ry, "c_custkey")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("rx").alias("sx"), F.sum("ry").alias("sy"),
              F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
              F.sum(F.col("ry") * F.col("ry")).alias("syy"),
              F.sum(F.col("rx") * F.col("ry")).alias("sxy")))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        n.alias("n_customers"),
        F.round((n * sxy - sx * sy) * 1.0
                / F.sqrt((n * sxx - sx * sx) * 1.0
                         * (n * syy - sy * sy)), 6).alias("spearman_rho"))


@register(
    "q_cohens_kappa",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents),
    s AS (
        SELECT doc_id, lang,
               len(list_filter(w, x -> list_contains(
                   ['the','a','of','to','and','in','is'], x))) AS s_en,
               len(list_filter(w, x -> list_contains(
                   ['der','die','das','und','ist','ein'], x))) AS s_de,
               len(list_filter(w, x -> list_contains(
                   ['le','la','les','et','est','un'], x)))     AS s_fr,
               len(list_filter(w, x -> list_contains(
                   ['el','la','los','y','es','un'], x)))       AS s_es
        FROM t),
    p AS (
        SELECT lang,
               CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0
                         THEN 'unknown'
                    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                         THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS predicted
        FROM s),
    cm AS (SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
           FROM p GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cm),
    diag AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS d
             FROM cm WHERE lang = predicted),
    marg AS (
        SELECT CAST(COALESCE(SUM(r * c), 0) AS BIGINT) AS rc
        FROM (SELECT lang AS cls, SUM(n) AS r FROM cm GROUP BY 1) a
        JOIN (SELECT predicted AS cls, SUM(n) AS c FROM cm GROUP BY 1) b
        USING (cls))
    SELECT nn AS n_docs,
           ROUND(d * 1.0 / nn, 6) AS po,
           ROUND(rc * 1.0 / (nn * nn), 6) AS pe,
           ROUND((d * 1.0 / nn - rc * 1.0 / (nn * nn))
                 / (1 - rc * 1.0 / (nn * nn)), 6) AS kappa
    FROM tot CROSS JOIN diag CROSS JOIN marg
    """,
    tags=("stats", "ml-eval", "agreement", "kappa"),
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the stopword language classifier: observed
    agreement p_o (the confusion-matrix diagonal) corrected by the
    agreement p_e expected from the label/prediction marginals
    alone — κ = (p_o − p_e)/(1 − p_e). Reuses q_lang_id's confusion
    matrix directly (the composition contract, like
    q_classifier_metrics); accuracy alone over-credits a skewed
    corpus where guessing the majority language already "agrees"
    often — κ is what eval harnesses report instead.

    p_o, p_e, and κ are closed forms of three exact integers (N,
    the diagonal sum, Σ row_i·col_i over classes appearing on BOTH
    margins — classes on one margin only contribute 0 and drop out
    of the inner join) — bit-stable on both engines. Scale shape:
    everything past the reused classifier scan runs on the
    classes² confusion relation; the three 1-row aggregates meet in
    whitelisted scalar-subquery cross joins. O(classes²), not
    O(data), after one corpus pass.
    """
    from my_mapreduce_spark.queries.text_analysis import q_lang_id

    cm = q_lang_id(spark, sf_dir).withColumnRenamed("n_docs", "n")
    tot = cm.agg(F.sum("n").cast("long").alias("nn"))
    diag = (cm.where(F.col("lang") == F.col("predicted"))
            .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("d")))
    rows = cm.groupBy(F.col("lang").alias("cls")).agg(F.sum("n").alias("r"))
    cols = (cm.groupBy(F.col("predicted").alias("cls"))
            .agg(F.sum("n").alias("c")))
    marg = (rows.join(cols, "cls")
            .agg(F.coalesce(F.sum(F.col("r") * F.col("c")), F.lit(0))
                 .cast("long").alias("rc")))
    nn, d, rc = F.col("nn"), F.col("d"), F.col("rc")
    po = d * 1.0 / nn
    pe = rc * 1.0 / (nn * nn)
    return (tot.crossJoin(F.broadcast(diag)).crossJoin(F.broadcast(marg))
            .select(nn.alias("n_docs"),
                    F.round(po, 6).alias("po"),
                    F.round(pe, 6).alias("pe"),
                    F.round((po - pe) / (1 - pe), 6).alias("kappa")))


@register(
    "q_gini_concentration",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    r AS (
        SELECT cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey)
                    AS BIGINT) AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM rev),
    m AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS sx,
               CAST(SUM(i * cents) AS BIGINT) AS sixi,
               CAST(SUM(CASE WHEN i > n - n // 10 THEN cents END)
                    AS BIGINT) AS topx
        FROM r)
    SELECT n AS n_customers,
           ROUND(2.0 * CAST(sixi AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                 - (n + 1.0) / n, 6) AS gini,
           ROUND(CAST(topx AS DOUBLE) / CAST(sx AS DOUBLE), 6)
               AS top_decile_share
    FROM m
    """,
    tags=("stats", "concentration", "gini", "distributed-rank"),
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration census: the Gini coefficient and the
    top-decile share of per-customer lifetime revenue — the
    inequality summary (G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over
    ascending-sorted values; ties ordered by key contribute
    identically under any permutation, so the statistic is exact).
    The curation analogue: source/domain concentration of a corpus
    before fixing mixture weights.

    Revenue is exact integer CENTS (double → DECIMAL(18,2) → ×100
    → bigint, identical rounding on both engines), so every moment
    (Σx, Σi·x, top-decile Σx) is an exact bigint and both ratios
    are single deterministic double expressions — no float
    accumulation seam (Σi·x holds in bigint to ~10⁸ customers ×
    full TPC-H prices; beyond, DECIMAL(38,0), same plan). The
    global rank is functions/ranking.distributed_row_number (range
    partition + broadcast offsets — shuffle-parallel, no
    single-partition window); the decile cut is integer arithmetic
    on (rank, n) per row, n attached by the whitelisted 1-row
    broadcast. Cost at 100 TB: one groupBy, one range shuffle, one
    1-row aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = (orders.groupBy("o_custkey")
           .agg(F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100)
                      .cast("bigint")).cast("bigint").alias("cents")))
    ranked = distributed_row_number(
        rev, [F.col("cents"), F.col("o_custkey")], out="i", total_col="n")
    m = ranked.agg(
        F.max("n").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("sixi"),
        F.sum(F.when(F.col("i") > F.col("n") - F.expr("n DIV 10"),
                     F.col("cents"))).cast("long").alias("topx"))
    n, sx = F.col("n"), F.col("sx")
    return m.select(
        n.alias("n_customers"),
        F.round(F.lit(2.0) * F.col("sixi").cast("double")
                / (n.cast("double") * sx.cast("double"))
                - (n + F.lit(1.0)) / n, 6).alias("gini"),
        F.round(F.col("topx").cast("double") / sx.cast("double"), 6)
        .alias("top_decile_share"))


_PSI_ORACLE = f"""
    WITH ref AS (
        SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx,
               CAST(COUNT(*) AS BIGINT) AS n_ref
        FROM documents WHERE source = '{_PSI_REF}'),
    binned AS (
        SELECT source,
               CAST(LEAST({_PSI_BINS - 1},
                    ((LEAST(mx, GREATEST(mn, n_chars)) - mn)
                     * {_PSI_BINS}) // (mx - mn + 1)) AS BIGINT) AS bin
        FROM documents CROSS JOIN ref),
    c AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c
          FROM binned GROUP BY 1, 2),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
            FROM c GROUP BY 1),
    pbin AS (SELECT bin, c AS p_c FROM c WHERE source = '{_PSI_REF}'),
    grid AS (
        SELECT s.source, b.bin
        FROM (SELECT DISTINCT source FROM documents) s
        CROSS JOIN (SELECT CAST(UNNEST(range(0, {_PSI_BINS})) AS BIGINT)
                    AS bin) b)
    SELECT g.source, g.bin,
           COALESCE(p.p_c, 0) AS n_ref_bin,
           COALESCE(c.c, 0) AS n_src_bin,
           ROUND(((COALESCE(c.c, 0) + 0.5) / (t.n_src + 5.0)
                  - (COALESCE(p.p_c, 0) + 0.5) / (r.n_ref + 5.0))
                 * LN(((COALESCE(c.c, 0) + 0.5) / (t.n_src + 5.0))
                      / ((COALESCE(p.p_c, 0) + 0.5) / (r.n_ref + 5.0))),
                 6) AS psi_term
    FROM grid g
    LEFT JOIN c ON g.source = c.source AND g.bin = c.bin
    LEFT JOIN pbin p ON g.bin = p.bin
    JOIN tot t ON g.source = t.source
    CROSS JOIN ref r
    """


@register(
    "q_psi_drift",
    oracle=_PSI_ORACLE,
    tags=("stats", "drift", "psi", "pipeline"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's doc-length
    distribution against the ``src0`` reference, reported PER BIN
    (term = (q−p)·ln(q/p) over 10 equal-width bins anchored on the
    reference min/max, values clamped into range) — the standard
    binned drift monitor between corpus snapshots; per-bin terms
    name WHERE the distribution moved instead of burying it in one
    number (the q_chisq_independence bit-stability reasoning: a
    10-term float total has an accumulation order, the per-bin
    terms do not; PSI(source) = Σ its 10 rows). Proportions are
    Jeffreys-smoothed ((c+½)/(n+5)) so empty bins contribute finite
    terms deterministically.

    Bin ids are pure integer arithmetic of (n_chars, min, max) —
    identical on both engines, no float binning seam. Scale shape:
    TWO scans total (reference bounds, then the binning pass); the
    (source, bin) count relation — ≤ |sources| × 10 rows — is
    persisted (caller-released, caching.py) and every downstream
    relation (totals, reference bins, source grid, the reference
    total) derives from IT, never from a re-scan. The completion
    grid is a whitelisted tiny-broadcast cartesian; output is
    grid-sized at any corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    ref = (docs.where(F.col("source") == _PSI_REF)
           .agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx")))
    binned = (docs.crossJoin(F.broadcast(ref))
              .select("source",
                      F.least(F.lit(_PSI_BINS - 1),
                              F.expr(f"((LEAST(mx, GREATEST(mn, n_chars))"
                                     f" - mn) * {_PSI_BINS})"
                                     f" DIV (mx - mn + 1)"))
                      .cast("long").alias("bin")))
    c = (binned.groupBy("source", "bin")
         .agg(F.count(F.lit(1)).alias("c")).persist())
    return psi_terms_from_counts(spark, c)


def psi_terms_from_counts(spark: SparkSession, c: DataFrame) -> DataFrame:
    """Finish the PSI computation from a (source, bin, c) count
    relation: completion grid, reference bins, source totals, and
    the per-bin (q−p)·ln(q/p) terms. Every input derives from the
    count relation itself (the reference total is its src0 slice),
    so the caller decides HOW the counters were produced — one
    batch pass (q_psi_drift) or a streaming aggregation
    (streaming/jobs.q_streaming_psi_drift) — and the drift math is
    shared, which is what keeps the two surfaces provably equal."""
    tot = c.groupBy("source").agg(F.sum("c").cast("long").alias("n_src"))
    pbin = (c.where(F.col("source") == _PSI_REF)
            .select("bin", F.col("c").alias("p_c")))
    nref = (tot.where(F.col("source") == _PSI_REF)
            .select(F.col("n_src").alias("n_ref")))
    bins = (spark.range(0, _PSI_BINS)
            .select(F.col("id").cast("long").alias("bin")))
    grid = c.select("source").distinct().crossJoin(F.broadcast(bins))
    q = (F.coalesce(F.col("c"), F.lit(0)) + 0.5) / (F.col("n_src") + 5.0)
    p = (F.coalesce(F.col("p_c"), F.lit(0)) + 0.5) / (F.col("n_ref") + 5.0)
    return (grid
            .join(c, ["source", "bin"], "left")
            .join(F.broadcast(pbin), "bin", "left")
            .join(F.broadcast(tot), "source")
            .crossJoin(F.broadcast(nref))
            .select("source", "bin",
                    F.coalesce("p_c", F.lit(0)).alias("n_ref_bin"),
                    F.coalesce("c", F.lit(0)).alias("n_src_bin"),
                    F.round((q - p) * F.log(q / p), 6).alias("psi_term")))


@register(
    "q_shard_pack_cumsum",
    oracle=f"""
    WITH cs AS (
        SELECT doc_id, n_chars,
               CAST(SUM(n_chars) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM documents),
    s AS (SELECT doc_id, n_chars,
                 CAST((cum - n_chars) // {_SHARD_TARGET} AS BIGINT) AS shard
          FROM cs)
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM s GROUP BY shard
    """,
    tags=("pipeline", "sharding", "prefix-sum", "layout"),
)
def q_shard_pack_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budgeted training-shard assignment: documents in stable
    ``doc_id`` order are packed next-fit into 25000-char shards —
    shard = exclusive-prefix-sum(n_chars) DIV target — the planning
    step of a corpus export (shard files of near-equal bytes, doc
    order preserved, every shard a contiguous doc range: the
    per-shard [first_doc, last_doc] spans ARE the manifest).
    Complements q_pack_sequences (token packing WITHIN sequences);
    this is the file level above it.

    The global running sum comes from
    functions/ranking.distributed_prefix_sum — the same two-pass
    shape as distributed_row_number: range partition by doc_id,
    local running sums in parallel, per-partition TOTALS (≤
    shuffle-partition count) prefix-summed into broadcast base
    offsets. Spark's own ``sum() OVER (ORDER BY)`` with no
    partition would drag the corpus through one task (the
    explain_audit smell); the oracle states exactly that semantics,
    the plan never pays it. All integers — oracle-exact. Cost at
    100 TB: one range shuffle of (id, n_chars) + one hash agg.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cs = distributed_prefix_sum(
        docs, [F.col("doc_id")], F.col("n_chars"), out="cum")
    s = cs.select(
        "doc_id", "n_chars",
        F.expr(f"(cum - n_chars) DIV {_SHARD_TARGET}").alias("shard"))
    return (s.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


@register(
    "q_crosscorr_leadlag",
    oracle=f"""
    WITH c AS (
        SELECT epoch_us(ts) // {_HOUR_US} AS h,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'click' GROUP BY 1),
    p AS (
        SELECT epoch_us(ts) // {_HOUR_US} AS h,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
    l AS (SELECT CAST(UNNEST(range(-3, 4)) AS BIGINT) AS lag),
    j AS (SELECT l.lag, c.x, p.y
          FROM c CROSS JOIN l JOIN p ON p.h = c.h + l.lag),
    m AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM j GROUP BY 1)
    SELECT lag, n AS n_hours,
           ROUND((n * sxy - sx * sy) * 1.0
                 / SQRT((n * sxx - sx * sx) * 1.0
                        * (n * syy - sy * sy)), 6) AS xcorr
    FROM m
    """,
    tags=("stats", "timeseries", "cross-correlation", "lead-lag"),
)
def q_crosscorr_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the click and purchase
    hourly count series at lags −3..+3 hours (xcorr(L) = Pearson of
    click(t) against purchase(t+L) over hours present in both) —
    the which-signal-leads screen: a peak at L > 0 means clicks
    lead purchases by L hours. Extends q_hourly_autocorr (one
    series against itself) to a PAIR of series.

    Hours are epoch-microsecond integer division (the engine's
    pinned time idiom); per-lag moments are exact bigint sums of
    integer counts, the correlation one deterministic double
    expression — bit-stable. Scale shape: two filtered count
    aggregates collapse the stream to hour-bounded relations; the
    7-row lag literal is a whitelisted tiny broadcast; the shifted
    equi-join and final aggregate run on O(hours × 7) rows. Output
    is ≤ 7 rows at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    hc = (ev.where(F.col("event_type") == "click")
          .select(F.expr(f"unix_micros(ts) DIV {_HOUR_US}").alias("h"))
          .groupBy("h").agg(F.count(F.lit(1)).alias("x")))
    hp = (ev.where(F.col("event_type") == "purchase")
          .select(F.expr(f"unix_micros(ts) DIV {_HOUR_US}").alias("h"))
          .groupBy("h").agg(F.count(F.lit(1)).alias("y")))
    lags = spark.range(-3, 4).select(F.col("id").alias("lag"))
    j = (hc.crossJoin(F.broadcast(lags))
         .join(hp, hp.h == hc.h + F.col("lag"))
         .select("lag", "x", "y"))
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "lag", n.alias("n_hours"),
        F.round((n * sxy - sx * sy) * 1.0
                / F.sqrt((n * sxx - sx * sx) * 1.0
                         * (n * syy - sy * sy)), 6).alias("xcorr"))


_PERM_R = 32                 # permutation replicas
_PERM_SCALE = 1000           # integer scaling (the q_ab_test_welch knob)

# per-replica SUM pairs for the oracle, generated once (the
# q_poisson_bootstrap_ci wide-aggregate idiom)
_PERM_SUMS_SQL = ",\n           ".join(
    f"CAST(SUM(((h >> {r}) % 2) * y) AS BIGINT) AS s1_{r}, "
    f"CAST(SUM((h >> {r}) % 2) AS BIGINT) AS n1_{r}"
    for r in range(_PERM_R))
_PERM_DIFF_SQL = "\n             + ".join(
    f"(CASE WHEN ABS(s1_{r} * 1.0 / n1_{r}"
    f" - (s - s1_{r}) * 1.0 / (n - n1_{r}))"
    f" >= ABS(sa * 1.0 / na - sb * 1.0 / nb)"
    f" THEN 1 ELSE 0 END)"
    for r in range(_PERM_R))


@register(
    "q_permutation_test",
    oracle=f"""
    WITH e AS (
        SELECT event_type,
               CAST(FLOOR(value * {_PERM_SCALE}) AS BIGINT) AS y,
               CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) AS h
        FROM events
        WHERE event_type IN ('click', 'purchase')
          AND NOT isnan(value) AND NOT isinf(value)),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN event_type = 'click' THEN y END)
                    AS BIGINT) AS sa,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN y END)
                    AS BIGINT) AS sb,
           {_PERM_SUMS_SQL}
        FROM e),
    x AS (
        SELECT n, na, nb,
               sa * 1.0 / na - sb * 1.0 / nb AS obs,
               {_PERM_DIFF_SQL} AS n_extreme
        FROM m)
    SELECT n AS n_events,
           ROUND(obs / {_PERM_SCALE}, 6) AS obs_diff,
           CAST({_PERM_R} AS BIGINT) AS n_perms,
           CAST(n_extreme AS BIGINT) AS n_extreme,
           ROUND((1 + n_extreme) * 1.0 / (1 + {_PERM_R}), 6) AS p_value
    FROM x
    """,
    tags=("stats", "permutation-test", "ab-test", "significance"),
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-relabeling permutation test for the click-vs-purchase
    mean difference: 32 deterministic pseudo-relabelings (bit r of
    a per-event md5-derived 32-bit value assigns the event to a
    pseudo-group) each recompute the group mean difference on the
    POOLED values; the p-value is the add-one fraction of replicas
    at least as extreme as the observed difference — the
    distribution-free significance check beside q_ab_test_welch
    (which assumes approximate normality; the permutation test does
    not). Bernoulli relabeling (not fixed-size resampling) keeps it
    one-pass and stateless — the same design trade as
    q_poisson_bootstrap_ci's Poissonized draws.

    Values are integer-scaled (the welch knob), every replica's
    sums are exact bigints in ONE 70-column aggregate with map-side
    partials (no explode, no join, no second scan), and each
    replica mean/compare is a deterministic double closed form —
    bit-stable across engines and cluster layouts. Scale shape: one
    scan, one 1-row aggregate; replica count widens COLUMNS, never
    rows. The md5 bit family is the engine's pinned randomness
    idiom (q_weighted_sample, q_hash_sample_join).
    """
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("event_type").isin("click", "purchase")
                 & ~F.isnan("value")
                 & (F.abs("value") != float("inf")))
          .select("event_type",
                  F.floor(F.col("value") * _PERM_SCALE).alias("y"),
                  F.expr("CAST(conv(substring(md5(CAST(event_id AS STRING)),"
                         " 1, 8), 16, 10) AS BIGINT)").alias("h")))
    bit = [F.expr(f"shiftright(h, {r}) % 2") for r in range(_PERM_R)]
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("s"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .alias("na"),
            F.sum(F.when(F.col("event_type") == "click", F.col("y")))
            .alias("sa"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("nb"),
            F.sum(F.when(F.col("event_type") == "purchase", F.col("y")))
            .alias("sb")]
    for r in range(_PERM_R):
        aggs.append(F.sum(bit[r] * F.col("y")).cast("long")
                    .alias(f"s1_{r}"))
        aggs.append(F.sum(bit[r]).cast("long").alias(f"n1_{r}"))
    m = ev.agg(*aggs)
    obs = F.col("sa") * 1.0 / F.col("na") - F.col("sb") * 1.0 / F.col("nb")
    extreme = None
    for r in range(_PERM_R):
        d = (F.col(f"s1_{r}") * 1.0 / F.col(f"n1_{r}")
             - (F.col("s") - F.col(f"s1_{r}")) * 1.0
             / (F.col("n") - F.col(f"n1_{r}")))
        term = F.when(F.abs(d) >= F.abs(obs), 1).otherwise(0)
        extreme = term if extreme is None else extreme + term
    x = m.select("n", obs.alias("obs"), extreme.alias("n_extreme"))
    return x.select(
        F.col("n").alias("n_events"),
        F.round(F.col("obs") / _PERM_SCALE, 6).alias("obs_diff"),
        F.lit(_PERM_R).cast("bigint").alias("n_perms"),
        F.col("n_extreme").cast("bigint").alias("n_extreme"),
        F.round((1 + F.col("n_extreme")) * 1.0 / (1 + _PERM_R), 6)
        .alias("p_value"))


@register(
    "q_diversity_indices",
    oracle="""
    WITH c AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2),
    t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS n_sources
          FROM c GROUP BY lang)
    SELECT c.lang, t.n_sources, t.tot AS n_docs,
           ROUND(-SUM((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 6)
               AS shannon_h,
           ROUND(exp(-SUM((c.n * 1.0 / t.tot)
                          * ln(c.n * 1.0 / t.tot))), 4)
               AS effective_sources,
           ROUND(1.0 - SUM(c.n * (c.n - 1.0))
                       / (t.tot * (t.tot - 1.0)), 6) AS simpson_d
    FROM c JOIN t USING (lang)
    GROUP BY c.lang, t.n_sources, t.tot
    """,
    tags=("stats", "diversity", "entropy", "mixture"),
)
def q_diversity_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-diversity panel per language: Shannon entropy of the
    source mix, its exponential (the EFFECTIVE number of sources —
    "this language really draws from ~N sources", the number mix
    designers reason in), and the unbiased Simpson index (the
    probability two random docs of the language come from DIFFERENT
    sources, computed with the n*(n-1) finite-population form, not
    the plug-in p² estimate). A language whose effective-source
    count collapses toward 1 is single-source — fragile to that
    source's biases and a deduplication red flag — even when the
    nominal source count looks healthy.

    Plan: one scan -> (lang, source) hash-agg (grid-bounded), one
    per-lang rollup, one finishing aggregate over the same grid.
    The entropy sum is a float reduction over a SOURCE-bounded set
    (~20 terms), rounded at 6dp — the q_source_kl_divergence
    summation contract. At 100 TB everything after the first
    aggregate is grid-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("lang").agg(F.sum("n").alias("tot"),
                              F.count(F.lit(1)).alias("n_sources"))
    p = F.col("n") * 1.0 / F.col("tot")
    h = -F.sum(p * F.log(p))
    return (c.join(F.broadcast(t), "lang")
            .groupBy("lang", "n_sources", F.col("tot").alias("n_docs"))
            .agg(F.round(h, 6).alias("shannon_h"),
                 F.round(F.exp(h), 4).alias("effective_sources"),
                 F.round(1.0 - F.sum(F.col("n") * (F.col("n") - 1.0))
                         / (F.col("n_docs") * (F.col("n_docs") - 1.0)), 6)
                 .alias("simpson_d")))


_TRIM_FRAC = 0.1   # drop the lowest and highest 10% before averaging


@register(
    "q_trimmed_mean_udaf",
    oracle=f"""
    WITH r AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents)
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           ROUND(AVG(CASE WHEN rn > CAST(floor(n * {_TRIM_FRAC}) AS BIGINT)
                           AND rn <= n - CAST(floor(n * {_TRIM_FRAC}) AS BIGINT)
                          THEN n_chars END), 6) AS trimmed_mean_chars
    FROM r GROUP BY source
    """,
    tags=("stats", "udaf", "pandas-udf", "robust"),
)
def q_trimmed_mean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 10%-trimmed mean of document length via a
    GROUPED_AGG pandas UDAF — the one Arrow UDF surface the library
    had not yet pinned (scalar pandas_udf: q_byte_entropy_vectorized;
    grouped map: cogroup/applyInPandas; iterator: mapInPandas/
    mapInArrow). A trimmed mean is a genuine UDAF case: it needs the
    group's ORDER STATISTICS, which no single built-in aggregate
    composes.

    Trim boundaries land on ties arbitrarily but the averaged
    multiset is tie-invariant (only identical VALUES straddle a
    cut), so the result is deterministic and the SQL window oracle
    states the same statistic exactly.

    Scale note: a grouped-agg UDAF buffers ONE GROUP per Arrow
    batch — fine for source-sized groups (bounded by corpus/source
    count); for groups of unbounded size the two-pass distributed
    rank (q_exact_median_twopass) is the right shape instead, and
    the docstring contrast is the point of registering both.
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType given explicitly: the module uses postponed
    # annotation evaluation, so type-hint inference can't see pd.Series
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(v):
        s = v.sort_values().to_numpy()
        k = int(len(s) * _TRIM_FRAC)
        return float(s[k:len(s) - k].mean())

    docs = load_table(spark, sf_dir, "documents")
    # GROUPED_AGG pandas UDFs cannot share an .agg with JVM
    # aggregates — two group-bys on the same key, joined (both
    # source-cardinality relations, the second broadcast)
    tm = (docs.groupBy("source")
          .agg(F.round(trimmed_mean("n_chars"), 6)
               .alias("trimmed_mean_chars")))
    n = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (tm.join(F.broadcast(n), "source")
            .select("source", "n_docs", "trimmed_mean_chars"))


_HUB_W = 1000      # Huber weights in milli-units


@register(
    "q_huber_mean",
    oracle=f"""
    WITH x AS (
        SELECT event_type,
               2 * CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events),
    med AS (
        SELECT event_type, CAST(quantile_cont(x, 0.5) AS BIGINT) AS m
        FROM x GROUP BY event_type),
    r1 AS (
        SELECT x.event_type, x.x, ABS(x.x - med.m) AS r
        FROM x JOIN med USING (event_type)),
    scale AS (
        SELECT event_type,
               GREATEST(CAST(2 * quantile_cont(r, 0.5) AS BIGINT), 1) AS k
        FROM r1 GROUP BY event_type),
    w1 AS (
        SELECT r1.event_type, r1.x,
               LEAST({_HUB_W}, (scale.k * {_HUB_W})
                     // GREATEST(r1.r, 1)) AS w, scale.k
        FROM r1 JOIN scale USING (event_type)),
    m1 AS (
        SELECT event_type, k,
               (2 * SUM(w * x) + SUM(w)) // (2 * SUM(w)) AS m1i
        FROM w1 GROUP BY event_type, k),
    w2 AS (
        SELECT x.event_type, x.x, m1.k,
               LEAST({_HUB_W}, (m1.k * {_HUB_W})
                     // GREATEST(ABS(x.x - m1.m1i), 1)) AS w
        FROM x JOIN m1 USING (event_type)),
    fin AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN w < {_HUB_W} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_downweighted,
               ((2 * SUM(x) * 1000000 + COUNT(*) * 200)
                // (2 * COUNT(*) * 200)) / 1e6 AS mean_value,
               ((2 * SUM(w * x) * 1000000 + SUM(w) * 200)
                // (2 * SUM(w) * 200)) / 1e6 AS huber_mean
        FROM w2 GROUP BY event_type)
    SELECT * FROM fin
    """,
    tags=("stats", "robust", "irls", "events"),
)
def q_huber_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber-weighted robust mean per event type via TWO unrolled
    IRLS iterations in PURE BIGINT arithmetic — the robust-location
    sibling of q_mad_outliers/q_winsorize_stats, engineered for the
    cross-engine exactness the sf0.1 sweep demands of every float:
    values live as doubled cents (doubling makes every interpolated
    median an exact integer), the Huber weight min(1, k/|r|) is
    integer milli-units, the re-estimated location is an integer
    half-up rational, and the final means divide exact bigints once.
    k = 2*MAD (~1.48σ-consistent scale, same spirit as the 1.345σ
    textbook constant).

    Plan: two grouped exact-percentile passes (scalar per group,
    broadcast back), two weighted-moment hash aggs — all map-side
    partial, grid-sized intermediates, no window. Bigint headroom:
    w*x*2e6 ~ 2e18 at sf0.1-scale groups; beyond ~1e6-row groups per
    type, drop the 1e6 rounding factor into a final double divide
    (documented, not needed at any tested SF).
    """
    ev = load_table(spark, sf_dir, "events")
    x = ev.select("event_type",
                  (F.round(F.col("value") * 100).cast("bigint") * 2)
                  .alias("x"))
    med = x.groupBy("event_type").agg(
        F.percentile("x", F.lit(0.5)).cast("bigint").alias("m"))
    r1 = x.join(F.broadcast(med), "event_type") \
        .withColumn("r", F.abs(F.col("x") - F.col("m")))
    # double INSIDE the cast: the r-median can be a half-integer
    # (odd residual tie), and double->bigint casts disagree across
    # engines on .5 (Spark truncates, DuckDB rounds); 2*median is
    # always an exact integer, so the cast is seam-free on both.
    scale = r1.groupBy("event_type").agg(
        F.greatest((F.percentile("r", F.lit(0.5)) * 2).cast("bigint"),
                   F.lit(1)).alias("k"))
    w1 = (r1.join(F.broadcast(scale), "event_type")
          .withColumn("w", F.least(F.lit(_HUB_W),
                                   F.expr(f"(k * {_HUB_W}) "
                                          "DIV GREATEST(r, 1)"))))
    m1 = w1.groupBy("event_type", "k").agg(
        F.expr("(2 * SUM(w * x) + SUM(w)) DIV (2 * SUM(w))").alias("m1i"))
    w2 = (x.join(F.broadcast(m1), "event_type")
          .withColumn("w", F.least(
              F.lit(_HUB_W),
              F.expr(f"(k * {_HUB_W}) "
                     "DIV GREATEST(ABS(x - m1i), 1)"))))
    return w2.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("w") < _HUB_W, 1).otherwise(0))
        .cast("bigint").alias("n_downweighted"),
        (F.expr("(2 * SUM(x) * 1000000 + COUNT(1) * 200) "
                "DIV (2 * COUNT(1) * 200)") / 1e6).alias("mean_value"),
        (F.expr("(2 * SUM(w * x) * 1000000 + SUM(w) * 200) "
                "DIV (2 * SUM(w) * 200)") / 1e6).alias("huber_mean"))
