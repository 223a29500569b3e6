"""Experimentation platform tier — the eighth round-4 batch
(SURVEY §2D statistics/eval depth): the computations every
A/B-test readout pipeline runs before anyone trusts a metric.

- ``q_srm_check``: sample-ratio-mismatch guardrail — the chi-square
  test that the deterministic 50/50 hash split actually produced a
  50/50 user split (a failed SRM check invalidates the experiment
  before any metric is read).
- ``q_cuped_adjustment``: CUPED variance reduction (Deng et al.,
  WSDM 2013) — per-arm post-period means adjusted by the pre-period
  covariate, with theta and the variance-reduction factor derived
  from one pass of exact integer moments.
- ``q_isotonic_calibration``: isotonic (PAV) recalibration of the
  nearest-neighbor classifier's reliability table — the exact
  max-of-prefix-min-of-suffix closed form over the bounded bin
  relation, the monotone fit that turns q_calibration_ece's
  diagnosis into a correction.
- ``q_diff_in_diff``: the parallel-trends causal estimator —
  (treated post-pre change) minus (control post-pre change), four
  exact group means and one closed form.
- ``q_conformal_interval``: split-conformal prediction intervals
  with their distribution-free coverage audit, all order
  statistics exact via (group, value) count relations.

Exactness discipline (the q_ab_test_welch contract): every sum is a
bigint of integer-scaled values (floor(value*1000) per EVENT, never
a float sum), so moments are bit-stable across cluster layouts and
engines; floats appear only in final closed-form expressions, which
IEEE evaluates identically on both sides.

Scale shape (100 TB): SRM and CUPED are one scan + O(users)
hash-agg + O(arms) finishing — the moment-not-sample pattern that
lets experimentation platforms read a 100 TB exposure log in one
pass. Isotonic runs entirely on the ≤10-row reliability table (the
expensive all-pairs top-1 underneath rides the tiled block scorer
already audited in q_calibration_ece); its O(bins³) pair join is
broadcast nested-loop over a conf-bounded relation, never data.
Reference parity: none — north-star §2D experimentation depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_SCALE = 1000                    # value -> floor(value*1000), exact bigints
_CUPED_SPLIT = "2024-01-16"      # pre-period < split <= post-period
_SRM_CHISQ_CRIT = 9.0            # |z| > 3 <=> chi-square(1) > 9


def _arm(col: Column) -> Column:
    """Deterministic 50/50 arm assignment: parity of the first 8 md5
    hex digits of the user id — the same engine-portable md5 idiom
    as q_dataset_mixture (Spark hash()/xxhash64 have no DuckDB twin;
    md5 does)."""
    return F.when(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % 2 == 0, F.lit("A")).otherwise(F.lit("B"))


_ARM_SQL = ("CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), "
            "1, 8)) AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END")


@register(
    "q_srm_check",
    oracle=f"""
    WITH u AS (
        SELECT DISTINCT user_id, {_ARM_SQL} AS arm FROM events),
    c AS (
        SELECT
            CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM u)
    SELECT n_a, n_b,
           ROUND(POW(n_a - n_b, 2) * 1.0 / (n_a + n_b), 6) AS chisq,
           POW(n_a - n_b, 2) * 1.0 / (n_a + n_b) > {_SRM_CHISQ_CRIT}
               AS srm_flag
    FROM c
    """,
    tags=("stats", "ab-test", "experiment", "srm"),
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: the md5-parity split targets
    50/50, and the chi-square statistic against that target reduces
    to the closed form (n_a - n_b)^2 / (n_a + n_b) — exact integers
    until the final division. ``srm_flag`` fires at chi-square > 9
    (|z| > 3), the standard "halt the experiment" threshold: an SRM
    means the assignment or logging pipeline is biased, and every
    downstream metric comparison is invalid.

    Plan: distinct users (one hash-agg with map-side partials), then
    a 2-value conditional count — one scan, O(1) finishing. The
    assignment hash is recomputed from user_id, not stored, so the
    check audits the ACTUAL assignment function, not a logged copy.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(_arm(F.col("user_id"))
                                               .alias("arm"))
    c = u.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"))
    chisq = (F.pow(F.col("n_a") - F.col("n_b"), 2)
             / (F.col("n_a") + F.col("n_b")))
    return c.select(
        "n_a", "n_b",
        F.round(chisq, 6).alias("chisq"),
        (chisq > _SRM_CHISQ_CRIT).alias("srm_flag"))


@register(
    "q_cuped_adjustment",
    oracle=f"""
    WITH e AS (
        SELECT user_id, ts,
               CAST(FLOOR(value * {_SCALE}) AS BIGINT) AS y
        FROM events WHERE isfinite(value)),
    u AS (
        SELECT user_id, {_ARM_SQL} AS arm,
               CAST(SUM(CASE WHEN ts <  TIMESTAMP '{_CUPED_SPLIT}'
                             THEN y ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                             THEN y ELSE 0 END) AS BIGINT) AS yv
        FROM e GROUP BY user_id),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * yv) AS BIGINT) AS sxy,
               CAST(SUM(yv * yv) AS BIGINT) AS syy
        FROM u),
    t AS (
        SELECT n, sx * 1.0 / n AS mx,
               (n * 1.0 * sxy - sx * 1.0 * sy)
                   / (n * 1.0 * sxx - sx * 1.0 * sx) AS theta,
               POW(n * 1.0 * sxy - sx * 1.0 * sy, 2)
                   / ((n * 1.0 * sxx - sx * 1.0 * sx)
                      * (n * 1.0 * syy - sy * 1.0 * sy)) AS var_red
        FROM g),
    a AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               SUM(x) * 1.0 / COUNT(*) AS mxa,
               SUM(yv) * 1.0 / COUNT(*) AS mya
        FROM u GROUP BY arm)
    SELECT a.arm, a.n_users,
           ROUND(a.mya / {_SCALE}, 6) AS mean_raw,
           ROUND((a.mya - t.theta * (a.mxa - t.mx)) / {_SCALE}, 6)
               AS mean_cuped,
           ROUND(t.theta, 6) AS theta,
           ROUND(t.var_red, 6) AS var_reduction
    FROM a CROSS JOIN t
    """,
    tags=("stats", "ab-test", "experiment", "cuped", "variance-reduction"),
)
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): each user's
    post-period metric y is adjusted by their PRE-period covariate x
    — y_adj = y - theta*(x - mean(x)) with theta = cov(x,y)/var(x)
    pooled across arms — shrinking metric variance by rho² without
    biasing the treatment contrast (theta is arm-blind, and
    E[x|arm] is equal by randomization). ``var_reduction`` reports
    that rho²: the fraction of metric variance the pre-period
    explains, i.e. how much longer the un-CUPED experiment would
    have had to run.

    Exactness: x and y are per-user bigint sums of per-EVENT
    integer-scaled values (never a float sum), so n/Sx/Sy/Sxx/Sxy/
    Syy are exact; theta, rho², and the adjusted means are final
    closed forms evaluated identically by both engines. Non-finite
    values drop at ingestion (dirty-tier hygiene).

    Plan: one events scan -> per-user conditional-sum hash-agg
    (map-side partials) -> one 6-number global aggregate and one
    2-row per-arm aggregate, joined by a 1-row broadcast cross join
    (the scalar-subquery shape). O(users) shuffle, O(1) finishing —
    at 100 TB this is exactly one pass over the exposure log.
    """
    ev = (load_table(spark, sf_dir, "events")
          .where(~F.isnan("value") & (F.abs("value") != float("inf")))
          .select("user_id", "ts",
                  F.floor(F.col("value") * _SCALE).alias("y")))
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = (ev.groupBy("user_id")
         .agg(F.sum(F.when(F.col("ts") < split, F.col("y")).otherwise(0))
              .alias("x"),
              F.sum(F.when(F.col("ts") >= split, F.col("y")).otherwise(0))
              .alias("yv"))
         .select(_arm(F.col("user_id")).alias("arm"), "x", "yv"))
    g = u.agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("yv").alias("sy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("x") * F.col("yv")).alias("sxy"),
              F.sum(F.col("yv") * F.col("yv")).alias("syy"))
    cxy = (F.col("n") * 1.0 * F.col("sxy") - F.col("sx") * 1.0 * F.col("sy"))
    vx = (F.col("n") * 1.0 * F.col("sxx") - F.col("sx") * 1.0 * F.col("sx"))
    vy = (F.col("n") * 1.0 * F.col("syy") - F.col("sy") * 1.0 * F.col("sy"))
    t = g.select((F.col("sx") / F.col("n")).alias("mx"),
                 (cxy / vx).alias("theta"),
                 (F.pow(cxy, 2) / (vx * vy)).alias("var_red"))
    a = (u.groupBy("arm")
         .agg(F.count(F.lit(1)).alias("n_users"),
              (F.sum("x") / F.count(F.lit(1))).alias("mxa"),
              (F.sum("yv") / F.count(F.lit(1))).alias("mya")))
    return (a.crossJoin(F.broadcast(t))
            .select("arm", "n_users",
                    F.round(F.col("mya") / _SCALE, 6).alias("mean_raw"),
                    F.round((F.col("mya")
                             - F.col("theta") * (F.col("mxa") - F.col("mx")))
                            / _SCALE, 6).alias("mean_cuped"),
                    F.round("theta", 6).alias("theta"),
                    F.round("var_red", 6).alias("var_reduction")))


@register(
    "q_isotonic_calibration",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, label, v,
                 sqrt(list_dot_product(v, v)) AS nrm FROM e),
    top1 AS (
        SELECT q.vec_id, q.label AS qlabel, c.label AS plabel,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)
                   AS conf,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_dot_product(q.v, c.v)
                                  / (q.nrm * c.nrm), 6)
                            DESC, c.vec_id) AS rnk
        FROM n q JOIN n c ON q.vec_id <> c.vec_id),
    scored AS (
        SELECT LEAST(CAST(FLOOR(GREATEST(conf, 0.0) * 10)
                          AS BIGINT), 9) AS bin,
               conf,
               CASE WHEN plabel = qlabel THEN 1 ELSE 0 END AS correct
        FROM top1 WHERE rnk = 1),
    b AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(correct) AS BIGINT) AS correct
        FROM scored GROUP BY bin),
    pairs AS (
        SELECT j.bin AS jb, k.bin AS kb,
               CAST(SUM(m.correct) AS BIGINT) AS w_correct,
               CAST(SUM(m.n) AS BIGINT) AS w_n
        FROM b j JOIN b k ON j.bin <= k.bin
                 JOIN b m ON m.bin BETWEEN j.bin AND k.bin
        GROUP BY 1, 2),
    inner_min AS (
        SELECT p.jb, i.bin,
               MIN(p.w_correct * 1.0 / p.w_n) AS min_wm
        FROM pairs p JOIN b i ON p.jb <= i.bin AND p.kb >= i.bin
        GROUP BY 1, 2),
    iso AS (
        SELECT bin, MAX(min_wm) AS iso_acc FROM inner_min GROUP BY bin)
    SELECT b.bin, b.n,
           ROUND(b.correct * 1.0 / b.n, 6) AS accuracy,
           ROUND(iso.iso_acc, 6) AS iso_accuracy
    FROM b JOIN iso USING (bin)
    """,
    tags=("stats", "calibration", "isotonic", "eval", "knn"),
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) recalibration of the nearest-neighbor label
    classifier: fit the best monotone-nondecreasing accuracy curve
    over q_calibration_ece's confidence bins — the standard
    post-hoc calibrator (Zadrozny & Elkan 2002) whose output is the
    lookup table a serving system applies to raw cosine
    confidences. The pool-adjacent-violators solution has the exact
    minimax closed form iso(i) = max_{j<=i} min_{k>=i}
    weightedMean(accuracy over bins j..k), which on a BOUNDED bin
    relation is three small joins — no iteration, no float
    accumulation (weighted means are ratios of exact bigint counts,
    rounded once at output).

    Plan: the expensive part (all-pairs top-1) is q_calibration_ece's
    already-audited tiled numpy block scorer, reused as a
    subroutine; everything after runs on a <=10-row relation, so the
    O(bins³) pair enumeration is broadcast nested-loop over a
    conf-bounded input — the documented-bounded NLJ shape, never
    data-sized. At 100 TB the bin table is STILL 10 rows; only the
    scorer underneath scales (and swaps for the IVF shortlist as in
    q_retrieval_recall_mrr).
    """
    from my_mapreduce_spark.queries.retrieval import q_calibration_ece

    ece = q_calibration_ece(spark, sf_dir)
    # Recover the exact integer correct-count from the 6dp-rounded
    # accuracy: n < 10^5 per bin keeps n*accuracy within 0.05 of the
    # integer, so round() is exact recovery. (At production scale
    # the reliability table would carry the bigint directly.)
    # cache: the bin relation is referenced four times below; without
    # it each alias re-executes the tiled all-pairs scorer upstream
    # (caller releases, caching.py contract)
    b = ece.select("bin", "n",
                   F.round(F.col("accuracy") * F.col("n"))
                   .cast("bigint").alias("correct")).cache()
    j, k, m, i = b.alias("j"), b.alias("k"), b.alias("m"), b.alias("i")
    pairs = (j.join(F.broadcast(k), F.col("j.bin") <= F.col("k.bin"))
             .join(F.broadcast(m), (F.col("m.bin") >= F.col("j.bin"))
                   & (F.col("m.bin") <= F.col("k.bin")))
             .groupBy(F.col("j.bin").alias("jb"), F.col("k.bin").alias("kb"))
             .agg(F.sum("m.correct").alias("w_correct"),
                  F.sum("m.n").alias("w_n")))
    inner_min = (pairs.join(F.broadcast(i), (F.col("jb") <= F.col("i.bin"))
                            & (F.col("kb") >= F.col("i.bin")))
                 .groupBy("jb", F.col("i.bin").alias("bin"))
                 .agg(F.min(F.col("w_correct") / F.col("w_n"))
                      .alias("min_wm")))
    iso = (inner_min.groupBy("bin").agg(F.max("min_wm").alias("iso_acc")))
    return (b.join(F.broadcast(iso), "bin")
            .select("bin", "n",
                    F.round(F.col("correct") / F.col("n"), 6)
                    .alias("accuracy"),
                    F.round("iso_acc", 6).alias("iso_accuracy")))


@register(
    "q_diff_in_diff",
    oracle=f"""
    WITH e AS (
        SELECT user_id, ts,
               CAST(FLOOR(value * {_SCALE}) AS BIGINT) AS y
        FROM events WHERE isfinite(value)),
    u AS (
        SELECT user_id, {_ARM_SQL} AS arm,
               CAST(SUM(CASE WHEN ts <  TIMESTAMP '{_CUPED_SPLIT}'
                             THEN y ELSE 0 END) AS BIGINT) AS pre,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                             THEN y ELSE 0 END) AS BIGINT) AS post
        FROM e GROUP BY user_id),
    a AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               SUM(pre) * 1.0 / COUNT(*) AS m_pre,
               SUM(post) * 1.0 / COUNT(*) AS m_post
        FROM u GROUP BY arm)
    SELECT ta.n_users AS n_treat, ca.n_users AS n_ctrl,
           ROUND(ta.m_pre / {_SCALE}, 6) AS treat_pre,
           ROUND(ta.m_post / {_SCALE}, 6) AS treat_post,
           ROUND(ca.m_pre / {_SCALE}, 6) AS ctrl_pre,
           ROUND(ca.m_post / {_SCALE}, 6) AS ctrl_post,
           ROUND(((ta.m_post - ta.m_pre) - (ca.m_post - ca.m_pre))
                 / {_SCALE}, 6) AS did
    FROM a ta JOIN a ca ON ta.arm = 'B' AND ca.arm = 'A'
    """,
    tags=("stats", "causal", "diff-in-diff", "experiment"),
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: treatment effect as (treated
    post - pre change) minus (control post - pre change) — the
    parallel-trends estimator that nets out both time trends
    (everyone's engagement drifts) and baseline group differences
    (the arms never start equal), the workhorse causal readout
    when a feature ships to one hash bucket first. Arms and the
    pre/post boundary reuse the q_cuped_adjustment contract (md5
    parity, Jan-16 split); per-user per-period sums are exact
    bigints of per-event integer-scaled values, the four group
    means and the DiD are one final closed form.

    Plan: one scan -> per-user 2-conditional-sum hash-agg -> 2-row
    per-arm aggregate -> 1x1 self-join. O(users) shuffle, O(1)
    finishing — the one-pass-over-the-exposure-log posture of the
    rest of the experimentation tier.
    """
    ev = (load_table(spark, sf_dir, "events")
          .where(~F.isnan("value") & (F.abs("value") != float("inf")))
          .select("user_id", "ts",
                  F.floor(F.col("value") * _SCALE).alias("y")))
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    u = (ev.groupBy("user_id")
         .agg(F.sum(F.when(F.col("ts") < split, F.col("y")).otherwise(0))
              .alias("pre"),
              F.sum(F.when(F.col("ts") >= split, F.col("y")).otherwise(0))
              .alias("post"))
         .select(_arm(F.col("user_id")).alias("arm"), "pre", "post"))
    a = (u.groupBy("arm")
         .agg(F.count(F.lit(1)).alias("n_users"),
              (F.sum("pre") / F.count(F.lit(1))).alias("m_pre"),
              (F.sum("post") / F.count(F.lit(1))).alias("m_post")))
    t = a.where(F.col("arm") == "B").alias("ta")
    c = a.where(F.col("arm") == "A").alias("ca")
    did = ((F.col("ta.m_post") - F.col("ta.m_pre"))
           - (F.col("ca.m_post") - F.col("ca.m_pre")))
    return (t.crossJoin(F.broadcast(c))
            .select(F.col("ta.n_users").alias("n_treat"),
                    F.col("ca.n_users").alias("n_ctrl"),
                    F.round(F.col("ta.m_pre") / _SCALE, 6)
                    .alias("treat_pre"),
                    F.round(F.col("ta.m_post") / _SCALE, 6)
                    .alias("treat_post"),
                    F.round(F.col("ca.m_pre") / _SCALE, 6)
                    .alias("ctrl_pre"),
                    F.round(F.col("ca.m_post") / _SCALE, 6)
                    .alias("ctrl_post"),
                    F.round(did / _SCALE, 6).alias("did")))


_CONF_ALPHA_NUM = 9   # 1 - alpha = 9/10: 90% target coverage
_CONF_U = ("(CAST(('0x' || substr(md5('cf|' || CAST(doc_id AS VARCHAR)), "
           "1, 8)) AS BIGINT) % 2)")


@register(
    "q_conformal_interval",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS x,
               {_CONF_U} AS grp
        FROM documents),
    calv AS (
        SELECT lang, x, CAST(COUNT(*) AS BIGINT) AS c
        FROM d WHERE grp = 0 GROUP BY 1, 2),
    caln AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_cal
             FROM calv GROUP BY lang),
    med AS (
        SELECT lang, MIN(x) AS med FROM (
            SELECT calv.lang, calv.x,
                   SUM(c) OVER (PARTITION BY calv.lang ORDER BY calv.x)
                       AS cum,
                   caln.n_cal
            FROM calv JOIN caln USING (lang))
        WHERE cum >= (n_cal + 1) // 2 GROUP BY lang),
    sc AS (
        SELECT d.lang, ABS(d.x - med.med) AS s, CAST(COUNT(*) AS BIGINT)
                   AS c
        FROM d JOIN med USING (lang) WHERE grp = 0 GROUP BY 1, 2),
    qhat AS (
        SELECT lang, MIN(s) AS qhat FROM (
            SELECT sc.lang, sc.s,
                   SUM(c) OVER (PARTITION BY sc.lang ORDER BY sc.s)
                       AS cum,
                   caln.n_cal
            FROM sc JOIN caln USING (lang))
        WHERE cum >= LEAST(({_CONF_ALPHA_NUM} * (n_cal + 1) + 9) // 10,
                           n_cal)
        GROUP BY lang),
    test AS (
        SELECT d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN ABS(d.x - med.med) <= qhat.qhat
                             THEN 1 ELSE 0 END) AS BIGINT) AS covered
        FROM d JOIN med USING (lang) JOIN qhat USING (lang)
        WHERE grp = 1 GROUP BY d.lang)
    SELECT test.lang, caln.n_cal, test.n_test, med.med, qhat.qhat,
           ROUND(covered * 1.0 / n_test, 6) AS coverage
    FROM test JOIN caln USING (lang) JOIN med USING (lang)
              JOIN qhat USING (lang)
    """,
    tags=("stats", "conformal", "uncertainty", "ml-eval"),
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; Lei et al. 2018)
    for doc length by language: an md5-halved calibration split
    fits the per-lang median, takes the ceil((n+1)*0.9)-th smallest
    absolute residual as the conformal quantile q_hat, and the held
    -out half then verifies the distribution-free guarantee —
    coverage of [med ± q_hat] should be >= 90% regardless of the
    length distribution's shape. This is the uncertainty
    quantification a production scorer ships WITH its predictions,
    and the coverage column is its audit.

    Exactness: medians and conformal quantiles are ORDER STATISTICS
    computed from (lang, value) count relations — rank thresholds
    are exact integer ceilings (cross-multiplied, never divided) —
    and coverage is an exact count ratio. Nothing floats until the
    display column; the q_roc_auc discipline end to end.

    Plan: one scan -> value-cardinality-bounded (lang, value)
    aggs; the two order-statistic windows run over those BOUNDED
    count relations (the q_roc_auc posture — never a window over
    raw rows); the test pass is one broadcast join + count. At
    100 TB: two scans, grid-sized state.
    """
    docs = load_table(spark, sf_dir, "documents")
    grp = (F.conv(F.substring(
        F.md5(F.concat(F.lit("cf|"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 2)
    d = docs.select("lang", F.col("n_chars").cast("long").alias("x"),
                    grp.alias("grp"))
    cal = d.where(F.col("grp") == 0)
    calv = cal.groupBy("lang", "x").agg(F.count(F.lit(1)).alias("c"))
    caln = calv.groupBy("lang").agg(F.sum("c").alias("n_cal"))
    wv = Window.partitionBy("lang").orderBy("x")
    med = (calv.join(F.broadcast(caln), "lang")
           .select("lang", "x", F.sum("c").over(wv).alias("cum"), "n_cal")
           .where(F.col("cum") >= F.expr("(n_cal + 1) DIV 2"))
           .groupBy("lang").agg(F.min("x").alias("med")))
    sc = (cal.join(F.broadcast(med), "lang")
          .select("lang", F.abs(F.col("x") - F.col("med")).alias("s"))
          .groupBy("lang", "s").agg(F.count(F.lit(1)).alias("c")))
    ws = Window.partitionBy("lang").orderBy("s")
    k_q = F.least(
        F.floor((_CONF_ALPHA_NUM * (F.col("n_cal") + 1) + 9) / 10)
        .cast("long"),
        F.col("n_cal"))
    qhat = (sc.join(F.broadcast(caln), "lang")
            .select("lang", "s", F.sum("c").over(ws).alias("cum"),
                    k_q.alias("k_q"))
            .where(F.col("cum") >= F.col("k_q"))
            .groupBy("lang").agg(F.min("s").alias("qhat")))
    test = (d.where(F.col("grp") == 1)
            .join(F.broadcast(med), "lang")
            .join(F.broadcast(qhat), "lang")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_test"),
                 F.sum(F.when(F.abs(F.col("x") - F.col("med"))
                              <= F.col("qhat"), 1).otherwise(0))
                 .alias("covered")))
    return (test.join(F.broadcast(caln), "lang")
            .join(F.broadcast(med), "lang")
            .join(F.broadcast(qhat), "lang")
            .select("lang", "n_cal", "n_test", "med", "qhat",
                    F.round(F.col("covered") * 1.0 / F.col("n_test"), 6)
                    .alias("coverage")))
