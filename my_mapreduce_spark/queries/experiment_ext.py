"""Experimentation platform tier — the eighth round-4 batch
(SURVEY §2D statistics/eval depth): the three computations every
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

from pyspark.sql import Column, DataFrame, SparkSession
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
