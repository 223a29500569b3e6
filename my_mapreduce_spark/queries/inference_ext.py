"""Group-comparison inference + classifier training + runtime
pruning — the round-8 continuation batch (SURVEY §2C statistics
depth, §2D curation, and the DPP scale posture).

- ``q_anova_oneway``: one-way ANOVA F statistic of order value
  across the five order priorities — the k-group generalization of
  q_ab_test_welch (does ANY priority's mean differ?).
- ``q_kruskal_wallis``: the rank-based (tie-corrected) k-group
  test on the same contrast — the distribution-free sibling that
  survives the heavy-tailed spend distributions where ANOVA's
  normality premise dies.
- ``q_naive_bayes_train``: multinomial Naive Bayes training pass
  over the documents corpus (class = lang): Laplace-smoothed
  per-class token log-likelihoods + class log-priors — the
  training-data half of the fastText-style quality/language
  classifiers corpus pipelines train at 100 TB.
- ``q_dpp_join``: star-schema join against the Hive-partitioned
  events layout where the partition filter is only knowable at
  RUNTIME (dim side filtered on an aggregate) — exercises dynamic
  partition pruning, the mechanism that keeps a 100 TB
  date/type-partitioned fact scan O(selected partitions) when the
  selection comes from a dimension filter instead of a literal.

Exactness discipline (the q_ab_test_welch contract): every moment
is an exact integer (cents, counts, ranks doubled to stay
integral); cross-group summation — the one place double addition
order could differ between engines — happens in DECIMAL(38,6)
after a per-group ROUND, so the fold is exact and order-free;
floats appear only in final closed-form expressions, which IEEE
evaluates identically on both sides.

Scale shape (100 TB): ANOVA is one scan + O(groups) finishing.
Kruskal-Wallis ranks VALUES, not rows — the tie-group relation is
|distinct values|-bounded and the cumulative rank base uses the
two-pass distributed prefix sum (functions/ranking.py), never a
data-sized single-partition window. Naive Bayes is two
vocabulary-bounded hash-aggs plus a per-class top-k window over a
vocab-bounded relation. The DPP query scans only the partitions
the runtime dim filter selects (tests/test_inference_ext.py pins
the dynamicpruning expression in the scan's PartitionFilters).
Reference parity: none — north-star §2C/§2D depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.functions.ranking import distributed_prefix_sum
from my_mapreduce_spark.functions.text import tokens
from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.queries.bucketed import partitioned_events
from my_mapreduce_spark.registry import register

_NB_TOP = 10           # report the top-k tokens per class
_NB_ALPHA = 1          # Laplace smoothing pseudo-count
_DPP_MIN_AVG = 50.0    # dim-side runtime filter: mean event value

_CENTS_SQL = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


def _cents():
    """Exact integer cents for the order-value contrast (same idiom
    as q_partitioned_write_prune's value scaling). A function, not a
    module constant: Column construction needs an active session."""
    return F.round(F.col("o_totalprice") * 100).cast("bigint")


@register(
    "q_anova_oneway",
    oracle=f"""
    WITH x AS (
        SELECT o_orderpriority AS grp, {_CENTS_SQL} AS c FROM orders),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(c) AS BIGINT) AS s_j,
               CAST(SUM(CAST(c AS DECIMAL(38,0))
                        * CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxx_j
        FROM x GROUP BY grp),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(SUM(s_j) AS BIGINT) AS s,
               CAST(SUM(sxx_j) AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST(ROUND(CAST(s_j AS DOUBLE)
                                   * CAST(s_j AS DOUBLE) / n_j, 6)
                             AS DECIMAL(38,6))) AS DECIMAL(38,6))
                   AS sum_term
        FROM g)
    SELECT k, n,
           ROUND((CAST(sum_term AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / 10000.0, 2) AS ssb_dollars2,
           ROUND((CAST(sxx AS DOUBLE) - CAST(sum_term AS DOUBLE))
                 / 10000.0, 2) AS ssw_dollars2,
           ROUND(((CAST(sum_term AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                  / (k - 1))
                 / ((CAST(sxx AS DOUBLE) - CAST(sum_term AS DOUBLE))
                    / (n - k)), 6) AS f_stat
    FROM t
    """,
    tags=("stats", "anova", "inference", "orders"),
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order value differ across the five
    order priorities? F = (SSB/(k-1)) / (SSW/(n-k)) with
    SSB = Σ S_j²/n_j − S²/n and SSW = Σxx − Σ S_j²/n_j, all from
    EXACT integer-cent moments (per-row squares summed in
    DECIMAL(38,0): cents² ≈ 2.5e15 per row overflows bigint after
    ~3.7k rows).

    Float-determinism seam: the only cross-group fold of a float —
    Σ_j S_j²/n_j — is rounded per group and summed as
    DECIMAL(38,6) (exact, associative), so the result cannot depend
    on which engine or partition order performed the fold; every
    remaining float op is a fixed closed-form sequence from
    identical exact inputs. Sums of squares are reported in
    dollars² (cents²/1e4).

    Scale shape: one scan, O(groups) rows after the first agg —
    the same moment-not-sample pattern as q_ab_test_welch, just
    k-ary. Reference parity: none (north-star statistics depth).
    """
    x = load_table(spark, sf_dir, "orders") \
        .select(F.col("o_orderpriority").alias("grp"),
                _cents().alias("c"))
    cdec = F.col("c").cast("decimal(38,0)")
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum("c").alias("s_j"),
        F.sum(cdec * cdec).cast("decimal(38,0)").alias("sxx_j"))
    term = F.round(F.col("s_j").cast("double")
                   * F.col("s_j").cast("double") / F.col("n_j"), 6) \
        .cast("decimal(38,6)")
    t = g.agg(F.count(F.lit(1)).alias("k"),
              F.sum("n_j").alias("n"),
              F.sum("s_j").alias("s"),
              F.sum("sxx_j").cast("decimal(38,0)").alias("sxx"),
              F.sum(term).cast("decimal(38,6)").alias("sum_term"))
    ssb = (F.col("sum_term").cast("double")
           - F.col("s").cast("double") * F.col("s").cast("double")
           / F.col("n"))
    ssw = F.col("sxx").cast("double") - F.col("sum_term").cast("double")
    return t.select(
        "k", "n",
        F.round(ssb / 10000.0, 2).alias("ssb_dollars2"),
        F.round(ssw / 10000.0, 2).alias("ssw_dollars2"),
        F.round((ssb / (F.col("k") - 1))
                / (ssw / (F.col("n") - F.col("k"))), 6).alias("f_stat"))


@register(
    "q_kruskal_wallis",
    oracle=f"""
    WITH x AS (
        SELECT o_orderpriority AS grp, {_CENTS_SQL} AS c FROM orders),
    v AS (  -- tie groups: one row per distinct value
        SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM x GROUP BY c),
    vc AS ( -- 2*avg_rank of a tie group = 2*(#smaller) + t + 1
        SELECT c, t,
               2 * (CAST(SUM(t) OVER (ORDER BY c) AS BIGINT) - t)
                   + t + 1 AS ar2
        FROM v),
    gv AS (
        SELECT x.grp, CAST(COUNT(*) AS BIGINT) AS cnt, vc.ar2
        FROM x JOIN vc ON x.c = vc.c GROUP BY x.grp, vc.ar2),
    r AS (  -- doubled rank-sum per group stays an exact bigint
        SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_j,
               CAST(SUM(cnt * ar2) AS BIGINT) AS r2_j
        FROM gv GROUP BY grp),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(CAST(r2_j AS DOUBLE)
                                   * CAST(r2_j AS DOUBLE)
                                   / (4.0 * n_j), 6)
                             AS DECIMAL(38,6))) AS DECIMAL(38,6))
                   AS sum_term
        FROM r),
    tie AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tt FROM v)
    SELECT k, n,
           ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1))
                  * CAST(sum_term AS DOUBLE) - 3.0 * (n + 1))
                 / (1.0 - CAST(tt AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * n - n)),
                 6) AS h_stat
    FROM t, tie
    """,
    tags=("stats", "rank", "kruskal-wallis", "inference", "orders"),
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (tie-corrected rank ANOVA) of order value
    across the five priorities — the distribution-free counterpart
    of q_anova_oneway.

    Rank algebra kept EXACT: a tie group of t copies of value v with
    C smaller rows has average rank C + (t+1)/2, so DOUBLED rank
    2·avg = 2C + t + 1 is an exact bigint; doubled per-group rank
    sums R2_j = Σ cnt·ar2 stay bigint, and R_j²/n_j enters the H
    formula as R2_j²/(4 n_j). The only cross-group float fold sums
    per-group ROUNDed terms in DECIMAL(38,6) — exact and
    order-free (same seam discipline as q_anova_oneway). Tie
    correction 1 − Σ(t³−t)/(N³−N) is exact-integer until one final
    division.

    Scale shape: rows collapse to TIE GROUPS (|distinct values|
    ≤ N, typically ≪ N) before any ordering; the cumulative
    "#smaller rows" base uses distributed_prefix_sum's two-pass
    range-partition machinery — never Spark's single-partition
    ORDER-BY-only window (the audit smell). Everything after is
    O(groups × distinct-values-per-group) hash-agg.
    Reference parity: none (north-star statistics depth).
    """
    x = load_table(spark, sf_dir, "orders") \
        .select(F.col("o_orderpriority").alias("grp"),
                _cents().alias("c"))
    v = x.groupBy("c").agg(F.count(F.lit(1)).alias("t"))
    vc = (distributed_prefix_sum(v, [F.col("c")], F.col("t"),
                                 out="cum")
          .withColumn("ar2", 2 * (F.col("cum") - F.col("t"))
                      + F.col("t") + 1)
          .select("c", "ar2"))
    gv = (x.join(vc, "c")
          .groupBy("grp", "ar2").agg(F.count(F.lit(1)).alias("cnt")))
    r = gv.groupBy("grp").agg(
        F.sum("cnt").alias("n_j"),
        F.sum(F.col("cnt") * F.col("ar2")).alias("r2_j"))
    term = F.round(F.col("r2_j").cast("double")
                   * F.col("r2_j").cast("double")
                   / (4.0 * F.col("n_j")), 6).cast("decimal(38,6)")
    t = r.agg(F.count(F.lit(1)).alias("k"),
              F.sum("n_j").alias("n"),
              F.sum(term).cast("decimal(38,6)").alias("sum_term"))
    tie = v.agg(F.sum(F.col("t") * F.col("t") * F.col("t")
                      - F.col("t")).alias("tt"))
    nd = F.col("n").cast("double")
    h = ((12.0 / (nd * (F.col("n") + 1))
          * F.col("sum_term").cast("double") - 3.0 * (F.col("n") + 1))
         / (1.0 - F.col("tt").cast("double") / (nd * nd * F.col("n")
                                                - F.col("n"))))
    return t.crossJoin(tie).select("k", "n", F.round(h, 6).alias("h_stat"))


@register(
    "q_naive_bayes_train",
    oracle=f"""
    WITH t AS (
        SELECT lang, u.tok
        FROM documents,
             UNNEST(list_filter(
                 regexp_split_to_array(text, '[^a-z0-9]+'),
                 x -> x <> '')) AS u(tok)),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab FROM t),
    cls AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tok FROM t
        GROUP BY lang),
    prior AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        GROUP BY lang),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents),
    tc AS (
        SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM t
        GROUP BY lang, tok),
    ranked AS (
        SELECT lang, tok, c,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY c DESC, tok) AS rk
        FROM tc)
    SELECT r.lang, r.tok AS token, r.c AS token_count, r.rk AS rank,
           ROUND(ln((r.c + {_NB_ALPHA}) * 1.0
                    / (cls.n_tok + {_NB_ALPHA} * v.vocab)), 6)
               AS log_likelihood,
           ROUND(ln(prior.n_docs * 1.0 / nd.total), 6) AS log_prior
    FROM ranked r
    JOIN cls USING (lang)
    JOIN prior USING (lang)
    CROSS JOIN v CROSS JOIN nd
    WHERE r.rk <= {_NB_TOP}
    """,
    tags=("text", "classifier", "naive-bayes", "curation", "documents"),
)
def q_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes TRAINING pass over the corpus
    (class = lang): Laplace-smoothed token log-likelihoods
    ln((c_tc+α)/(n_c+α·V)) and class log-priors ln(n_docs_c/N),
    reported for each class's top-10 tokens (count desc, token asc —
    a total order, so top-k is deterministic). This is the
    counting half of the fastText-style language/quality classifiers
    that curation pipelines train over the full corpus; scoring a
    held-out doc is then one sum of these per-token terms.

    Engine shape: one token explode feeding two hash-aggs — (class,
    token) counts (combiner-reduced: partial counts shuffle, never
    raw tokens) and per-class totals — plus a global distinct-token
    count for V. All moments are exact bigints; ln appears once per
    output row on exact-integer ratios and is rounded to 6 places
    on both engines. The top-k window partitions BY CLASS over the
    vocab-bounded (class, token, count) relation — never a
    data-sized unpartitioned sort.

    Scale shape (100 TB): everything after the explode is
    vocabulary-bounded (|classes|×|vocab|); the explode itself is
    the one corpus-sized pass and carries only (lang, token) pairs.
    Reference parity: wc's token-count loop (mrapps/wc.go) is the
    degenerate one-class case of exactly this aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", F.explode(tokens()).alias("tok"))
    tc = t.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    # class totals and the vocabulary both DERIVE from tc, not from a
    # fresh corpus pass: the (lang, tok) exchange canonicalizes
    # identically across the three consumers, so Catalyst plans
    # ReusedExchange and documents is scanned once for all token
    # statistics (the audit's dup-scan gate counts plan scans)
    cls = tc.groupBy("lang").agg(F.sum("c").alias("n_tok"))
    vocab = tc.select("tok").distinct().agg(
        F.count(F.lit(1)).alias("vocab"))
    prior = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    nd = prior.agg(F.sum("n_docs").alias("total"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    ranked = (tc.withColumn("rk", F.row_number().over(w))
              .where(F.col("rk") <= _NB_TOP))
    return (ranked
            .join(cls, "lang")
            .join(prior, "lang")
            .crossJoin(F.broadcast(vocab))
            .crossJoin(F.broadcast(nd))
            .select(
                "lang", F.col("tok").alias("token"),
                F.col("c").alias("token_count"),
                F.col("rk").cast("bigint").alias("rank"),
                F.round(F.log((F.col("c") + _NB_ALPHA)
                              / (F.col("n_tok")
                                 + _NB_ALPHA * F.col("vocab"))), 6)
                .alias("log_likelihood"),
                F.round(F.log(F.col("n_docs") / F.col("total")), 6)
                .alias("log_prior")))


@register(
    "q_dpp_join",
    oracle=f"""
    WITH dim AS (
        SELECT event_type,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
        HAVING SUM(CAST(ROUND(value * 100) AS BIGINT)) * 1.0
               / COUNT(*) >= {_DPP_MIN_AVG} * 100)
    SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(CAST(ROUND(e.value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events e JOIN dim USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("join", "partitioning", "dpp", "pruning", "events"),
)
def q_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is the
    Hive-partitioned events layout (event_type=<v>/ directories,
    shared with q_partitioned_write_prune) and the partition filter
    is NOT a literal — the dim side keeps only event types whose
    global mean value ≥ $50, a predicate resolvable only at
    runtime. Catalyst plans a DynamicPruningExpression on the fact
    scan's PartitionFilters: the broadcast dim result doubles as
    the partition selector, so the scan opens only surviving types'
    directories (tests/test_inference_ext.py pins the dynamicpruning
    subquery in the plan and that static pruning could NOT have
    done it).

    Why it matters at 100 TB: production facts are partitioned by
    date/type, and real selections come from dimension joins
    ("active sources this week"), not literals. Static pruning
    covers literals only; DPP is what keeps the scan
    O(selected partitions) for join-derived selections — without
    it this plan reads every partition of a 100 TB table to join
    away most of them.

    The dim is built from the RAW events parquet (one aggregation
    pass, O(|event types|) rows, broadcast), so fact bytes read are
    pruned-partitions-only. Oracle runs the same semantics on the
    unpartitioned table — equality also re-proves the partitioned
    sink round-trip.
    """
    path = partitioned_events(spark, sf_dir)
    base = load_table(spark, sf_dir, "events") \
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd")) \
        .drop("event_type").schema.add("event_type", "string")
    fact = spark.read.schema(base).parquet(path)
    cents = F.round(F.col("value") * 100).cast("bigint")
    dim = (load_table(spark, sf_dir, "events")
           .groupBy("event_type")
           .agg(F.sum(cents).alias("cents"),
                F.count(F.lit(1)).alias("n"))
           .where(F.col("cents") * 1.0 / F.col("n")
                  >= _DPP_MIN_AVG * 100)
           .select("event_type"))
    return (fact.join(F.broadcast(dim), "event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(cents) / 100.0).alias("sum_value")))


@register(
    "q_logreg_irls",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS seg,
               CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS cents,
               CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON c.c_custkey = o.o_custkey),
    m AS (  -- exact first-iteration moments (beta = 0 => p = 1/2)
        SELECT seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(cents) AS BIGINT) AS sc,
               CAST(SUM(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS scc,
               CAST(SUM(CASE WHEN y = 1 THEN cents ELSE 0 END) AS BIGINT)
                   AS sc_pos
        FROM base GROUP BY seg),
    b1 AS (  -- closed-form IRLS step 1: beta = 4*inv([[n,Sx],[Sx,Sxx]])*z
        SELECT seg, n, n_pos,
               CAST(sc AS DOUBLE) / 100.0 AS sx,
               CAST(scc AS DOUBLE) / 10000.0 AS sxx,
               (n_pos - CAST(n AS DOUBLE) / 2) AS z0,
               (CAST(sc_pos AS DOUBLE) - CAST(sc AS DOUBLE) / 2) / 100.0
                   AS z1
        FROM m),
    b2 AS (
        SELECT seg, n, n_pos,
               4 * (sxx * z0 - sx * z1) / (n * sxx - sx * sx) AS beta0,
               4 * (-sx * z0 + CAST(n AS DOUBLE) * z1)
                   / (n * sxx - sx * sx) AS beta1
        FROM b1),
    it2 AS (  -- per-row weights at the step-1 beta, decimal-folded
        SELECT b.seg,
               CAST(ROUND(p * (1 - p), 12) AS DECIMAL(38,12)) AS w,
               CAST(ROUND(p * (1 - p) * x, 12) AS DECIMAL(38,12)) AS wx,
               CAST(ROUND(p * (1 - p) * x * x, 12) AS DECIMAL(38,12))
                   AS wxx,
               CAST(ROUND(b.y - p, 12) AS DECIMAL(38,12)) AS r,
               CAST(ROUND((b.y - p) * x, 12) AS DECIMAL(38,12)) AS rx
        FROM (
            SELECT base.seg, base.y,
                   CAST(base.cents AS DOUBLE) / 100.0 AS x,
                   1.0 / (1.0 + exp(-(b2.beta0 + b2.beta1
                          * (CAST(base.cents AS DOUBLE) / 100.0)))) AS p
            FROM base JOIN b2 ON base.seg = b2.seg) b(seg, y, x, p)),
    s2 AS (
        SELECT seg,
               CAST(SUM(w) AS DOUBLE) AS sw,
               CAST(SUM(wx) AS DOUBLE) AS swx,
               CAST(SUM(wxx) AS DOUBLE) AS swxx,
               CAST(SUM(r) AS DOUBLE) AS sr,
               CAST(SUM(rx) AS DOUBLE) AS srx
        FROM it2 GROUP BY seg)
    SELECT b2.seg AS segment, b2.n, b2.n_pos,
           ROUND(b2.beta0 + (s2.swxx * s2.sr - s2.swx * s2.srx)
                 / (s2.sw * s2.swxx - s2.swx * s2.swx), 6) AS beta0,
           ROUND(b2.beta1 + (-s2.swx * s2.sr + s2.sw * s2.srx)
                 / (s2.sw * s2.swxx - s2.swx * s2.swx), 6) AS beta1
    FROM b2 JOIN s2 ON b2.seg = s2.seg
    """,
    tags=("ml", "logistic-regression", "irls", "inference", "customer"),
)
def q_logreg_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression TRAINING, two IRLS iterations
    per market segment: P(customer has ordered | acctbal) =
    sigmoid(beta0 + beta1*x). The whole optimizer is DataFrame
    algebra — no UDF, no driver-side numpy, no MLlib — so the
    training loop IS the aggregation layer and scales like any
    other groupBy.

    Iteration 1 is CLOSED FORM from exact integer moments: at
    beta=0 every p_i = 1/2, so the weighted normal equations
    collapse to 4*inv([[n, Sx], [Sx, Sxx]]) * [S(y-1/2), S(y-1/2)x]
    with Sx, Sxx, and the class-conditional sums all exact
    bigint/decimal cent moments — no float crosses a row boundary.
    Iteration 2 needs per-row weights w_i = p_i(1-p_i) at the new
    beta (transcendental, bit-stable per row from identical
    doubles); every cross-row SUM of those floats is rounded to 12
    decimals and folded as DECIMAL(38,12) — exact and
    order-independent (the q_anova_oneway discipline) — then one
    2x2 solve per group finishes in fixed IEEE arithmetic. Both
    engines therefore produce identical bits at ROUND(.,6).

    Scale shape (100 TB): two corpus passes (one per iteration),
    each a combiner-reduced hash-agg to O(groups) rows; the
    iteration-1 coefficients rejoin the rows as an O(groups)
    BROADCAST. This is exactly how a fleet trains a per-domain
    quality classifier over the full corpus without sampling.
    Reference parity: none — north-star §2D ML-training depth.
    """
    c = load_table(spark, sf_dir, "customer")
    ordered = (load_table(spark, sf_dir, "orders")
               .select("o_custkey").distinct())
    base = (c.join(ordered, c.c_custkey == ordered.o_custkey, "left")
            .select(F.col("c_mktsegment").alias("seg"),
                    F.round(F.col("c_acctbal") * 100).cast("bigint")
                    .alias("cents"),
                    F.when(F.col("o_custkey").isNotNull(), 1)
                    .otherwise(0).alias("y")))
    cdec = F.col("cents").cast("decimal(38,0)")
    m = base.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum("cents").alias("sc"),
        F.sum(cdec * cdec).cast("decimal(38,0)").alias("scc"),
        F.sum(F.when(F.col("y") == 1, F.col("cents")).otherwise(0))
        .alias("sc_pos"))
    sx = F.col("sc").cast("double") / 100.0
    sxx = F.col("scc").cast("double") / 10000.0
    z0 = F.col("n_pos") - F.col("n").cast("double") / 2
    z1 = (F.col("sc_pos").cast("double")
          - F.col("sc").cast("double") / 2) / 100.0
    det = F.col("n") * sxx - sx * sx
    b2 = m.select(
        "seg", "n", "n_pos",
        (4 * (sxx * z0 - sx * z1) / det).alias("beta0"),
        (4 * (-sx * z0 + F.col("n").cast("double") * z1) / det)
        .alias("beta1"))
    x = F.col("cents").cast("double") / 100.0
    p = 1.0 / (1.0 + F.exp(-(F.col("beta0") + F.col("beta1") * x)))
    it2 = (base.join(F.broadcast(b2.select("seg", "beta0", "beta1")),
                     "seg")
           .withColumn("x", x).withColumn("p", p)
           .select(
               "seg",
               F.round(F.col("p") * (1 - F.col("p")), 12)
               .cast("decimal(38,12)").alias("w"),
               F.round(F.col("p") * (1 - F.col("p")) * F.col("x"), 12)
               .cast("decimal(38,12)").alias("wx"),
               F.round(F.col("p") * (1 - F.col("p"))
                       * F.col("x") * F.col("x"), 12)
               .cast("decimal(38,12)").alias("wxx"),
               F.round(F.col("y") - F.col("p"), 12)
               .cast("decimal(38,12)").alias("r"),
               F.round((F.col("y") - F.col("p")) * F.col("x"), 12)
               .cast("decimal(38,12)").alias("rx")))
    s2 = it2.groupBy("seg").agg(
        F.sum("w").cast("double").alias("sw"),
        F.sum("wx").cast("double").alias("swx"),
        F.sum("wxx").cast("double").alias("swxx"),
        F.sum("r").cast("double").alias("sr"),
        F.sum("rx").cast("double").alias("srx"))
    det2 = (F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx"))
    return (b2.join(s2, "seg")
            .select(
                F.col("seg").alias("segment"), "n", "n_pos",
                F.round(F.col("beta0")
                        + (F.col("swxx") * F.col("sr")
                           - F.col("swx") * F.col("srx")) / det2, 6)
                .alias("beta0"),
                F.round(F.col("beta1")
                        + (-F.col("swx") * F.col("sr")
                           + F.col("sw") * F.col("srx")) / det2, 6)
                .alias("beta1")))


_CORR_COLS = (  # (name, integer scaling that makes the value exact)
    ("l_quantity", 1),
    ("l_extendedprice", 100),
    ("l_discount", 100),
    ("l_tax", 100),
)


def _corr_moment_sql() -> str:
    sums = []
    for c, s in _CORR_COLS:
        sums.append(f"CAST(SUM(i_{c}) AS DECIMAL(38,0)) AS s_{c}")
        sums.append(f"CAST(SUM(CAST(i_{c} AS DECIMAL(38,0))"
                    f" * CAST(i_{c} AS DECIMAL(38,0)))"
                    f" AS DECIMAL(38,0)) AS ss_{c}")
    for i, (a, _) in enumerate(_CORR_COLS):
        for b, _s in _CORR_COLS[i + 1:]:
            sums.append(f"CAST(SUM(CAST(i_{a} AS DECIMAL(38,0))"
                        f" * CAST(i_{b} AS DECIMAL(38,0)))"
                        f" AS DECIMAL(38,0)) AS x_{a}_{b}")
    scaled = ", ".join(
        f"CAST(ROUND({c} * {s}) AS BIGINT) AS i_{c}" for c, s in _CORR_COLS)
    pair_rows = "\nUNION ALL\n".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
               ROUND((n * CAST(x_{a}_{b} AS DOUBLE)
                      - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
                     / sqrt((n * CAST(ss_{a} AS DOUBLE)
                             - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                            * (n * CAST(ss_{b} AS DOUBLE)
                               - CAST(s_{b} AS DOUBLE)
                                 * CAST(s_{b} AS DOUBLE))), 6) AS pearson_r
        FROM m"""
        for i, (a, _) in enumerate(_CORR_COLS)
        for b, _s in _CORR_COLS[i + 1:])
    return f"""
    WITH scaled AS (SELECT {scaled} FROM lineitem),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, {', '.join(sums)}
          FROM scaled)
    {pair_rows}
    """


@register(
    "q_corr_matrix",
    oracle=_corr_moment_sql(),
    tags=("stats", "profiling", "correlation", "lineitem"),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's four
    numeric measures (quantity, extendedprice, discount, tax) — the
    column-profiling pass that decides which measures carry
    independent signal before any modeling (the multivariate sibling
    of q_profile_columns). All six coefficients come from ONE scan:
    a single hash-agg computes every first/second/cross moment as
    exact integer-scaled decimals (cents, tax-points), and each
    r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) is a
    fixed IEEE expression over those exact inputs — bit-identical
    on both engines, no cross-row float fold anywhere.

    Scale shape (100 TB): one combiner-reduced aggregate to a
    single moment row (15 decimals wide), then six O(1) expressions
    — the moment-not-sample pattern at its purest. Adding a column
    costs O(k) more moments in the same pass, never another scan.
    Reference parity: none — north-star profiling depth.
    """
    li = load_table(spark, sf_dir, "lineitem")
    scaled = li.select(*[
        F.round(F.col(c) * s).cast("bigint").alias(f"i_{c}")
        for c, s in _CORR_COLS])
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, _s in _CORR_COLS:
        d = F.col(f"i_{c}").cast("decimal(38,0)")
        aggs.append(F.sum(d).cast("decimal(38,0)").alias(f"s_{c}"))
        aggs.append(F.sum(d * d).cast("decimal(38,0)").alias(f"ss_{c}"))
    for i, (a, _) in enumerate(_CORR_COLS):
        for b, _s in _CORR_COLS[i + 1:]:
            aggs.append(
                F.sum(F.col(f"i_{a}").cast("decimal(38,0)")
                      * F.col(f"i_{b}").cast("decimal(38,0)"))
                .cast("decimal(38,0)").alias(f"x_{a}_{b}"))
    # eager checkpoint of the 1-row moment relation: the six pair
    # expressions fan out as union branches, and without truncation
    # each branch re-plans (and re-scans) the full aggregate subtree
    # — the corpus is scanned once, the fan-out reads 15 decimals
    m = scaled.agg(*aggs).localCheckpoint(eager=True)
    outs = []
    for i, (a, _) in enumerate(_CORR_COLS):
        for b, _s in _CORR_COLS[i + 1:]:
            nd = F.col("n").cast("double")
            sa, sb = (F.col(f"s_{a}").cast("double"),
                      F.col(f"s_{b}").cast("double"))
            r = ((nd * F.col(f"x_{a}_{b}").cast("double") - sa * sb)
                 / F.sqrt((nd * F.col(f"ss_{a}").cast("double") - sa * sa)
                          * (nd * F.col(f"ss_{b}").cast("double")
                             - sb * sb)))
            outs.append(m.select(F.lit(a).alias("col_a"),
                                 F.lit(b).alias("col_b"),
                                 F.round(r, 6).alias("pearson_r")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@register(
    "q_poisson_glm",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS seg,
               CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS cents,
               COALESCE(o.n, 0) AS y
        FROM customer c
        LEFT JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
                   FROM orders GROUP BY 1) o
          ON c.c_custkey = o.o_custkey),
    m AS (  -- exact step-1 moments: at beta = 0 every rate is 1
        SELECT seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(cents) AS BIGINT) AS sc,
               CAST(SUM(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS scc,
               CAST(SUM(y * cents) AS BIGINT) AS syc
        FROM base GROUP BY seg),
    b1 AS (
        SELECT seg, n, sy,
               CAST(sc AS DOUBLE) / 100.0 AS sx,
               CAST(scc AS DOUBLE) / 10000.0 AS sxx,
               (CAST(sy AS DOUBLE) - n) AS z0,
               (CAST(syc AS DOUBLE) - CAST(sc AS DOUBLE)) / 100.0 AS z1
        FROM m),
    b2 AS (
        SELECT seg, n, sy,
               (sxx * z0 - sx * z1) / (n * sxx - sx * sx) AS beta0,
               (-sx * z0 + CAST(n AS DOUBLE) * z1)
                   / (n * sxx - sx * sx) AS beta1
        FROM b1),
    it2 AS (  -- per-row Poisson weights at the step-1 beta
        SELECT b.seg,
               CAST(ROUND(lam, 12) AS DECIMAL(38,12)) AS w,
               CAST(ROUND(lam * x, 12) AS DECIMAL(38,12)) AS wx,
               CAST(ROUND(lam * x * x, 12) AS DECIMAL(38,12)) AS wxx,
               CAST(ROUND(b.y - lam, 12) AS DECIMAL(38,12)) AS r,
               CAST(ROUND((b.y - lam) * x, 12) AS DECIMAL(38,12)) AS rx
        FROM (
            SELECT base.seg, base.y,
                   CAST(base.cents AS DOUBLE) / 100.0 AS x,
                   exp(b2.beta0 + b2.beta1
                       * (CAST(base.cents AS DOUBLE) / 100.0)) AS lam
            FROM base JOIN b2 ON base.seg = b2.seg) b(seg, y, x, lam)),
    s2 AS (
        SELECT seg,
               CAST(SUM(w) AS DOUBLE) AS sw,
               CAST(SUM(wx) AS DOUBLE) AS swx,
               CAST(SUM(wxx) AS DOUBLE) AS swxx,
               CAST(SUM(r) AS DOUBLE) AS sr,
               CAST(SUM(rx) AS DOUBLE) AS srx
        FROM it2 GROUP BY seg)
    SELECT b2.seg AS segment, b2.n, b2.sy AS total_orders,
           ROUND(b2.beta0 + (s2.swxx * s2.sr - s2.swx * s2.srx)
                 / (s2.sw * s2.swxx - s2.swx * s2.swx), 6) AS beta0,
           ROUND(b2.beta1 + (-s2.swx * s2.sr + s2.sw * s2.srx)
                 / (s2.sw * s2.swxx - s2.swx * s2.swx), 6) AS beta1
    FROM b2 JOIN s2 ON b2.seg = s2.seg
    """,
    tags=("ml", "poisson", "glm", "irls", "inference", "customer"),
)
def q_poisson_glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson regression (log link) of per-customer ORDER COUNT on
    account balance, per market segment, two IRLS iterations — the
    second GLM on the q_logreg_irls template, proving the template
    is a family, not a one-off: swap the link (sigmoid -> exp) and
    the weight (p(1-p) -> lambda) and the whole optimizer is still
    two combiner-reduced hash-aggs plus an O(groups) broadcast.

    Iteration 1 is closed form from EXACT moments: at beta = 0 the
    rate is 1 for every row, so the weighted normal equations use
    [[n, Sx], [Sx, Sxx]] and the residual vector (Sy - n,
    Syx - Sx) — counts, cents, and count*cents products are all
    exact bigint/decimal. Iteration 2 computes per-row
    lambda = exp(beta0 + beta1 x) (bit-stable per row), folds every
    cross-row sum through ROUND(.,12) + DECIMAL(38,12) (exact,
    order-free), and finishes with one 2x2 solve per group.
    tests/test_inference_ext.py cross-checks against an independent
    numpy IRLS.

    Scale shape: identical to q_logreg_irls — two corpus passes, an
    O(groups) coefficient broadcast between them, nothing else
    leaves the executors. Reference parity: none — north-star §2D
    ML-training depth.
    """
    c = load_table(spark, sf_dir, "customer")
    counts = (load_table(spark, sf_dir, "orders")
              .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("yo")))
    base = (c.join(counts, c.c_custkey == counts.o_custkey, "left")
            .select(F.col("c_mktsegment").alias("seg"),
                    F.round(F.col("c_acctbal") * 100).cast("bigint")
                    .alias("cents"),
                    F.coalesce(F.col("yo"), F.lit(0)).alias("y")))
    cdec = F.col("cents").cast("decimal(38,0)")
    m = base.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("cents").alias("sc"),
        F.sum(cdec * cdec).cast("decimal(38,0)").alias("scc"),
        F.sum(F.col("y") * F.col("cents")).alias("syc"))
    sx = F.col("sc").cast("double") / 100.0
    sxx = F.col("scc").cast("double") / 10000.0
    z0 = F.col("sy").cast("double") - F.col("n")
    z1 = (F.col("syc").cast("double") - F.col("sc").cast("double")) / 100.0
    det = F.col("n") * sxx - sx * sx
    b2 = m.select(
        "seg", "n", "sy",
        ((sxx * z0 - sx * z1) / det).alias("beta0"),
        ((-sx * z0 + F.col("n").cast("double") * z1) / det).alias("beta1"))
    x = F.col("cents").cast("double") / 100.0
    lam = F.exp(F.col("beta0") + F.col("beta1") * x)
    it2 = (base.join(F.broadcast(b2.select("seg", "beta0", "beta1")),
                     "seg")
           .withColumn("x", x).withColumn("lam", lam)
           .select(
               "seg",
               F.round(F.col("lam"), 12)
               .cast("decimal(38,12)").alias("w"),
               F.round(F.col("lam") * F.col("x"), 12)
               .cast("decimal(38,12)").alias("wx"),
               F.round(F.col("lam") * F.col("x") * F.col("x"), 12)
               .cast("decimal(38,12)").alias("wxx"),
               F.round(F.col("y") - F.col("lam"), 12)
               .cast("decimal(38,12)").alias("r"),
               F.round((F.col("y") - F.col("lam")) * F.col("x"), 12)
               .cast("decimal(38,12)").alias("rx")))
    s2 = it2.groupBy("seg").agg(
        F.sum("w").cast("double").alias("sw"),
        F.sum("wx").cast("double").alias("swx"),
        F.sum("wxx").cast("double").alias("swxx"),
        F.sum("r").cast("double").alias("sr"),
        F.sum("rx").cast("double").alias("srx"))
    det2 = (F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx"))
    return (b2.join(s2, "seg")
            .select(
                F.col("seg").alias("segment"), "n",
                F.col("sy").alias("total_orders"),
                F.round(F.col("beta0")
                        + (F.col("swxx") * F.col("sr")
                           - F.col("swx") * F.col("srx")) / det2, 6)
                .alias("beta0"),
                F.round(F.col("beta1")
                        + (-F.col("swx") * F.col("sr")
                           + F.col("sw") * F.col("srx")) / det2, 6)
                .alias("beta1")))


@register(
    "q_decision_stump",
    oracle="""
    WITH base AS (
        SELECT CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS cents,
               CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON c.c_custkey = o.o_custkey),
    v AS (
        SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM base GROUP BY cents),
    cum AS (
        SELECT cents,
               CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT) AS nl,
               CAST(SUM(pos) OVER (ORDER BY cents) AS BIGINT) AS pl
        FROM v),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(SUM(pos) AS BIGINT) AS p FROM v),
    cand AS (
        SELECT cents, nl, pl, tot.n - nl AS nr, tot.p - pl AS pr,
               (CAST(nl AS DOUBLE) * nl
                - CAST(pl AS DOUBLE) * pl
                - CAST(nl - pl AS DOUBLE) * (nl - pl))
                   / (CAST(tot.n AS DOUBLE) * nl)
               + (CAST(tot.n - nl AS DOUBLE) * (tot.n - nl)
                  - CAST(tot.p - pl AS DOUBLE) * (tot.p - pl)
                  - CAST((tot.n - nl) - (tot.p - pl) AS DOUBLE)
                    * ((tot.n - nl) - (tot.p - pl)))
                   / (CAST(tot.n AS DOUBLE) * (tot.n - nl)) AS g
        FROM cum CROSS JOIN tot
        WHERE nl > 0 AND tot.n - nl > 0)
    SELECT cents AS split_cents, nl AS n_left, pl AS pos_left,
           nr AS n_right, pr AS pos_right,
           ROUND(g, 6) AS weighted_gini,
           ROUND(1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
                 - (CAST(n - p AS DOUBLE) / n)
                   * (CAST(n - p AS DOUBLE) / n), 6) AS parent_gini
    FROM cand CROSS JOIN tot
    ORDER BY g, cents LIMIT 1
    """,
    tags=("ml", "decision-tree", "gini", "inference", "customer"),
)
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal decision STUMP (one-split tree) for "has this
    customer ever ordered?" on account balance: evaluate EVERY
    distinct balance as a candidate threshold and pick the split
    minimizing weighted Gini impurity — tree learning expressed
    entirely as aggregation, the third member of the
    ML-in-the-aggregation-layer family (q_logreg_irls,
    q_poisson_glm). This is one boosting round's weak learner and
    the split-finder inner loop of every distributed
    GBDT/random-forest system.

    Exactness: candidates collapse to TIE GROUPS (one row per
    distinct cents value, the q_kruskal_wallis move), cumulative
    class counts ride the two-pass distributed prefix sum (never a
    data-sized single-partition window), and each candidate's
    impurity (nl² − pl² − (nl−pl)²)/(n·nl) + symmetric is one fixed
    IEEE expression over exact bigints — identical doubles on both
    engines, so even the argmin's tie-break (impurity, then
    threshold) is deterministic cross-engine. The winner emerges
    via a global ORDER BY + LIMIT 1 (TakeOrderedAndProject — top-k
    machinery, not a full sort).

    Scale shape (100 TB): one scan to value-level tie groups
    (|distinct values|-bounded), one range-partitioned prefix sum,
    one top-1. Adding features = repeating per feature column —
    embarrassingly parallel across features, which is exactly how
    production GBDT histogram split-finders are laid out.
    Reference parity: none — north-star §2D ML-training depth.
    """
    c = load_table(spark, sf_dir, "customer")
    ordered = (load_table(spark, sf_dir, "orders")
               .select("o_custkey").distinct())
    base = (c.join(ordered, c.c_custkey == ordered.o_custkey, "left")
            .select(F.round(F.col("c_acctbal") * 100).cast("bigint")
                    .alias("cents"),
                    F.when(F.col("o_custkey").isNotNull(), 1)
                    .otherwise(0).alias("y")))
    v = base.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"),
                                  F.sum("y").alias("pos"))
    cum = distributed_prefix_sum(v, [F.col("cents")], F.col("cnt"),
                                 out="nl")
    cum = distributed_prefix_sum(cum, [F.col("cents")], F.col("pos"),
                                 out="pl").select("cents", "nl", "pl")
    tot = v.agg(F.sum("cnt").alias("n"), F.sum("pos").alias("p"))
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    nr = (F.col("n") - F.col("nl")).cast("double")
    pr = (F.col("p") - F.col("pl")).cast("double")
    g = ((nl * nl - pl * pl - (nl - pl) * (nl - pl))
         / (F.col("n").cast("double") * nl)
         + (nr * nr - pr * pr - (nr - pr) * (nr - pr))
         / (F.col("n").cast("double") * nr))
    pd_ = F.col("p").cast("double") / F.col("n")
    nd_ = (F.col("n") - F.col("p")).cast("double") / F.col("n")
    return (cum.crossJoin(F.broadcast(tot))
            .where((F.col("nl") > 0) & (F.col("n") - F.col("nl") > 0))
            .select(F.col("cents").alias("split_cents"),
                    F.col("nl").alias("n_left"),
                    F.col("pl").alias("pos_left"),
                    (F.col("n") - F.col("nl")).alias("n_right"),
                    (F.col("p") - F.col("pl")).alias("pos_right"),
                    g.alias("g"),
                    F.round(1.0 - pd_ * pd_ - nd_ * nd_, 6)
                    .alias("parent_gini"))
            .orderBy("g", "split_cents").limit(1)
            .select("split_cents", "n_left", "pos_left", "n_right",
                    "pos_right", F.round("g", 6).alias("weighted_gini"),
                    "parent_gini"))


@register(
    "q_levene_test",
    oracle=f"""
    WITH x AS (
        SELECT o_orderpriority AS grp, {_CENTS_SQL} AS c FROM orders),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(c) AS BIGINT) AS s_j
        FROM x GROUP BY grp),
    z AS (  -- |x - mean_j| = |n_j*x - S_j| / n_j: exact integers, one
            -- division -> the per-row double is engine-identical
        SELECT x.grp,
               CAST(ABS(g.n_j * x.c - g.s_j) AS DOUBLE) / g.n_j AS z
        FROM x JOIN g USING (grp)),
    zg AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS m_j,
               CAST(SUM(CAST(ROUND(z, 2) AS DECIMAL(38,2)))
                    AS DECIMAL(38,2)) AS zs_j,
               CAST(SUM(CAST(ROUND(z * z, 2) AS DECIMAL(38,2)))
                    AS DECIMAL(38,2)) AS zxx_j
        FROM z GROUP BY grp),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(m_j) AS BIGINT) AS n,
               CAST(SUM(zs_j) AS DECIMAL(38,2)) AS zs,
               CAST(SUM(zxx_j) AS DECIMAL(38,2)) AS zxx,
               CAST(SUM(CAST(ROUND(CAST(zs_j AS DOUBLE)
                                   * CAST(zs_j AS DOUBLE) / m_j, 6)
                             AS DECIMAL(38,6))) AS DECIMAL(38,6))
                   AS sum_term
        FROM zg)
    SELECT k, n,
           ROUND((CAST(sum_term AS DOUBLE)
                  - CAST(zs AS DOUBLE) * CAST(zs AS DOUBLE) / n)
                 / (k - 1) / 10000.0, 2) AS msb_z_dollars2,
           ROUND((CAST(zxx AS DOUBLE) - CAST(sum_term AS DOUBLE))
                 / (n - k) / 10000.0, 2) AS msw_z_dollars2,
           ROUND(((CAST(sum_term AS DOUBLE)
                   - CAST(zs AS DOUBLE) * CAST(zs AS DOUBLE) / n)
                  / (k - 1))
                 / ((CAST(zxx AS DOUBLE) - CAST(sum_term AS DOUBLE))
                    / (n - k)), 6) AS levene_w
    FROM t
    """,
    tags=("stats", "variance", "levene", "inference", "orders"),
)
def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEVENE'S TEST (mean-centered) for variance homogeneity: is
    the SPREAD of order value the same across the five priorities?
    The companion every ANOVA needs — q_anova_oneway's F assumes
    equal group variances, and this is the test of that assumption
    (W = the one-way F applied to z_ij = |x_ij - mean_j|).

    Exactness: the per-row centered deviation is |n_j·x - S_j| / n_j
    — an ABS over exact bigints (n_j·cents ≤ ~3e12, inside int64)
    and ONE division, so every z is the identical double on both
    engines; the cross-row folds of z and z² ride the
    ROUND(,2)→DECIMAL(38,2) discipline (2 decimals, not the usual 6:
    z² sums reach ~8e17, and a finer scale pushes the decimal past
    double's 53-bit mantissa so the final decimal→double CAST itself
    rounds DIFFERENTLY per engine — the seam the first cut hit), and
    Σ_j Zs_j²/m_j rounds per group exactly like q_anova_oneway's
    sum_term. Outputs are MEAN squares (dollars², ÷(k-1)/(n-k) —
    magnitudes where a 1-ulp cast wobble sits far below the 2-decimal
    report) and W, each one fixed closed-form IEEE sequence.

    Scale shape: two scans of orders (moments, then the z pass —
    rejoining the 5-row group moments broadcast) + O(groups)
    aggregates; no data-sized shuffle anywhere. Reference parity:
    none — north-star statistics depth beside q_anova_oneway /
    q_kruskal_wallis (parametric location, rank location, and now
    SCALE).
    """
    x = load_table(spark, sf_dir, "orders") \
        .select(F.col("o_orderpriority").alias("grp"),
                _cents().alias("c"))
    g = x.groupBy("grp").agg(F.count(F.lit(1)).alias("n_j"),
                             F.sum("c").alias("s_j"))
    z = (x.join(F.broadcast(g), "grp")
         .select("grp",
                 (F.abs(F.col("n_j") * F.col("c") - F.col("s_j"))
                  .cast("double") / F.col("n_j")).alias("z")))
    dec2 = lambda col: F.round(col, 2).cast("decimal(38,2)")  # noqa: E731
    zg = z.groupBy("grp").agg(
        F.count(F.lit(1)).alias("m_j"),
        F.sum(dec2(F.col("z"))).cast("decimal(38,2)").alias("zs_j"),
        F.sum(dec2(F.col("z") * F.col("z"))).cast("decimal(38,2)")
        .alias("zxx_j"))
    term = F.round(F.col("zs_j").cast("double")
                   * F.col("zs_j").cast("double") / F.col("m_j"), 6) \
        .cast("decimal(38,6)")
    t = zg.agg(F.count(F.lit(1)).alias("k"),
               F.sum("m_j").alias("n"),
               F.sum("zs_j").cast("decimal(38,2)").alias("zs"),
               F.sum("zxx_j").cast("decimal(38,2)").alias("zxx"),
               F.sum(term).cast("decimal(38,6)").alias("sum_term"))
    ssb = (F.col("sum_term").cast("double")
           - F.col("zs").cast("double") * F.col("zs").cast("double")
           / F.col("n"))
    ssw = F.col("zxx").cast("double") - F.col("sum_term").cast("double")
    return t.select(
        "k", "n",
        F.round(ssb / (F.col("k") - 1) / 10000.0, 2)
        .alias("msb_z_dollars2"),
        F.round(ssw / (F.col("n") - F.col("k")) / 10000.0, 2)
        .alias("msw_z_dollars2"),
        F.round((ssb / (F.col("k") - 1))
                / (ssw / (F.col("n") - F.col("k"))), 6)
        .alias("levene_w"))


@register(
    "q_chi2_independence",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS pr, o_orderstatus AS st,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM orders GROUP BY 1, 2),
    rt AS (SELECT pr, CAST(SUM(n_obs) AS BIGINT) AS n_r
           FROM cells GROUP BY pr),
    ct AS (SELECT st, CAST(SUM(n_obs) AS BIGINT) AS n_c
           FROM cells GROUP BY st),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT pr, st, cells.n_obs, rt.n_r, ct.n_c, tot.n,
               (CAST(cells.n_obs * tot.n - rt.n_r * ct.n_c AS DOUBLE)
                * CAST(cells.n_obs * tot.n - rt.n_r * ct.n_c AS DOUBLE))
               / (CAST(tot.n AS DOUBLE) * rt.n_r * ct.n_c) AS contrib
        FROM cells JOIN rt USING (pr) JOIN ct USING (st) CROSS JOIN tot)
    SELECT CAST(COUNT(DISTINCT pr) AS BIGINT) AS n_row_levels,
           CAST(COUNT(DISTINCT st) AS BIGINT) AS n_col_levels,
           CAST((COUNT(DISTINCT pr) - 1) * (COUNT(DISTINCT st) - 1)
                AS BIGINT) AS dof,
           MAX(n) AS n_total,
           ROUND(CAST(SUM(CAST(ROUND(contrib, 9) AS DECIMAL(38, 9)))
                      AS DOUBLE), 6) AS chi2
    FROM terms
    """,
    tags=("stats", "inference", "chi-square", "contingency", "orders"),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence over the order
    priority x status contingency table — the categorical-association
    staple beside the location tests (q_anova_oneway / q_levene_test
    / q_kruskal_wallis).

    Float discipline (the documented fold rules): each cell's
    contribution is the ALGEBRAIC form (obs*N - rowtot*coltot)^2 /
    (N*rowtot*coltot) — the integer products are exact int64 at
    fixture scale and cast to double BEFORE squaring (so the square
    cannot overflow int64 at any scale), giving a fixed IEEE sequence
    from identical exact inputs on both engines; per-cell contribs
    are ROUND(,9)-quantized and summed as DECIMAL(38,9) (cell count
    is enum-bounded, so the decimal total stays far inside 15
    significant digits before its double CAST).

    Engine shape: one partial-combined cell aggregate (|priorities x
    statuses| rows — enum-bounded), two tiny marginal aggregates
    broadcast back onto the cells, a 1-row total via broadcast
    crossJoin (the scalar-subquery shape), and a single-row final
    fold. Nothing corpus-sized ever shuffles twice; at 100 TB the
    only data-sized pass is the first scan.

    n_row_levels/n_col_levels count DISTINCT LEVEL KEYS (pr/st) over
    the joined cells on BOTH engines — counting distinct marginal
    totals instead would collapse two levels whose counts tie,
    understating dof and inflating the downstream effect size.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"))
    cells = o.groupBy("pr", "st").agg(F.count(F.lit(1)).alias("n_obs"))
    rt = cells.groupBy("pr").agg(F.sum("n_obs").alias("n_r"))
    ct = cells.groupBy("st").agg(F.sum("n_obs").alias("n_c"))
    tot = cells.agg(F.sum("n_obs").alias("n"))
    num = (F.col("n_obs") * F.col("n")
           - F.col("n_r") * F.col("n_c")).cast("double")
    contrib = (num * num) / (F.col("n").cast("double")
                             * F.col("n_r") * F.col("n_c"))
    terms = (cells.join(F.broadcast(rt), "pr")
             .join(F.broadcast(ct), "st")
             .crossJoin(F.broadcast(tot))
             .select("pr", "st", "n_obs", "n_r", "n_c", "n",
                     contrib.alias("contrib")))
    # dof counts LEVEL KEYS, not distinct marginal totals: two levels
    # with identical marginal counts must still count as two levels
    return terms.agg(
        F.count_distinct("pr").alias("n_row_levels"),
        F.count_distinct("st").alias("n_col_levels"),
        ((F.count_distinct("pr") - 1)
         * (F.count_distinct("st") - 1)).alias("dof"),
        F.max("n").alias("n_total"),
        F.round(F.sum(F.round(F.col("contrib"), 9)
                      .cast("decimal(38,9)")).cast("double"), 6)
        .alias("chi2"))


@register(
    "q_mann_whitney_u",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'click')),
    byv AS (
        SELECT cents,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n1v
        FROM x GROUP BY cents),
    rk AS (
        SELECT cents, n_all, n1v,
               COALESCE(SUM(n_all) OVER (
                   ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum
        FROM byv),
    agg AS (
        SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
               CAST(SUM(n_all - n1v) AS BIGINT) AS n2,
               CAST(SUM(n_all) AS BIGINT) AS n,
               CAST(SUM(n1v * (2 * cum + n_all + 1)) AS BIGINT) AS r1_2,
               CAST(SUM(n_all * n_all * n_all - n_all) AS BIGINT)
                   AS tiesum
        FROM rk)
    SELECT n1, n2,
           CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u1_doubled,
           ROUND(((r1_2 - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
                 / sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                        * ((n + 1) - CAST(tiesum AS DOUBLE)
                                     / (CAST(n AS DOUBLE) * (n - 1)))),
                 6) AS z
    FROM agg
    """,
    tags=("stats", "inference", "rank-test", "mann-whitney", "events"),
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing purchase vs click
    event values — the TWO-sample rank test beside the k-group
    q_kruskal_wallis, with the normal approximation's tie-corrected
    variance.

    Rank arithmetic never touches rows: values quantize to exact
    cents, the per-VALUE aggregate carries (total count, group-1
    count), and average ranks come from a prefix sum over the
    DISTINCT-cents relation (value-cardinality bounded — the q_ks_test
    global-window contract; continuous metrics must pre-bucket).
    Everything through the rank sums and the tie term sum(t^3 - t) is
    exact int64 (ranks are half-integers, so the query carries 2x the
    rank sum and reports u1_doubled as the exact statistic); the z
    score is one fixed IEEE expression from those exact integers,
    ROUND(,6) on both engines.

    Engine shape: one filtered scan, one combiner-reduced value
    aggregate, one tiny-window pass, one 1-row fold. At 100 TB the
    scan dominates; rank tests over arbitrary-cardinality doubles
    take the distributed_rank machinery instead.
    """
    x = (load_table(spark, sf_dir, "events")
         .where(F.col("event_type").isin("purchase", "click"))
         .select("event_type",
                 F.round(F.col("value") * 100).cast("bigint")
                 .alias("cents")))
    byv = (x.groupBy("cents")
           .agg(F.count(F.lit(1)).alias("n_all"),
                F.sum(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0)).alias("n1v")))
    w = (Window.orderBy("cents")
         .rowsBetween(Window.unboundedPreceding, -1))
    rk = byv.withColumn("cum", F.coalesce(F.sum("n_all").over(w),
                                          F.lit(0)))
    agg = rk.agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("n_all") - F.col("n1v")).alias("n2"),
        F.sum("n_all").alias("n"),
        F.sum(F.col("n1v") * (2 * F.col("cum") + F.col("n_all") + 1))
        .alias("r1_2"),
        F.sum(F.col("n_all") * F.col("n_all") * F.col("n_all")
              - F.col("n_all")).alias("tiesum"))
    u1d = F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)
    mu = F.col("n1") * F.col("n2") / 2.0
    var = ((F.col("n1").cast("double") * F.col("n2") / 12.0)
           * ((F.col("n") + 1) - F.col("tiesum").cast("double")
              / (F.col("n").cast("double") * (F.col("n") - 1))))
    return agg.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        u1d.cast("bigint").alias("u1_doubled"),
        F.round((u1d / 2.0 - mu) / F.sqrt(var), 6).alias("z"))


@register(
    "q_wasserstein_1d",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'click')),
    n AS (
        SELECT CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM x),
    byv AS (
        SELECT cents,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM x GROUP BY cents),
    cum AS (
        SELECT cents,
               SUM(c1) OVER (ORDER BY cents
                             ROWS UNBOUNDED PRECEDING) AS f1,
               SUM(c2) OVER (ORDER BY cents
                             ROWS UNBOUNDED PRECEDING) AS f2,
               LEAD(cents) OVER (ORDER BY cents) AS next_cents
        FROM byv),
    seg AS (
        SELECT abs(f1 * n.n2 - f2 * n.n1) * (next_cents - cents)
                   AS num
        FROM cum CROSS JOIN n
        WHERE next_cents IS NOT NULL)
    SELECT n.n1, n.n2,
           CAST(SUM(seg.num) AS BIGINT) AS w1_num,
           CAST(n.n1 * n.n2 * 100 AS BIGINT) AS w1_den,
           ROUND(SUM(seg.num) / (CAST(n.n1 AS DOUBLE) * n.n2 * 100), 6)
               AS w1_dollars
    FROM seg CROSS JOIN n
    GROUP BY n.n1, n.n2
    """,
    tags=("stats", "inference", "wasserstein", "distribution-shift",
          "events"),
)
def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between the
    purchase and click value distributions — THE distribution-shift
    metric for training-data drift monitoring (unlike KL it is
    finite for non-overlapping supports and respects the metric on
    values, unlike KS it weighs HOW FAR mass moved, not just the
    worst gap).

    W1 = integral |F1 - F2| dx over the empirical CDFs, which on
    discrete cents is a SUM of |F1 - F2| x segment-width terms —
    and every term is EXACT integer arithmetic after
    cross-multiplying the two sample sizes: |f1*n2 - f2*n1| *
    gap_cents, summed as int64, divided ONCE at the end. The query
    ships the exact numerator/denominator pair (w1_num / w1_den)
    plus the rounded dollar value, so the oracle comparison has a
    bit-exact integer core (magnitudes: f*n <= n1*n2 ~ 2.2e7 at
    sf0.1, x 100-cent gaps x segments — far inside int64).

    Engine shape: one filtered scan, one combiner-reduced per-value
    aggregate, one prefix-sum pass over the DISTINCT-cents relation
    (value-cardinality bounded — the q_ks_test window contract), a
    1-row total. At 100 TB the scan dominates; continuous metrics
    pre-bucket exactly as KS does.
    """
    x = (load_table(spark, sf_dir, "events")
         .where(F.col("event_type").isin("purchase", "click"))
         .select("event_type",
                 F.round(F.col("value") * 100).cast("bigint")
                 .alias("cents")))
    is1 = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    byv = (x.groupBy("cents")
           .agg(F.sum(is1).alias("c1"),
                F.sum(1 - is1).alias("c2")))
    n = byv.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("cents")
    cum = byv.select(
        "cents",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
        F.lead("cents").over(wl).alias("next_cents"))
    seg = (cum.where(F.col("next_cents").isNotNull())
           .crossJoin(F.broadcast(n))
           .select((F.abs(F.col("f1") * F.col("n2")
                          - F.col("f2") * F.col("n1"))
                    * (F.col("next_cents") - F.col("cents")))
                   .alias("num"), "n1", "n2"))
    return (seg.groupBy("n1", "n2")
            .agg(F.sum("num").cast("bigint").alias("w1_num"),
                 (F.first("n1") * F.first("n2") * 100).cast("bigint")
                 .alias("w1_den"),
                 F.round(F.sum("num")
                         / (F.col("n1").cast("double")
                            * F.col("n2") * 100), 6)
                 .alias("w1_dollars"))
            .select(F.col("n1").cast("bigint").alias("n1"),
                    F.col("n2").cast("bigint").alias("n2"),
                    "w1_num", "w1_den", "w1_dollars"))


@register(
    "q_mutual_information",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS pr, o_orderstatus AS st,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM orders GROUP BY 1, 2),
    rt AS (SELECT pr, CAST(SUM(n_obs) AS BIGINT) AS n_r
           FROM cells GROUP BY pr),
    ct AS (SELECT st, CAST(SUM(n_obs) AS BIGINT) AS n_c
           FROM cells GROUP BY st),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT cells.n_obs, rt.n_r, ct.n_c, tot.n,
               (CAST(cells.n_obs AS DOUBLE) / tot.n)
               * ln(CAST(cells.n_obs AS DOUBLE) * tot.n
                    / (CAST(rt.n_r AS DOUBLE) * ct.n_c)) AS mi_term,
               -(CAST(cells.n_obs AS DOUBLE) / tot.n)
               * ln(CAST(cells.n_obs AS DOUBLE) / tot.n) AS h_term
        FROM cells JOIN rt USING (pr) JOIN ct USING (st) CROSS JOIN tot)
    SELECT MAX(n) AS n_total,
           ROUND(CAST(SUM(CAST(ROUND(mi_term, 12) AS DECIMAL(38, 12)))
                      AS DOUBLE), 6) AS mi_nats,
           ROUND(CAST(SUM(CAST(ROUND(h_term, 12) AS DECIMAL(38, 12)))
                      AS DOUBLE), 6) AS h_joint_nats,
           ROUND(CAST(SUM(CAST(ROUND(mi_term, 12) AS DECIMAL(38, 12)))
                      AS DOUBLE)
                 / CAST(SUM(CAST(ROUND(h_term, 12) AS DECIMAL(38, 12)))
                        AS DOUBLE), 6) AS iqr_normalized
    FROM terms
    """,
    tags=("stats", "information-theory", "mutual-information",
          "contingency", "orders"),
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(priority; status) over the same
    contingency table as q_chi2_independence — the information-theoretic
    association measure (MI is what feature-selection and
    token/label leakage screens in data pipelines actually rank by;
    chi-square is its second-order approximation). Also reports the
    joint entropy and the normalized ratio MI/H (information quality
    ratio).

    Float discipline: each cell term is (n/N)·ln(nN/(n_r·n_c)) — a
    fixed IEEE expression from exact int64 inputs, bit-identical per
    row on both engines; the cross-cell sums are ROUND(,12)-quantized
    DECIMAL(38,12) folds over the enum-bounded cell relation (terms
    are O(1), so the decimal total stays far inside 15 significant
    digits — the q_levene_test budget rule).

    Engine shape: identical to q_chi2_independence — one
    combiner-reduced cell aggregate, broadcast marginals, a 1-row
    fold. Zero-count cells never appear (GROUP BY emits only observed
    pairs), so no ln(0) guard is needed: the 0·ln(0) = 0 convention
    is vacuous here by construction.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"))
    cells = o.groupBy("pr", "st").agg(F.count(F.lit(1)).alias("n_obs"))
    rt = cells.groupBy("pr").agg(F.sum("n_obs").alias("n_r"))
    ct = cells.groupBy("st").agg(F.sum("n_obs").alias("n_c"))
    tot = cells.agg(F.sum("n_obs").alias("n"))
    nod = F.col("n_obs").cast("double")
    mi_term = ((nod / F.col("n"))
               * F.log(nod * F.col("n")
                       / (F.col("n_r").cast("double") * F.col("n_c"))))
    h_term = -(nod / F.col("n")) * F.log(nod / F.col("n"))
    terms = (cells.join(F.broadcast(rt), "pr")
             .join(F.broadcast(ct), "st")
             .crossJoin(F.broadcast(tot))
             .select("n", mi_term.alias("mi_term"),
                     h_term.alias("h_term")))
    fold = lambda c: F.sum(  # noqa: E731
        F.round(F.col(c), 12).cast("decimal(38,12)")).cast("double")
    return terms.agg(
        F.max("n").alias("n_total"),
        F.round(fold("mi_term"), 6).alias("mi_nats"),
        F.round(fold("h_term"), 6).alias("h_joint_nats"),
        F.round(fold("mi_term") / fold("h_term"), 6)
        .alias("iqr_normalized"))


@register(
    "q_cramers_v",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS pr, o_orderstatus AS st,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM orders GROUP BY 1, 2),
    rt AS (SELECT pr, CAST(SUM(n_obs) AS BIGINT) AS n_r
           FROM cells GROUP BY pr),
    ct AS (SELECT st, CAST(SUM(n_obs) AS BIGINT) AS n_c
           FROM cells GROUP BY st),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT pr, st, cells.n_obs, rt.n_r, ct.n_c, tot.n,
               (CAST(cells.n_obs * tot.n - rt.n_r * ct.n_c AS DOUBLE)
                * CAST(cells.n_obs * tot.n - rt.n_r * ct.n_c AS DOUBLE))
               / (CAST(tot.n AS DOUBLE) * rt.n_r * ct.n_c) AS contrib
        FROM cells JOIN rt USING (pr) JOIN ct USING (st) CROSS JOIN tot),
    agg AS (
        SELECT CAST(COUNT(DISTINCT pr) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT st) AS BIGINT) AS c,
               MAX(n) AS n,
               CAST(SUM(CAST(ROUND(contrib, 9) AS DECIMAL(38, 9)))
                    AS DOUBLE) AS chi2
        FROM terms)
    SELECT n AS n_total, r AS n_row_levels, c AS n_col_levels,
           ROUND(sqrt(chi2 / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v,
           ROUND(sqrt(GREATEST(chi2 / n - (r - 1.0) * (c - 1.0) / (n - 1),
                               0.0)
                      / LEAST(r - (r - 1.0) * (r - 1.0) / (n - 1) - 1,
                              c - (c - 1.0) * (c - 1.0) / (n - 1) - 1)),
                 6) AS cramers_v_bias_corrected
    FROM agg
    """,
    tags=("stats", "inference", "effect-size", "cramers-v",
          "contingency", "orders"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size over the priority x status table — the
    magnitude companion to q_chi2_independence's significance
    statistic (a huge corpus makes ANY dependence 'significant'; V
    in [0, 1] says whether it matters), plus the Bergsma
    bias-corrected variant that de-inflates V on small tables.

    Same exact-integer contingency machinery and ROUND(,9) decimal
    fold as the chi-square query; the V formulas are one fixed IEEE
    expression each from the folded chi2 and exact level counts,
    ROUND(,6) on both engines (GREATEST guards the bias-corrected
    numerator at 0, its defined floor).
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"))
    cells = o.groupBy("pr", "st").agg(F.count(F.lit(1)).alias("n_obs"))
    rt = cells.groupBy("pr").agg(F.sum("n_obs").alias("n_r"))
    ct = cells.groupBy("st").agg(F.sum("n_obs").alias("n_c"))
    tot = cells.agg(F.sum("n_obs").alias("n"))
    num = (F.col("n_obs") * F.col("n")
           - F.col("n_r") * F.col("n_c")).cast("double")
    contrib = (num * num) / (F.col("n").cast("double")
                             * F.col("n_r") * F.col("n_c"))
    terms = (cells.join(F.broadcast(rt), "pr")
             .join(F.broadcast(ct), "st")
             .crossJoin(F.broadcast(tot))
             .select("pr", "st", "n_r", "n_c", "n",
                     contrib.alias("contrib")))
    # level counts come from the LEVEL KEYS — distinct marginal totals
    # would collapse two levels whose counts happen to tie
    agg = terms.agg(
        F.count_distinct("pr").alias("r"),
        F.count_distinct("st").alias("c"),
        F.max("n").alias("n"),
        F.sum(F.round(F.col("contrib"), 9).cast("decimal(38,9)"))
        .cast("double").alias("chi2"))
    r, c, n, chi2 = (F.col("r"), F.col("c"), F.col("n"), F.col("chi2"))
    phi2c = F.greatest(chi2 / n - (r - 1.0) * (c - 1.0) / (n - 1),
                       F.lit(0.0))
    kc = F.least(r - (r - 1.0) * (r - 1.0) / (n - 1) - 1,
                 c - (c - 1.0) * (c - 1.0) / (n - 1) - 1)
    return agg.select(
        n.cast("bigint").alias("n_total"),
        r.cast("bigint").alias("n_row_levels"),
        c.cast("bigint").alias("n_col_levels"),
        F.round(F.sqrt(chi2 / (n * F.least(r - 1, c - 1))), 6)
        .alias("cramers_v"),
        F.round(F.sqrt(phi2c / kc), 6)
        .alias("cramers_v_bias_corrected"))
