"""Lexical statistics and smoothed language modeling — round-4
continuation batch (SURVEY §2D text-analysis depth).

- ``q_kneser_ney_bigram``: absolute-discount Kneser–Ney bigram
  probabilities (the n-gram-LM smoothing standard; Chen & Goodman
  1999) for the corpus's most frequent bigrams — the exact
  continuation-count formulation, not an approximation.
- ``q_lexical_richness``: per-source lexical-richness panel —
  type-token ratio, hapax share, Herdan's C — the vocabulary-side
  quality screen that separates template-generated sources (low
  TTR, few hapax) from natural text before mixing.

Exactness: every probability/ratio is a closed form of exact bigint
counts (token counts, type counts, continuation counts); floats
appear only in the final rounded expression, identical on both
engines.

Scale shape (100 TB): bigrams come from zipping each token array
against its own shift (array-local, no positional self-join); all
relations after that are vocabulary-bounded hash aggregates with
map-side partials, and the final top-k is TakeOrderedAndProject —
the q_top_bigrams / q_bigram_pmi idiom extended with continuation
counts. Reference parity: extends B1 wc's tokenizer contract
(mrapps/wc.go:20-24) into LM estimation; counts remain one
map + one reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.functions.text import tokens
from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_KN_D = 0.75      # absolute discount (the Chen & Goodman default)
_KN_TOP = 20      # report the top-k bigrams by raw count

_TOKENS_CTE = """
    t AS (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                           x -> x <> '') AS ws
        FROM documents)
"""


@register(
    "q_kneser_ney_bigram",
    oracle=f"""
    WITH {_TOKENS_CTE},
    bg AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM t, UNNEST(range(1, len(ws))) AS u(i)),
    c_ab AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
             FROM bg GROUP BY 1, 2),
    c_a AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c_w1,
                   CAST(COUNT(*) AS BIGINT) AS n_follow
            FROM c_ab GROUP BY 1),
    c_b AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_precede
            FROM c_ab GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c_ab)
    SELECT w1, w2, c AS c_bigram,
           ROUND((GREATEST(c - {_KN_D}, 0.0)
                  + {_KN_D} * n_follow * (n_precede * 1.0 / n_types))
                 / c_w1, 6) AS p_kn
    FROM c_ab JOIN c_a USING (w1) JOIN c_b USING (w2) CROSS JOIN tot
    ORDER BY c DESC, w1, w2 LIMIT {_KN_TOP}
    """,
    tags=("text", "language-model", "kneser-ney", "smoothing", "topk"),
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities for the corpus's
    20 most frequent bigrams: p_kn(w2|w1) = (max(c(w1w2)-D, 0) +
    D * N1+(w1 .) * p_cont(w2)) / c(w1 .), with the continuation
    probability p_cont(w2) = N1+(. w2) / N1+(. .) — "how many
    DISTINCT contexts does w2 follow", the correction that stops
    high-count-but-single-context words (the "San Francisco"
    effect) from dominating backoff mass. D = 0.75 fixed. This is
    the smoothing a perplexity-filter LM (CCNet-style corpus
    scoring) actually trains, one level above q_bigram_logprob's
    raw MLE.

    All four count relations (bigram counts, left/right
    continuation type counts, total type count) are exact bigints;
    p_kn is one final closed form. Plan: array-local bigram
    generation (zip against shift), three vocabulary-bounded hash
    aggs joined back on their own grouping keys (co-located
    shuffles), the 1-row type total broadcast (scalar-subquery
    shape), and a TakeOrderedAndProject top-20 — linear in
    tokens at 100 TB, never corpus x vocab.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = tokens()
    n1 = F.greatest(F.size(w) - 1, F.lit(0))
    bg = (docs.select(
        F.explode(F.zip_with(F.slice(w, 1, n1), F.slice(w, 2, n1),
                             lambda x, y: F.struct(x.alias("w1"),
                                                   y.alias("w2"))))
        .alias("b")).select("b.w1", "b.w2"))
    c_ab = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c_a = c_ab.groupBy("w1").agg(F.sum("c").alias("c_w1"),
                                 F.count(F.lit(1)).alias("n_follow"))
    c_b = c_ab.groupBy("w2").agg(F.count(F.lit(1)).alias("n_precede"))
    tot = c_ab.agg(F.count(F.lit(1)).alias("n_types"))
    p_kn = ((F.greatest(F.col("c") - _KN_D, F.lit(0.0))
             + _KN_D * F.col("n_follow")
             * (F.col("n_precede") * 1.0 / F.col("n_types")))
            / F.col("c_w1"))
    return (c_ab.join(c_a, "w1").join(c_b, "w2")
            .crossJoin(F.broadcast(tot))
            .select("w1", "w2", F.col("c").alias("c_bigram"),
                    F.round(p_kn, 6).alias("p_kn"))
            .orderBy(F.col("c_bigram").desc(), "w1", "w2")
            .limit(_KN_TOP))


@register(
    "q_lexical_richness",
    oracle=f"""
    WITH {_TOKENS_CTE},
    tok AS (SELECT source, UNNEST(ws) AS w FROM t),
    wc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    s AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
        FROM wc GROUP BY source)
    SELECT source, n_tokens, n_types, n_hapax,
           ROUND(n_types * 1.0 / n_tokens, 6) AS ttr,
           ROUND(n_hapax * 1.0 / n_types, 6) AS hapax_share,
           ROUND(ln(n_types) / ln(n_tokens), 6) AS herdan_c
    FROM s
    """,
    tags=("text", "quality", "vocabulary", "richness"),
)
def q_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical-richness panel: type-token ratio, hapax-
    legomenon share (fraction of the vocabulary seen exactly once),
    and Herdan's C (log-vocab over log-tokens, the size-robust
    richness exponent). Template-generated or heavily boilerplated
    sources show depressed TTR and hapax share at normal Herdan C —
    a vocabulary-side duplicate signal that fires even when no two
    documents are near-dups (complementing q_doc_repetition, which
    is within-document, and q_zipf_slope, which is corpus-global).

    Plan: one explode -> (source, token) hash-agg (map-side
    partials) -> one per-source aggregate over the vocabulary-
    bounded count relation. Two shuffles, both key-bounded; ratios
    are closed forms of exact bigints. At 100 TB this is the
    cheapest per-source screen in the hygiene suite.
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select("source", F.explode(tokens()).alias("w"))
          .groupBy("source", "w").agg(F.count(F.lit(1)).alias("c")))
    s = wc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"))
    return s.select(
        "source", "n_tokens", "n_types", "n_hapax",
        F.round(F.col("n_types") * 1.0 / F.col("n_tokens"), 6).alias("ttr"),
        F.round(F.col("n_hapax") * 1.0 / F.col("n_types"), 6)
        .alias("hapax_share"),
        F.round(F.log(F.col("n_types")) / F.log(F.col("n_tokens")), 6)
        .alias("herdan_c"))


_NEG_TOP = 30          # report the 30 most frequent tokens
_NEG_PER_M = 1_000_000  # allocation granularity: draws per million


@register(
    "q_negative_sampling_table",
    oracle=f"""
    WITH {_TOKENS_CTE},
    tok AS (SELECT UNNEST(ws) AS w FROM t),
    wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
    wt AS (SELECT w, c,
                  CAST(ROUND(POW(c, 0.75) * 1000) AS BIGINT) AS w3
           FROM wc),
    tot AS (SELECT CAST(SUM(w3) AS BIGINT) AS wsum FROM wt)
    SELECT w, c,
           CAST({_NEG_PER_M} * w3 // wsum AS BIGINT) AS alloc_per_million,
           ROUND(w3 * 1.0 / wsum, 6) AS p_neg
    FROM wt CROSS JOIN tot
    ORDER BY c DESC, w LIMIT {_NEG_TOP}
    """,
    tags=("text", "language-model", "negative-sampling", "word2vec"),
)
def q_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative-sampling table: each token's draw
    probability is proportional to count^0.75 (Mikolov et al. 2013
    — the exponent that damps stopword dominance while keeping
    frequent words frequent), materialized as an exact integer
    allocation out of one million draws — the table a skip-gram
    trainer (q_skipgram_cooc's consumer) samples negatives from.

    Exactness: the damped weight is integer-milli-scaled ONCE per
    token (round(c^0.75 * 1000) — pow on an exact integer, no
    accumulation), so the normalizer is an exact bigint SUM and the
    allocation is exact bigint division; p_neg is the same ratio
    rounded for display. No float ever accumulates.

    Plan: one token scan -> vocabulary-bounded count agg -> the
    1-row weight total broadcast (scalar-subquery shape) -> the
    TakeOrderedAndProject top-30. Linear in tokens at 100 TB; the
    sampling table itself is vocabulary-sized and would be written
    once, then broadcast to trainer workers.
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(tokens()).alias("w"))
          .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    wt = wc.select("w", "c",
                   F.round(F.pow(F.col("c"), 0.75) * 1000)
                   .cast("bigint").alias("w3"))
    tot = wt.agg(F.sum("w3").alias("wsum"))
    return (wt.crossJoin(F.broadcast(tot))
            .select("w", "c",
                    (F.lit(_NEG_PER_M) * F.col("w3") / F.col("wsum"))
                    .cast("bigint").alias("alloc_per_million"),
                    F.round(F.col("w3") * 1.0 / F.col("wsum"), 6)
                    .alias("p_neg"))
            .orderBy(F.col("c").desc(), "w")
            .limit(_NEG_TOP))
