"""The reference's application queries (SURVEY.md §2B), Spark-first.

These are the DataFrame-native fast paths for the four real queries
in the reference's ``mrapps/`` plugin library, run over the
``documents`` fixture (each row plays one input file; the "filename"
is ``source || '-' || doc_id`` per FIXTURES.md §A). The
``mapreduce()`` compat API in :mod:`my_mapreduce_spark.mapreduce`
can express the same four with literal Map/Reduce closures — the
golden tests compare both against a sequential Python reference —
but these versions stay entirely JVM-side: tokenization, explode,
distinct, count and the sorted-join aggregates are all Catalyst
expressions inside whole-stage codegen, with map-side partial
aggregation where the semantics are algebraic (wc, early_exit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

# Tokenizer parity with the reference's Map: split on runs of
# non-letters (Go ``unicode.IsLetter`` at mrapps/wc.go:23 — a Unicode
# letter class, hence \p{L}, not [a-zA-Z]).
_NON_LETTER = r"[^\p{L}]+"


def _doc_name():
    return F.concat_ws("-", F.col("source"), F.col("doc_id"))


def _words(docs: DataFrame) -> DataFrame:
    """(doc, word) pairs — the wc/indexer map output (mrapps/wc.go:21-34)."""
    return (
        docs.select(_doc_name().alias("doc"),
                    F.explode(F.split(F.col("text"), _NON_LETTER)).alias("word"))
        .where(F.col("word") != "")
    )


@register(
    "wc_word_count",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT UNNEST(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("reference-parity", "text"),
)
def wc_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 word count (mrapps/wc.go:21-42): token → frequency.

    The reference shuffles every (word,"1") pair; here the count is
    algebraic so Spark partially aggregates map-side and the shuffle
    moves only distinct words per partition.
    """
    docs = load_table(spark, sf_dir, "documents")
    return _words(docs).groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "indexer_inverted_index",
    oracle="""
    WITH w AS (
        SELECT DISTINCT source || '-' || doc_id AS doc, word
        FROM (SELECT source, doc_id,
                     UNNEST(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
              FROM documents)
        WHERE word <> ''
    )
    SELECT word,
           COUNT(*)                              AS doc_count,
           string_agg(doc, ',' ORDER BY doc)     AS doc_list
    FROM w GROUP BY word
    """,
    tags=("reference-parity", "text"),
)
def indexer_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 inverted index (mrapps/indexer.go:21-40): word →
    (document frequency, sorted comma-joined doc list).

    The reference dedups words per doc map-side with a Go set
    (indexer.go:22-27) and sorts doc lists inside reduce
    (indexer.go:38); here ``distinct()`` + ``array_sort`` keep both
    steps JVM-side and deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        _words(docs).distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("doc_count"),
             F.array_join(F.array_sort(F.collect_list("doc")), ",").alias("doc_list"))
    )


@register(
    "early_exit_file_count",
    oracle="""
    SELECT source AS filename, COUNT(*) AS cnt
    FROM documents GROUP BY source
    """,
    tags=("reference-parity",),
)
def early_exit_file_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 per-file count (mrapps/early_exit.go:19-36), at the
    granularity the fixture supports: documents per source."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy(F.col("source").alias("filename"))
            .agg(F.count(F.lit(1)).alias("cnt")))


@register(
    "concat_agg",
    oracle="""
    WITH kv AS (
        SELECT 'a' AS key, source || '-' || doc_id AS value FROM documents
        UNION ALL
        SELECT 'b', CAST(length(source || '-' || doc_id) AS VARCHAR) FROM documents
        UNION ALL
        SELECT 'c', CAST(n_chars AS VARCHAR) FROM documents
        UNION ALL
        SELECT 'd', 'xyzzy' FROM documents
    )
    SELECT key, string_agg(value, ' ' ORDER BY value) AS value
    FROM kv GROUP BY key
    """,
    tags=("reference-parity",),
)
def concat_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/B4 crash/nocrash query (mrapps/nocrash.go:28-49, minus the
    fault injection): per doc emit 4 fixed keys a-d carrying
    (docname, len(docname), content length, "xyzzy"); reduce = sorted
    space-join of each key's complete value list.

    This is the reference's worst-case skew motif — the whole corpus
    lands on 4 keys (SURVEY §7). The parity semantics force a
    non-algebraic collect per key; the scale-safe variant of this
    shape is a two-level sorted-substring merge, which the engine
    reserves for when value lists exceed executor memory.
    """
    docs = load_table(spark, sf_dir, "documents")
    doc = _doc_name()
    kv = docs.select(F.explode(F.array(
        F.struct(F.lit("a").alias("key"), doc.alias("value")),
        F.struct(F.lit("b").alias("key"), F.length(doc).cast("string").alias("value")),
        F.struct(F.lit("c").alias("key"), F.col("n_chars").cast("string").alias("value")),
        F.struct(F.lit("d").alias("key"), F.lit("xyzzy").alias("value")),
    )).alias("kv")).select("kv.key", "kv.value")
    return (kv.groupBy("key")
            .agg(F.array_join(F.array_sort(F.collect_list("value")), " ").alias("value")))
