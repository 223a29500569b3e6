"""q_kfold_stratified guarantees: the fold column is a PARTITION of
the corpus (every doc in exactly one fold) and the round-robin deal
is exactly stratified — within every source, fold counts differ by at
most one. Proven on the underlying assignment (not just the summary
the query returns)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.queries.sampling_stats import _KFOLD_K
from tests.conftest import SF_DIR


def test_kfold_partition_and_balance(spark):
    docs = load_table(spark, SF_DIR, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    assigned = docs.select(
        "doc_id", "source",
        ((F.row_number().over(w) - 1) % _KFOLD_K).alias("fold"))

    n_docs = docs.count()
    # partition: every doc exactly one fold, folds in range
    assert assigned.count() == n_docs
    assert assigned.select("doc_id").distinct().count() == n_docs
    rng = assigned.agg(F.min("fold"), F.max("fold")).first()
    assert rng[0] == 0 and rng[1] == _KFOLD_K - 1

    # exact stratification: per source, fold counts differ by <= 1
    per = assigned.groupBy("source", "fold").count()
    skew = (per.groupBy("source")
            .agg((F.max("count") - F.min("count")).alias("skew"),
                 F.count(F.lit(1)).alias("n_folds")))
    bad = skew.where((F.col("skew") > 1)
                     | (F.col("n_folds") > _KFOLD_K)).collect()
    assert not bad, f"stratification broken: {bad[:3]}"

    # determinism: a second assignment is identical
    again = docs.select(
        "doc_id", ((F.row_number().over(w) - 1) % _KFOLD_K).alias("fold2"))
    diff = (assigned.join(again, "doc_id")
            .where(F.col("fold") != F.col("fold2")).count())
    assert diff == 0
