"""distributed_prefix_sum must equal the plain global-window running
sum at any partition count — the prefix-sum sibling of
tests/test_vocab_rank.py — and q_shard_pack_cumsum's shards must be
the contiguous, budget-respecting partition of the corpus the
next-fit semantics promise."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_mapreduce_spark.functions.ranking import distributed_prefix_sum
from my_mapreduce_spark.io import load_table
from tests.conftest import SF_DIR


def _dist_rows(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    cs = distributed_prefix_sum(
        docs, [F.col("doc_id")], F.col("n_chars"), out="cum")
    return {(r.doc_id, int(r.cum)) for r in cs.collect()}


def test_prefix_sum_equals_global_window(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {(r.doc_id, int(r.cum)) for r in
            docs.withColumn("cum", F.sum("n_chars").over(w)).collect()}
    assert _dist_rows(spark) == want


def test_prefix_sum_partition_count_invariant(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = _dist_rows(spark)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        many = _dist_rows(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert few == many


def test_shard_pack_contiguous_and_budgeted(spark):
    from my_mapreduce_spark.queries.stats_ext import (
        _SHARD_TARGET,
        q_shard_pack_cumsum,
    )

    docs = load_table(spark, SF_DIR, "documents")
    n_docs, total_chars, max_doc = docs.agg(
        F.count(F.lit(1)), F.sum("n_chars"), F.max("n_chars")).first()
    shards = sorted(q_shard_pack_cumsum(spark, SF_DIR).collect(),
                    key=lambda r: r.shard)
    assert len(shards) >= 2, "fixture must exercise >1 shard"
    # partition: counts and chars add up, doc-id ranges are
    # contiguous and non-overlapping in shard order
    assert sum(r.n_docs for r in shards) == n_docs
    assert sum(r.total_chars for r in shards) == total_chars
    for a, b in zip(shards, shards[1:]):
        assert a.last_doc < b.first_doc
    # next-fit budget: a shard only exceeds the target by less than
    # its own final document (the doc that crossed the boundary)
    for r in shards:
        assert r.total_chars < _SHARD_TARGET + max_doc
