"""Custom Python DataSource (`mrout`) for the reference's text output
format: partition-per-file parallelism, declared schema, and
source-level key-filter pushdown (pushFilters)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from my_mapreduce_spark.mapreduce import write_text_output
from my_mapreduce_spark.sources_custom import register_mrout


def _demo(spark, path, n_reduce=3):
    df = spark.createDataFrame(
        [("apple", "3"), ("banana", "x 7"), ("cherry", "1"),
         ("apricot", "9"), ("avocado", "2")],
        "key string, value string")
    write_text_output(df, path, n_reduce=n_reduce)
    register_mrout(spark)
    return df


def test_mrout_roundtrip_and_partitioning(spark, tmp_path):
    path = str(tmp_path / "out")
    df = _demo(spark, path)
    back = spark.read.format("mrout").load(path)
    assert back.schema.simpleString() == "struct<key:string,value:string>"
    # full roundtrip, including a value containing a space (the
    # reference writes "%v %v" — only the FIRST space is the split)
    assert sorted((r.key, r.value) for r in back.collect()) == \
        sorted((r.key, r.value) for r in df.collect())
    # one input partition per reduce file = distributed read
    n_files = len(glob.glob(path + "/part-*"))
    assert back.rdd.getNumPartitions() == n_files >= 2


def test_mrout_filter_pushdown_reaches_source(spark, tmp_path):
    path = str(tmp_path / "out")
    _demo(spark, path)
    back = spark.read.format("mrout").load(path)
    for cond, expect in [
        (F.col("key") == "apple", {"apple"}),
        (F.col("key").startswith("a"), {"apple", "apricot", "avocado"}),
        (F.col("key").isin("cherry", "banana"), {"cherry", "banana"}),
    ]:
        q = back.where(cond)
        got = {r.key for r in q.collect()}
        assert got == expect, (cond, got)
        # the predicate was absorbed by pushFilters: the executed plan
        # has NO post-scan Filter node — the source did the pruning
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Filter (" not in plan, plan  # ("RuntimeFilters: []" is scan metadata)


def test_mrout_unsupported_filter_stays_in_spark(spark, tmp_path):
    path = str(tmp_path / "out")
    _demo(spark, path)
    back = spark.read.format("mrout").load(path)
    # value-column predicates are NOT pushed (reader only handles key)
    q = back.where(F.col("value") == "3")
    assert {r.key for r in q.collect()} == {"apple"}
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Filter (" in plan  # evaluated post-scan by Spark
