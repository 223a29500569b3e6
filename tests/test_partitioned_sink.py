"""The partitioned sink must actually prune: reading one event_type
from the Hive layout has to resolve the filter against the directory
listing (PartitionFilters) — never as a data filter over all files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_mapreduce_spark.queries.bucketed import partitioned_events
from tests.conftest import SF_DIR


def test_partition_filter_reaches_listing(spark):
    path = partitioned_events(spark, SF_DIR)
    df = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the predicate must appear among PartitionFilters, not PushedFilters
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("event_type" in ln for ln in pf), pf


def test_pruned_scan_reads_one_partition(spark):
    path = partitioned_events(spark, SF_DIR)
    df = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    # count equality with a direct filter over the unpartitioned source
    from my_mapreduce_spark.io import load_table
    want = (load_table(spark, SF_DIR, "events")
            .where(F.col("event_type") == "purchase").count())
    assert df.count() == want


def test_roundtrip_preserves_all_types(spark):
    path = partitioned_events(spark, SF_DIR)
    from my_mapreduce_spark.io import load_table
    got = dict(spark.read.parquet(path)
               .groupBy("event_type").count().collect())
    want = dict(load_table(spark, SF_DIR, "events")
                .groupBy("event_type").count().collect())
    assert got == want
