"""Global sort via range partitioning — the terasort shape.

A 100 TB global sort is repartitionByRange (sampled boundaries) +
sortWithinPartitions; a single-task orderBy is the anti-pattern the
explain audit's global-window gate catches elsewhere. These pin the
engine contract that makes the distributed form A sort at all:
partition key ranges are pairwise non-overlapping and internally
sorted, so concatenating partitions in order IS the total order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from tests.conftest import SF_DIR

_N_PARTS = 8


def _ranged(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice")
    return (li.repartitionByRange(_N_PARTS, "l_extendedprice")
            .sortWithinPartitions("l_extendedprice"))


def test_partition_ranges_disjoint_and_sorted(spark):
    df = _ranged(spark)
    stats = (df.withColumn("pid", F.spark_partition_id())
             .groupBy("pid")
             .agg(F.min("l_extendedprice").alias("lo"),
                  F.max("l_extendedprice").alias("hi"),
                  F.count(F.lit(1)).alias("n"))
             .orderBy("pid").collect())
    assert len(stats) >= 2  # data actually spread over partitions
    for a, b in zip(stats, stats[1:]):
        assert a.hi <= b.lo, (a, b)  # ranges non-overlapping, ordered


def test_within_partition_sorted(spark):
    df = _ranged(spark)

    def check(it):
        prev = None
        bad = 0
        for row in it:
            v = row.l_extendedprice
            if prev is not None and v < prev:
                bad += 1
            prev = v
        yield bad

    assert sum(df.rdd.mapPartitions(check).collect()) == 0


def test_concatenated_partitions_equal_global_sort(spark):
    df = _ranged(spark)
    # collecting partition-by-partition in pid order must equal the
    # driver-side global sort of the same column (small fixture only)
    got = [r.l_extendedprice
           for r in df.select("l_extendedprice").collect()]
    assert got == sorted(got)
