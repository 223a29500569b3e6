"""Bucketed-table write path: pre-shuffle once, join forever free.

The reference shuffles every job (`mr/worker.go:125-153` rewrites the
JSON intermediate files on each run). For repeated joins/dedups over
the same corpus, Spark's answer is bucketing: write the table hash-
partitioned AND sorted by the join key (``bucketBy`` + ``sortBy`` via
``saveAsTable``), and every later equi-join or aggregation on that
key reads the bucket layout from the catalog and skips both the
Exchange and (with sortBy) the Sort — a one-time shuffle amortized
across every subsequent query. At 100 TB this is the difference
between re-shuffling the full fact table per run and never shuffling
it again.

``tests/test_bucketed.py`` asserts the join plan is actually
exchange-free on both sides (autoBroadcast disabled so the assert
can't be satisfied by a broadcast).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_N_BUCKETS = 8
_BUCKET_ROOT = os.path.join(tempfile.gettempdir(), "mmr_bucketed")


def write_bucketed(spark: SparkSession, df: DataFrame, name: str,
                   n_buckets: int, *keys: str) -> DataFrame:
    """Persist ``df`` as an external parquet table bucketed and
    sorted by ``keys``, and return the catalog-backed read-back.

    The write performs the one-time shuffle (one file set per bucket);
    the catalog records (keys, n_buckets) so Catalyst plans later
    equi-joins/aggs on ``keys`` without an Exchange when both sides
    share the bucket spec."""
    path = os.path.join(_BUCKET_ROOT, name)
    (df.write.mode("overwrite").format("parquet")
     .bucketBy(n_buckets, *keys).sortBy(*keys)
     .option("path", path)
     .saveAsTable(name))
    return spark.table(name)


def bucketed_fixture(spark: SparkSession, sf_dir: str, table: str,
                     key: str, n_buckets: int = _N_BUCKETS) -> DataFrame:
    """Bucketed copy of a fixture table; the table name encodes the
    sf dir so different scale factors never alias. If this session
    already wrote the table, reuse it — amortizing the one-time
    shuffle across queries is the entire point of bucketing (the
    fixtures are immutable, so staleness cannot arise)."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    name = f"mmr_{table}_{key}_b{n_buckets}_{tag}"
    if spark.catalog.tableExists(name) \
            and os.path.isdir(os.path.join(_BUCKET_ROOT, name)):
        return spark.table(name)
    return write_bucketed(spark, load_table(spark, sf_dir, table),
                          name, n_buckets, key)


@register(
    "q_bucketed_join_noshuffle",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
               AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    tags=("bucketing", "join", "tpch"),
)
def q_bucketed_join_noshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority via a bucket-colocated join:
    ``lineitem`` and ``orders`` are first written bucketed+sorted on
    the order key (the one-time shuffle), then the fact-fact join
    reads both bucket layouts and needs no Exchange and no Sort —
    verified by plan assertion in tests/test_bucketed.py. Only the
    final small aggregation shuffles (one row per priority)."""
    li = bucketed_fixture(spark, sf_dir, "lineitem", "l_orderkey")
    orders = bucketed_fixture(spark, sf_dir, "orders", "o_orderkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )
