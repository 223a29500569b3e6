"""Typed loaders for the fixture star schema (FIXTURES.md §B).

The reference's only source is "one whole local text file per map
task" (``mr/worker.go:111-123``); this engine's sources are columnar
parquet scans that Catalyst can push filters/projections into. At
100 TB the scan is the dominant cost — everything here is a plain
``spark.read.parquet`` so pushdown, row-group pruning, and partition
pruning stay available. Do not materialize or collect here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimension tables that should always be broadcast in joins at
# any scale factor (region=5/nation=25 rows fixed; supplier tiny in
# the fixture). Used by queries to hint F.broadcast explicitly rather
# than trusting autoBroadcastJoinThreshold stats.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_runtime_confs(spark: SparkSession) -> None:
    """Queries may run on a caller-provided SparkSession (the driver
    harness builds its own); assert the correctness-critical dynamic
    confs on it rather than trusting our session factory was used."""
    from my_mapreduce_spark.session import _REQUIRED_CONFS

    for key, val in _REQUIRED_CONFS.items():
        if spark.conf.get(key, None) != val:
            spark.conf.set(key, val)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a typed DataFrame.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, unreadable by Spark's
    vectorized reader; with ``spark.sql.legacy.parquet.nanosAsLong``
    it arrives as a long which we convert to a microsecond timestamp
    (column ``ts``), keeping the raw nanos as ``ts_ns``.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV, not `/`: epoch-nanos exceed double's 53-bit
        # exact integer range, so float division drifts by ±1µs.
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns DIV 1000")))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_file_bytes: int = 128 << 20) -> int:
    """Compact a small-files parquet dataset into ~target-sized files.

    Streaming sinks and fine-grained ingestion leave thousands of
    KB-sized files; at 100 TB the resulting driver listing cost and
    per-file open overhead dominate scans. This sizes the output
    file count from the SOURCE byte size (via the Hadoop FS API, so
    it works on any supported filesystem, not just local) and
    rewrites in one round-robin repartition — no shuffle key needed,
    just even file sizes. Returns the output file count.
    """
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n
