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


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column across fixture generations.

    Guarantees two columns regardless of how the parquet encodes time:
    ``ts`` as a session-TZ (UTC) TIMESTAMP and ``ts_ns`` as bigint
    epoch-nanoseconds. Handles all encodings the driver has shipped:

    - TIMESTAMP(NANOS) read as long via ``nanosAsLong`` (early
      fixtures): integer DIV, not ``/`` — epoch-nanos exceed double's
      53-bit exact range, so float division drifts by ±1µs;
    - TIMESTAMP_NTZ micros (current fixtures): cast to TIMESTAMP is
      value-preserving because the session timezone is pinned UTC;
    - plain TIMESTAMP: derive ``ts_ns`` only.

    Works identically on batch and streaming DataFrames (pure column
    expressions, no actions).
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns DIV 1000")))
        )
    if ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if dict(df.dtypes).get("ts") == "timestamp":
        df = df.withColumn("ts_ns", F.unix_micros("ts") * F.lit(1000))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a typed DataFrame.

    ``events.ts`` arrives either as TIMESTAMP(NANOS)-as-long or as
    TIMESTAMP_NTZ micros depending on fixture generation; both are
    normalized to (``ts`` TIMESTAMP, ``ts_ns`` bigint) by
    :func:`normalize_event_ts`.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def widen_unsplittable_scan(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Restore scan parallelism lost to unsplittable input files.

    The fixture tables are single-row-group parquet, so every scan
    plans as ONE task — and any CPU-dense work fused into the scan
    stage (shingle explodes, per-char windows, md5 chains, entropy /
    comparator UDFs) runs serially on one core while the other 31
    idle (optimization guide §2.5: "one huge unsplittable file ...
    repartition immediately after the read"). This repartitions the
    relation to ``defaultParallelism`` BY THE GIVEN KEY (hash, no
    sort-before-repartition cost, deterministic under retries) with
    an EXPLICIT partition count so AQE cannot re-coalesce the
    CPU-dense stage back to one partition on byte-size grounds.

    Scale posture: a guarded no-op. When the input is properly split
    (multi-row-group files, many files — the 100 TB case) the scan
    plans >= defaultParallelism/4 splits and NO shuffle is added; the
    repartition only fires for inputs whose file layout defeats
    splitting, where one narrow shuffle of the source rows buys back
    the whole cluster for the expensive map stage.

    Guard mechanics (round-11 advice items 1+9): the split estimate
    comes from ``df.inputFiles()`` plus driver-side file sizes — NOT
    ``df.rdd.getNumPartitions()``, which compiled the plan to an RDD
    on every invocation of every widened query — and widening only
    fires when the estimate is far below defaultParallelism (< dp/4),
    so a 16-split scan on 32 cores is left alone instead of paying a
    full shuffle of the source bytes for a 2x parallelism bump. The
    estimate is cached per file set (file listings are stable within
    a session; fixture regeneration changes the paths' sizes, not
    their names — and a wrong cache entry only toggles a performance
    hint, never correctness).
    """
    spark = df.sparkSession
    dp = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if len(files) >= max(1, dp // 4):
        return df
    cache = getattr(widen_unsplittable_scan, "_splits", None)
    if cache is None:
        cache = widen_unsplittable_scan._splits = {}
    fkey = tuple(sorted(files))
    est = cache.get(fkey)
    if est is None:
        try:
            jvm = spark._jvm
            conf = spark._jsc.hadoopConfiguration()
            mpb = int(jvm.org.apache.spark.network.util.JavaUtils
                      .byteStringAsBytes(spark.conf.get(
                          "spark.sql.files.maxPartitionBytes", "128m")))
            est = 0
            for f in files:
                p = jvm.org.apache.hadoop.fs.Path(f)
                size = p.getFileSystem(conf).getFileStatus(p).getLen()
                est += max(1, -(-size // mpb))  # ceil
        except Exception:   # unlistable source: assume unsplittable
            est = len(files)
        cache[fkey] = est
    if est >= max(1, dp // 4):
        return df
    return df.repartition(dp, F.col(key))


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


def audit_workdir(name: str) -> str:
    """Per-query scratch dir for write-then-read AUDIT plan builders.

    The audit builders (q_schema_evolution_merge / q_compaction_roundtrip
    / q_mrout_connector_roundtrip) must leave their written files alive
    for the returned plan's lifetime, so they cannot rmtree in a
    ``finally`` like the shipped query fns do. mkdtemp leaked two dirs
    per query per audit run (explain_audit's executed-AQE pass rebuilds
    every plan a second time — round-9 advice item): instead, each
    builder now reuses ONE directory keyed by query name under a
    PER-PROCESS root (mkdtemp once per process), so reruns within a
    process overwrite in place (every write inside is
    mode("overwrite")) while concurrent processes — explain_audit
    running beside bench/pytest — never share a path (a fixed
    world-shared root let one process's atexit rmtree delete plans
    the other was still reading, and was a squatting hazard on
    multi-user machines — round-10 advice item). The root is removed
    at process exit.
    """
    import atexit
    import shutil
    import tempfile

    root = getattr(audit_workdir, "_root", None)
    if root is None:
        root = tempfile.mkdtemp(prefix="mmr_audit_plans_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        audit_workdir._root = root
    work = os.path.join(root, name)
    os.makedirs(work, exist_ok=True)
    return work
