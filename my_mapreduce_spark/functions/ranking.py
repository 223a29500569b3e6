"""Distributed global ranking — the scale-safe replacement for
``row_number() OVER (ORDER BY ...)`` with no partition spec, which
drags the whole relation through one task (the smell
tools/explain_audit.py's global-window check flags).

Two-pass range rank: (1) ``repartitionByRange`` on the rank order,
so partition p holds exactly the rows ranking before partition p+1;
row_number WITHIN each partition is shuffle-parallel. (2)
per-partition row counts — at most ``spark.sql.shuffle.partitions``
rows — are prefix-summed into base offsets and broadcast back.
Global rank = partition base + local rank. The only global-order
window in the plan runs over the partition-counts relation, bounded
by a conf, never by data.

Used by q_vocab_rank_scalable (vocabulary rank) and q_window_ntile
(exact quantile assignment); equivalence to the plain global window
and partition-count invariance are pinned by tests/test_vocab_rank.py
and tests/test_explain_audit.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_prefix_sum(df: DataFrame, order: list[Column],
                           value: Column, out: str = "cumsum") -> DataFrame:
    """Append a global inclusive running sum of ``value`` in
    ``order`` without any data-sized single-partition window — the
    prefix-sum sibling of :func:`distributed_row_number`, same
    two-pass shape: (1) ``repartitionByRange`` on the order, local
    running sums within each range partition are shuffle-parallel;
    (2) per-partition TOTALS (≤ ``spark.sql.shuffle.partitions``
    rows) are prefix-summed into broadcast base offsets; global
    cumsum = partition base + local running sum. ``order`` must be
    a total order (include a unique key) for a deterministic result.

    The primitive behind byte/token-budgeted shard packing
    (q_shard_pack_cumsum): Spark's own
    ``sum() OVER (ORDER BY ...)`` with no partition spec drags the
    relation through one task — the exact smell
    tools/explain_audit.py flags."""
    ranged = (df.repartitionByRange(*order)
              .withColumn("__pid", F.spark_partition_id()))
    local_w = (Window.partitionBy("__pid").orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, 0))
    local = ranged.withColumn("__lsum", F.sum(value).over(local_w))
    pid_sums = ranged.groupBy("__pid").agg(F.sum(value).alias("__s"))
    prior = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1)
    base = pid_sums.select(
        "__pid",
        F.coalesce(F.sum("__s").over(prior),
                   F.lit(0).cast("long")).alias("__base"))
    return (local.join(F.broadcast(base), "__pid")
            .withColumn(out, F.col("__base") + F.col("__lsum"))
            .drop("__pid", "__lsum", "__base"))


def distributed_row_number(df: DataFrame, order: list[Column],
                           out: str = "rank",
                           total_col: str | None = None) -> DataFrame:
    """Append a global 1-based ``out`` column ranking ``df`` by
    ``order`` (a list of Column sort expressions, ``.desc()``
    allowed) without any data-sized single-partition window.

    Deterministic iff ``order`` is a total order (no ties — include
    a unique key as the last sort column); ties that straddle a
    range-partition boundary would otherwise receive an arbitrary
    (though still valid 1..N) relative numbering.

    When ``total_col`` is given, the total row count is attached as
    an extra column via a 1-row broadcast (the scalar-subquery
    shape) — computed from the same per-partition counts, no second
    scan. Closed-form quantile assignment (ntile) follows from
    (rank, total) — see q_window_ntile.
    """
    ranged = (df.repartitionByRange(*order)
              .withColumn("__pid", F.spark_partition_id()))
    local_w = Window.partitionBy("__pid").orderBy(*order)
    local = ranged.withColumn("__lrank", F.row_number().over(local_w))
    pid_counts = ranged.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt"))
    prior = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1)
    base = pid_counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(prior), F.lit(0)).alias("__base"))
    result = (local.join(F.broadcast(base), "__pid")
              .withColumn(out, F.col("__base") + F.col("__lrank")))
    if total_col is not None:
        total = pid_counts.agg(
            F.sum("__cnt").cast("bigint").alias(total_col))
        result = result.crossJoin(F.broadcast(total))
    return result.drop("__pid", "__lrank", "__base")
