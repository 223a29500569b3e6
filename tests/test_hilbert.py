"""Hilbert curve properties the layout audit's pruning claim rests
on: the unrolled xy2d recurrence is a BIJECTION onto [0, 4^bits) and
consecutive curve positions are grid-ADJACENT (|dx|+|dy| = 1) — the
locality property Morton order lacks (its quadrant seams jump
diagonally across the key space), and the reason Hilbert buckets
make tighter hyper-rectangles than q_zorder_layout's at the same bit
budget."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_mapreduce_spark.queries.bucketed import _H_BITS, _hilbert_frame


def test_hilbert_bijection_and_adjacency(spark):
    n = 1 << _H_BITS
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("ga"),
        (F.col("id") / n).cast("long").alias("gb"))
    out = (_hilbert_frame(grid, "ga", "gb")
           .select("ga", "gb", "_hilbert")
           .toPandas().sort_values("_hilbert").reset_index(drop=True))
    # bijection: every curve position hit exactly once
    assert out["_hilbert"].tolist() == list(range(n * n))
    # adjacency: each step moves exactly one grid cell
    step = (out["ga"].diff().abs() + out["gb"].diff().abs()).iloc[1:]
    assert (step == 1).all()


def test_hilbert_tighter_than_morton_spans(spark):
    """At the same 8-bit grid and 256-bucket budget, the mean bucket
    bounding-box area over a uniform grid should be no worse for
    Hilbert than Morton (it is strictly better on the seam buckets).
    """
    from my_mapreduce_spark.layout import zorder_value

    n = 1 << _H_BITS
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("ga"),
        (F.col("id") / n).cast("long").alias("gb"))

    def mean_area(df, bucket_col):
        rows = (df.groupBy(bucket_col)
                .agg(((F.max("ga") - F.min("ga") + 1)
                      * (F.max("gb") - F.min("gb") + 1)).alias("area"))
                .agg(F.avg("area")).first())
        return rows[0]

    h = _hilbert_frame(grid, "ga", "gb").select(
        "ga", "gb", F.shiftright("_hilbert", 2 * _H_BITS - 8)
        .alias("bucket"))
    m = grid.select(
        "ga", "gb",
        F.shiftright(zorder_value(F.col("ga"), F.col("gb"), _H_BITS),
                     2 * _H_BITS - 8).alias("bucket"))
    assert mean_area(h, "bucket") <= mean_area(m, "bucket")
