"""localCheckpoint as the lineage circuit-breaker for iterative
plans.

Every driver-loop operator (CC, pagerank, BPE) grows its logical
plan by one join/agg layer per round; without a cut, round N's plan
embeds rounds 1..N-1 — analysis cost grows superlinearly and deep
plans eventually stack-overflow the analyzer. localCheckpoint
materializes the RDD and REPLACES the lineage with a scan of the
materialized blocks, so the plan size resets to O(1) per round.

The engine's iterative operators bound their round counts (20) so
they live without a cut; this test pins the technique (and its
observable effect on plan size) for the unbounded-iteration case.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan_len(df) -> int:
    return len(df._jdf.queryExecution().analyzed().toString())


def test_local_checkpoint_resets_plan_growth(spark):
    df = spark.range(1000).select(F.col("id"), F.lit(0).alias("v"))
    base = df
    # five self-join rounds without a cut: plan text grows each round
    sizes = []
    for _ in range(5):
        df = (df.join(base.select(F.col("id"),
                                  F.col("v").alias("bv")), "id")
              .select("id", (F.col("v") + F.col("bv") + 1).alias("v")))
        sizes.append(_plan_len(df))
    assert sizes[-1] > sizes[0] * 3, sizes  # superlinear-ish growth

    cut = df.localCheckpoint(eager=True)
    assert _plan_len(cut) < sizes[0], (_plan_len(cut), sizes[0])

    # and results are preserved across the cut
    again = (cut.join(base.select(F.col("id"), F.col("v").alias("bv")),
                      "id")
             .select("id", (F.col("v") + F.col("bv") + 1).alias("v")))
    assert again.agg(F.sum("v")).collect()[0][0] == 1000 * 6
