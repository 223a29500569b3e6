"""Catalyst exchange reuse: a plan that consumes the same shuffled
aggregate twice must execute the shuffle ONCE (ReusedExchange), not
twice — the free memoization that makes diamond-shaped plans (self
joins on an aggregate, union of two readings of one rollup) pay for
their expensive stage a single time at any scale.

The reference re-runs its full map+shuffle per job (SURVEY.md §3);
exchange reuse is pure Catalyst north-star depth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from tests.conftest import SF_DIR


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_self_join_on_aggregate_reuses_exchange(spark):
    """agg joined to itself: the shuffle feeding the aggregate must
    appear once as Exchange and once as ReusedExchange."""
    ev = load_table(spark, SF_DIR, "events")
    agg = (ev.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.avg("value").alias("avg_v")))
    # diamond: same aggregate read twice (pairs of types with equal n)
    a, b = agg.alias("a"), agg.alias("b")
    q = (a.join(b, (F.col("a.n") == F.col("b.n"))
                & (F.col("a.event_type") < F.col("b.event_type")))
         .select("a.event_type", "b.event_type", "a.n"))
    q.collect()
    plan = _executed_plan(q)
    assert "ReusedExchange" in plan, plan


def test_union_of_same_rollup_reuses_exchange(spark):
    ev = load_table(spark, SF_DIR, "events")
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum("value").alias("s")))
    top = hourly.orderBy(F.desc("s")).limit(3)
    bottom = hourly.orderBy(F.asc("s")).limit(3)
    q = top.unionAll(bottom)
    q.collect()
    plan = _executed_plan(q)
    assert "ReusedExchange" in plan, plan
