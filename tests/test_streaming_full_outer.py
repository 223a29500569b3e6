"""FULL OUTER stream-stream join vs its batch twin, plus a pinned
regression for the watermark-vs-filter-pushdown trap.

``run_full_outer_join_stream`` pre-filters BOTH streams to rows the
watermark fully resolves before the finite source drains. When both
branch cutoffs were written as the identical ``ts_us < cutoff``
predicate, Catalyst hoisted the common filter below the shared
EventTimeWatermark operator: the watermark then never saw any event
past the cutoff, topped out at ``cutoff - delay``, and the last
watermark+window of kept rows could never evict — the join silently
dropped outer rows (16 at sf0.01). The fix expresses the two
cutoffs over structurally different columns; this test pins the
equality so a refactor that re-unifies the predicates fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.streaming.jobs import (_OUTER_MARGIN_US,
                                               _OUTER_WATERMARK_H,
                                               _OUTER_WINDOW_MIN,
                                               run_full_outer_join_stream)

SF_DIR = "/root/testdata/sf0.01"


def _batch_full_join(spark):
    """The batch twin: full join of cutoff-filtered clicks and
    purchases under the same time-range condition."""
    ev = load_table(spark, SF_DIR, "events")
    cutoff_us = (
        ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
        - (_OUTER_WATERMARK_H * 3600 + _OUTER_WINDOW_MIN * 60) * 1_000_000
        - _OUTER_MARGIN_US)
    c = (ev.where((F.col("event_type") == "click")
                  & (F.unix_micros("ts") < cutoff_us))
         .select(F.col("event_id").alias("click_id"),
                 F.col("user_id").alias("c_user"),
                 F.col("ts").alias("c_ts")))
    p = (ev.where((F.col("event_type") == "purchase")
                  & (F.unix_micros("ts") < cutoff_us))
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts")))
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts")
           + F.expr(f"INTERVAL {_OUTER_WINDOW_MIN} MINUTES")),
        "fullOuter")


def test_full_outer_stream_equals_batch(spark):
    got = run_full_outer_join_stream(spark, SF_DIR).toPandas()
    want = _batch_full_join(spark).toPandas()
    assert len(got) == len(want) > 0

    def key(df, a, b):
        return sorted(map(tuple, df[[a, b]].fillna(-1).values))

    assert key(got, "click_id", "purchase_id") == \
        key(want, "click_id", "purchase_id")
    # both outer directions genuinely exercised
    assert (got["click_id"].isna()).any()
    assert (got["purchase_id"].isna()).any()
    # matched flag is consistent with the null pattern
    m = got["matched"] == 1
    assert (got.loc[m, "click_id"].notna()
            & got.loc[m, "purchase_id"].notna()).all()
