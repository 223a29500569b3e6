"""Observation API: pipeline metrics collected DURING an action.

At 100 TB you cannot afford a second scan just to count nulls or
sum a column for a data-quality report; ``df.observe`` attaches
aggregates to the running job and delivers them with the action's
result — zero extra passes. This pins (a) the metrics match an
independent exact aggregation, and (b) they arrive from the same
single job that produced the output.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_observe_metrics_match_exact_aggregates(spark):
    ev = load_table(spark, SF, "events")
    obs = Observation("quality")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )
    # one real action drives both the result and the metrics
    out_rows = observed.where(F.col("event_type") == "purchase").count()

    exact = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
    ).first()

    m = obs.get
    assert m["n_rows"] == exact["n_rows"]
    assert abs(m["sum_value"] - exact["sum_value"]) < 1e-6
    assert m["n_negative"] == exact["n_negative"]
    assert m["approx_users"] > 0
    assert 0 < out_rows < m["n_rows"]
