"""AQE skew-join: prove the session's adaptive config actually
splits a skewed join partition at runtime.

A synthetic join where one key owns ~95% of the left side would, in
a static plan, put nearly all rows in one sort-merge task. With AQE
skew handling (thresholds dropped so the toy fixture qualifies), the
final adaptive plan must mark the join's skewed side — evidence the
salting pattern in q_skew_salted_agg has a runtime complement for
joins, which is exactly the 100 TB posture claimed in the docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # left: 200k rows, 95% on key 0; right: 50 distinct keys
        left = (spark.range(200_000)
                .select(F.when(F.col("id") % 20 != 0, F.lit(0))
                        .otherwise(F.col("id") % 50).alias("k"),
                        F.col("id").alias("payload")))
        right = spark.range(50).select(F.col("id").alias("k"),
                                       (F.col("id") * 10).alias("dim"))
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's queryExecution (count()
        # would build a separate plan and leave this one non-final)
        assert len(joined.collect()) == 200_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
