"""Dynamic partition pruning: when the partition-column filter only
materializes at runtime (it comes from the dim side of a join), the
fact scan must still prune — the planner injects a dynamicpruning
subquery into the scan's PartitionFilters. At 100 TB this is what
keeps `fact JOIN filtered_dim` from scanning every partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_join_prunes_fact_partitions_dynamically(spark, tmp_path):
    from my_mapreduce_spark.io import load_table
    from my_mapreduce_spark.sources import write_kv_parquet

    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value", "event_type")
    write_kv_parquet(ev, path, partition_by="event_type")
    fact = spark.read.parquet(path)

    dim = spark.createDataFrame(
        [("click", "engage"), ("purchase", "convert"), ("view", "browse"),
         ("error", "fail"), ("signup", "acquire")],
        "etype string, label string")

    old = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    # tiny local fixtures defeat the cost heuristics; the mechanism
    # under test is the plan rewrite, not the cost model
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100")
    try:
        j = fact.join(dim.where(F.col("label") == "engage"),
                      fact.event_type == dim.etype)
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted")
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and any("dynamicpruning" in ln for ln in pf), plan[:2000]
        assert j.count() == ev.where(F.col("event_type") == "click").count()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.useStats", old)
