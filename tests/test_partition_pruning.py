"""Partition-pruning proof for the hive-layout parquet sink: a filter
on the partition column must become a PartitionFilter (pruned at file
listing time) rather than a data filter — at 100 TB this is the
difference between scanning one partition and scanning the lake."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_partitioned_sink_prunes_on_read(spark, tmp_path):
    from my_mapreduce_spark.io import load_table
    from my_mapreduce_spark.sources import write_kv_parquet

    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value", "event_type")
    write_kv_parquet(ev, path, partition_by="event_type")

    back = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = _plan(back)
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters, and the
    # row-group data filters must NOT need to re-check it
    pf_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "event_type" in pf_line, pf_line
    df_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert all("event_type" not in ln for ln in df_lines), df_lines

    # and the scan only touches the one partition directory
    n_click = back.count()
    exact = ev.where(F.col("event_type") == "click").count()
    assert n_click == exact
    files = back.select(F.input_file_name()).distinct().collect()
    assert files and all("event_type=click" in r[0] for r in files)
