"""Cost-based optimizer demo: ANALYZE-collected column statistics
flip a physical join decision.

Without statistics, Catalyst's size-only estimator propagates the
full table size through a Filter, so a highly selective dimension
filter still looks "big" and the join plans as SortMergeJoin. After
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` (min/max/ndv on
the filter column) with ``spark.sql.cbo.enabled``, FilterEstimation
shrinks the estimate below the broadcast threshold and the SAME query
plans as BroadcastHashJoin — the stats, not a hint, changed the plan.

At 100 TB this is the production knob for join ordering/strategy on
catalog tables; AQE covers runtime re-planning, CBO covers getting
the static plan right before a single task runs. (The reference has
no optimizer at all — SURVEY.md §4.1 — so this is north-star depth.)
"""

from __future__ import annotations

import os

from tests.conftest import SF_DIR

_FILTER = "o_orderkey <= 64"  # ~1% of orders at any sf (dense keys)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _orders_table(spark) -> str:
    tag = os.path.basename(os.path.normpath(SF_DIR)).replace(".", "_")
    name = f"mmr_cbo_orders_{tag}"
    if not spark.catalog.tableExists(name):
        # an orphaned warehouse dir (metastore reset between sessions)
        # makes CTAS fail with LOCATION_ALREADY_EXISTS; clear it first
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            .removeprefix("file:"), name)
        if os.path.isdir(loc):
            import shutil
            shutil.rmtree(loc)
        from my_mapreduce_spark.io import load_table
        load_table(spark, SF_DIR, "orders").write.mode("overwrite") \
            .format("parquet").saveAsTable(name)
    return name


def test_analyze_stats_flip_join_to_broadcast(spark):
    from my_mapreduce_spark.io import load_table

    name = _orders_table(spark)
    li = load_table(spark, SF_DIR, "lineitem")

    def q():
        o = spark.table(name).where(_FILTER)
        return li.join(o, li.l_orderkey == o.o_orderkey) \
                 .groupBy("o_orderpriority").count()

    saved = {k: spark.conf.get(k) for k in
             ("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
              "spark.sql.autoBroadcastJoinThreshold")}
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024))
    try:
        # no stats yet: filter output is estimated at full table size,
        # over the 8 KB threshold -> shuffle join
        before = _plan(q())
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before, \
            before

        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS "
                  f"FOR COLUMNS o_orderkey")

        # same query, same confs: min/max/ndv now price the filter at
        # ~1% of the table, under the threshold -> broadcast join
        after_df = q()
        after = _plan(after_df)
        assert "BroadcastHashJoin" in after, \
            f"stats did not flip the join:\n{after}"
        # and the stats-informed plan still computes the right answer
        assert after_df.count() > 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_analyze_table_rowcount_visible_in_catalog(spark):
    """ANALYZE COMPUTE STATISTICS records the exact row count, and
    DESCRIBE EXTENDED surfaces it — the catalog is the stats store."""
    name = _orders_table(spark)
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    stats = {r.col_name: r.data_type
             for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()}
    n = spark.table(name).count()
    assert "Statistics" in stats
    assert f"{n} rows" in stats["Statistics"], stats["Statistics"]
