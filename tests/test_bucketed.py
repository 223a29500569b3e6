"""Plan-level proof that the bucketed write path removes the join
shuffle: with autoBroadcast disabled, the lineitem-orders join over
bucketed tables must contain no shuffle Exchange on either side (and,
thanks to sortBy, no Sort before the merge join)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(spark):
    from my_mapreduce_spark.queries.bucketed import bucketed_fixture

    li = bucketed_fixture(spark, SF_DIR, "lineitem", "l_orderkey")
    orders = bucketed_fixture(spark, SF_DIR, "orders", "o_orderkey")

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() > 0
        # contrast: the same join over the raw parquet DOES shuffle —
        # the bucket layout, not luck, removed the Exchange
        from my_mapreduce_spark.io import load_table
        raw_li = load_table(spark, SF_DIR, "lineitem")
        raw_orders = load_table(spark, SF_DIR, "orders")
        raw = raw_li.join(raw_orders, raw_li.l_orderkey == raw_orders.o_orderkey)
        assert "Exchange" in _plan(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_readback_matches_source(spark):
    """The bucketed copy is a faithful copy (same rows)."""
    from my_mapreduce_spark.io import load_table
    from my_mapreduce_spark.queries.bucketed import bucketed_fixture

    orders = bucketed_fixture(spark, SF_DIR, "orders", "o_orderkey")
    src = load_table(spark, SF_DIR, "orders")
    assert orders.count() == src.count()
    assert orders.select("o_orderkey").exceptAll(
        src.select("o_orderkey")).count() == 0
