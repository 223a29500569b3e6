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


def test_fixture_tag_changes_when_source_regenerated(tmp_path):
    """The derived-layout cache key MUST change when the fixture file
    at the same path is regenerated (round-8 advice: keying by sf-dir
    basename alone served stale sink data). Forces the stale case:
    same path, same byte size, new mtime -> new tag; different bytes
    -> new tag; untouched -> stable tag."""
    import os
    import shutil

    from my_mapreduce_spark.queries.bucketed import _fixture_tag

    sf = tmp_path / "sf_fake"
    sf.mkdir()
    src = sf / "events.parquet"
    src.write_bytes(b"0" * 64)
    t1 = _fixture_tag(str(sf), "events")
    assert t1 == _fixture_tag(str(sf), "events")  # stable when untouched

    # regeneration with identical size but a new mtime must re-key
    os.utime(src, ns=(os.stat(src).st_atime_ns,
                      os.stat(src).st_mtime_ns + 1_000_000))
    t2 = _fixture_tag(str(sf), "events")
    assert t2 != t1, "same-size regeneration served a stale cache key"

    # regeneration with different bytes must re-key too
    src.write_bytes(b"1" * 65)
    t3 = _fixture_tag(str(sf), "events")
    assert t3 not in (t1, t2)

    # directory-style parquet (part files) also fingerprints content
    shutil.rmtree(sf)
    sf.mkdir()
    d = sf / "events.parquet"
    d.mkdir()
    (d / "part-0000.parquet").write_bytes(b"a" * 10)
    t4 = _fixture_tag(str(sf), "events")
    (d / "part-0000.parquet").write_bytes(b"b" * 11)
    assert _fixture_tag(str(sf), "events") != t4
