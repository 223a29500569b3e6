"""The plan audit's global-window detector must (a) flag a Window
with an empty partition spec over unbounded input — the pre-fix
q_window_ntile shape that funnels a growing table through one task —
(b) auto-exempt limit-bounded globals, and (c) not confuse a
partitioned-no-order window ([exprs], [partitionSpec] also prints
two Arguments groups) with a global one."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from tests.conftest import SF_DIR
from tools.explain_audit import _global_window_ids, _limit_bounded, audit


def _plan(spark, df):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(mode.fromString("formatted"))


def _unbounded_globals(spark, df):
    plan = _plan(spark, df)
    return [i for i in _global_window_ids(plan)
            if not _limit_bounded(plan, i)]


def test_flags_prefix_global_ntile_over_scan(spark):
    """The exact pre-fix q_window_ntile plan must be flagged."""
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    w = Window.orderBy("c_acctbal", "c_custkey")
    bad = cust.select("c_acctbal", F.ntile(4).over(w).alias("quartile"))
    ids = _unbounded_globals(spark, bad)
    assert ids, "pre-fix global-ntile shape must produce a finding"
    smells = audit("not_whitelisted", _plan(spark, bad), 1, {})
    assert any(s.startswith("global-window") for s in smells)


def test_limit_bounded_global_window_exempt(spark):
    """row_number over an .orderBy().limit(k) input is fine — the
    single partition holds at most k rows."""
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    top = cust.orderBy(F.desc("c_acctbal")).limit(5)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c_acctbal"))))
    assert _unbounded_globals(spark, ranked) == []


def test_partitioned_no_order_window_not_flagged(spark):
    """partitionBy with no orderBy prints 2 Arguments groups too —
    must not be mistaken for a global window (q_weighted_median's
    total-weight window shape)."""
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    w = Window.partitionBy("c_nationkey")
    df = cust.select("c_nationkey",
                     F.sum("c_acctbal").over(w).alias("nat_total"))
    assert _unbounded_globals(spark, df) == []


def test_shipped_ntile_plan_clean_and_oracle_shape(spark):
    """The shipped q_window_ntile's only global window runs over the
    per-partition COUNT relation (conf-bounded — its subtree is a
    HashAggregate, never the customer scan), and the result is the
    exact ntile(4) division (first N mod 4 quartiles take the extra
    row)."""
    import re

    from my_mapreduce_spark.queries.windows import q_window_ntile

    df = q_window_ntile(spark, SF_DIR)
    plan = _plan(spark, df)
    ids = _global_window_ids(plan)
    assert ids, "the prefix-offset plan keeps one conf-bounded window"
    lines = plan.split("\n")
    indent_of = lambda ln: len(re.match(r"^[\s:+*\-]*", ln).group(0))
    for wid in ids:
        for i, ln in enumerate(lines):
            if re.search(rf"\({wid}\)\s*$", ln) and "Window" in ln:
                base, subtree = indent_of(ln), []
                for sub in lines[i + 1:]:
                    if not sub.strip() or indent_of(sub) <= base:
                        break
                    subtree.append(sub)
                joined = "\n".join(subtree)
                assert "HashAggregate" in joined, \
                    "global window must sit above the pid-count agg"
                assert "Scan parquet" not in joined.split("HashAggregate")[0], \
                    "global window must not directly consume the scan"
    rows = {r.quartile: r.n_customers for r in df.collect()}
    n = sum(rows.values())
    q, rem = divmod(n, 4)
    expect = {i + 1: q + (1 if i < rem else 0) for i in range(4)}
    assert rows == expect


def test_aqe_shuffle_to_broadcast_array_build_caught(spark):
    """Round-8 verdict #1: an AQE runtime shuffle-to-broadcast
    conversion of an ARRAY build side is invisible to the static
    walker (the initial adaptive plan still shows a shuffled join)
    but MUST be caught by the executed pass. Injection: static
    broadcasts disabled, AQE conversion enabled, build side carries
    a column-dependent array (a constant array would be folded
    above the join)."""
    from tools.explain_audit import (_array_broadcast_builds,
                                     adaptive_array_broadcasts)

    saved = {k: spark.conf.get(k, None) for k in
             ("spark.sql.adaptive.enabled",
              "spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # threshold sits BETWEEN the two sides' runtime sizes (~16 MB vs
    # ~100 KB) so AQE can only ever pick the array side as the build —
    # with both sides under threshold it may broadcast either
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                   str(256 * 1024))
    try:
        big = spark.range(1_000_000).withColumn("k", F.col("id") % 1000)
        small = (spark.range(1000)
                 .select(F.col("id").alias("k"),
                         F.array(F.col("id") * 1.0,
                                 F.col("id") * 2.0).alias("arr")))
        df = big.join(small, "k")
        qe = df._jdf.queryExecution()
        assert _array_broadcast_builds(qe) == [], (
            "static planner must NOT broadcast here (threshold -1) — "
            "the injection needs the conversion to be runtime-only")
        hits = adaptive_array_broadcasts(df)
        assert hits, ("AQE converted the shuffled join to a broadcast "
                      "of an array build side and the executed walker "
                      "missed it")
        assert all("array<" in h for h in hits)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_adaptive_pass_clean_on_honest_broadcast(spark):
    """The dynamic walker must NOT flag a plan whose broadcast side
    carries no arrays (the routine dim-table broadcast)."""
    from tools.explain_audit import adaptive_array_broadcasts

    big = spark.range(50_000).withColumn("k", F.col("id") % 100)
    small = spark.range(100).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("v"))
    assert adaptive_array_broadcasts(big.join(small, "k")) == []
