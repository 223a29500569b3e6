"""Accuracy bound for the rows-only (non-oracle) approx query."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_approx_distinct_within_error(spark, duck):
    from my_mapreduce_spark.queries.relational_ext import q_approx_distinct

    approx = {r.l_returnflag: (r.approx_parts, r.approx_supps)
              for r in q_approx_distinct(spark, SF_DIR).collect()}
    exact = {f: (p, s) for f, p, s in duck.sql(
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_suppkey)"
        " FROM lineitem GROUP BY 1").fetchall()}
    assert set(approx) == set(exact)
    for flag, (ap, asup) in approx.items():
        ep, esup = exact[flag]
        assert abs(ap - ep) / ep < 0.05, (flag, ap, ep)
        assert abs(asup - esup) / esup < 0.05, (flag, asup, esup)


def test_approx_quantiles_within_rank_error(spark, duck):
    """percentile_approx (GK sketch, accuracy 10000) must land within
    1% RANK error of the exact quantile: the estimate sits between
    the exact (q-1%) and (q+1%) quantiles of its group."""
    from my_mapreduce_spark.queries.pipeline_ext import q_approx_quantiles

    rows = {r.o_orderpriority: r for r in q_approx_quantiles(spark, SF_DIR).collect()}
    for prio, r in rows.items():
        for q in (0.25, 0.5, 0.75, 0.95):
            lo, hi = duck.sql(
                "SELECT quantile_cont(o_totalprice, ?), quantile_cont(o_totalprice, ?)"
                " FROM orders WHERE o_orderpriority = ?",
                params=[max(0.0, q - 0.01), min(1.0, q + 0.01), prio]).fetchone()
            est = getattr(r, f"p{int(q * 100)}")
            assert lo <= est <= hi, (prio, q, est, lo, hi)
