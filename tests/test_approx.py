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
