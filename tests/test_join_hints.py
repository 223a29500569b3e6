"""Join-strategy control: hints must reach the physical plan.

At 100 TB you sometimes know better than the optimizer (a dimension
that stats call big but you know is pre-filtered small; a join where
sort order already exists). These assert each hint actually selects
its physical operator, so strategy control is a usable knob, not a
comment.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("hint,operator", [
    ("broadcast", "BroadcastHashJoin"),
    ("merge", "SortMergeJoin"),
    ("shuffle_hash", "ShuffledHashJoin"),
])
def test_join_hint_selects_physical_operator(spark, hint, operator):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    j = orders.join(cust.hint(hint), orders.o_custkey == cust.c_custkey)
    assert operator in _plan(j), f"{hint} hint did not produce {operator}"


def test_hinted_strategies_agree_on_results(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")

    def agg(hint):
        return {tuple(r) for r in
                orders.join(cust.hint(hint), orders.o_custkey == cust.c_custkey)
                .groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.round(F.sum("o_totalprice"), 2).alias("rev"))
                .collect()}

    assert agg("broadcast") == agg("merge") == agg("shuffle_hash")
