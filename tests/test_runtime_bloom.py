"""Runtime bloom-filter join pruning (engine feature, SURVEY §4).

When one join side carries a selective filter, Spark can aggregate a
bloom filter over its join keys and push a ``might_contain`` probe
into the other side's scan stage — rows that cannot match are
dropped BEFORE the shuffle. At 100 TB this is the difference between
shuffling the whole fact table and shuffling the ~matching slice;
it composes with (and goes beyond) partition-level dynamic pruning,
which tests/test_dynamic_partition_pruning.py covers.

The thresholds exist because building the bloom costs a pass over
the creation side: production leaves the defaults (creation side
<= 10 MB plan-size estimate, application side >= 10 GB scan); the
test lowers the application-side floor to make tiny fixtures
eligible, which changes WHEN the rewrite fires, not WHAT it does.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from tests.conftest import SF_DIR

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@contextlib.contextmanager
def _confs(spark, confs):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def _urgent_join(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    od = load_table(spark, SF_DIR, "orders").where(
        F.col("o_orderpriority") == "1-URGENT")
    return (li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("l_quantity").alias("qty")))


def test_bloom_filter_injected_and_result_unchanged(spark):
    baseline = {tuple(r) for r in _urgent_join(spark).collect()}
    with _confs(spark, _CONFS):
        df = _urgent_join(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "bloom build missing from plan"
        assert "might_contain" in plan, "bloom probe missing from plan"
        assert {tuple(r) for r in df.collect()} == baseline
