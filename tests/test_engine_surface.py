"""Engine extension surfaces: SQL-registered vectorized UDFs and
explicit materialization (cache) — the two knobs a user of the
engine reaches for that no query in the registry exercises directly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from my_mapreduce_spark.io import load_table
from tests.conftest import SF_DIR


def test_sql_registered_pandas_udf_matches_builtin(spark):
    # the sanctioned custom-logic path: Arrow-batched pandas_udf,
    # registered for SQL users; row-at-a-time Python UDFs stay
    # banned from the engine (see SURVEY §4). The UDF must agree
    # with the JVM built-in it mirrors.
    @pandas_udf("double")
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    spark.udf.register("disc_price", disc_price)
    li = load_table(spark, SF_DIR, "lineitem")
    li.createOrReplaceTempView("li_udf_test")
    got = spark.sql("""
        SELECT l_returnflag, ROUND(SUM(disc_price(l_extendedprice, l_discount)), 2) AS rev
        FROM li_udf_test GROUP BY l_returnflag ORDER BY l_returnflag
    """).collect()
    want = (li.groupBy("l_returnflag")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("rev"))
            .orderBy("l_returnflag").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # and it must run through the Arrow path, not row-pickling
    plan = (spark.sql("SELECT disc_price(l_extendedprice, l_discount) FROM li_udf_test")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan
    spark.catalog.dropTempView("li_udf_test")


def test_cache_materializes_and_is_reused(spark):
    agg = (load_table(spark, SF_DIR, "orders")
           .groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n")))
    agg.cache()
    try:
        agg.count()  # materialize
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, "cached relation not served from memory"
        # a derived query must also hit the cache, not recompute
        derived = agg.where(F.col("n") > 0)
        dplan = derived._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in dplan
    finally:
        agg.unpersist()
