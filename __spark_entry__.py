"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`my_mapreduce_spark.registry` — the engine's
query registry supplies both the Spark callables and the DuckDB
oracle SQL twins. See SURVEY.md §2 for the operator inventory each
entry corresponds to.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shape pricing summary) at sf0.001."""
    from my_mapreduce_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from my_mapreduce_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from my_mapreduce_spark.registry import all_oracles

    return all_oracles()
