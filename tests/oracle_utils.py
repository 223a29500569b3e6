"""Shared Spark-vs-DuckDB comparison used by the test suite.

Mirrors the driver's order-insensitive compare: same row count, same
column-name set, same values after sorting columns by name and rows
by value. Floats are rounded to 6 decimals before compare (queries
themselves already round to 4, so this only canonicalizes dtype
noise, not real differences).
"""

from __future__ import annotations

import math

import pandas as pd


def _canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).map(_canon)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, oracle_sql: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(oracle_sql).df())
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} != {list(want.columns)}")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
