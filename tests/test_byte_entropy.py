"""Contract tests for q_byte_entropy_vectorized — the scalar
pandas_udf surface pin (the one UDF tier mapInPandas/applyInPandas
don't cover). No DuckDB oracle exists (float log2 sums carry no
cross-engine bit contract), so the contract is pinned here instead:
closed-form values, bounds, partitioning/batch-size invariance, and
the plan actually taking the Arrow-vectorized path.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from my_mapreduce_spark.queries.text_analysis import (
    _byte_entropy_udf,
    q_byte_entropy_vectorized,
)

SF = "/root/testdata/sf0.001"


def _entropy_of(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    udf = _byte_entropy_udf()
    return [r.h for r in df.select(udf("text").alias("h")).collect()]


def test_closed_form_cases(spark):
    # single repeated byte -> 0 bits; k distinct equiprobable
    # single-byte chars -> exactly log2(k); empty string -> 0
    h_const, h_4, h_16, h_empty = _entropy_of(
        spark, ["aaaaaaaa", "abcdabcd", "0123456789abcdef", ""])
    assert h_const == 0.0
    assert abs(h_4 - 2.0) < 1e-12
    assert abs(h_16 - 4.0) < 1e-12
    assert h_empty == 0.0


def test_multibyte_utf8_counts_bytes_not_chars(spark):
    # U+00E9 is 2 UTF-8 bytes (0xC3 0xA9): "éé" has two distinct
    # bytes equiprobable -> exactly 1 bit/byte
    (h,) = _entropy_of(spark, ["éé"])
    assert abs(h - 1.0) < 1e-12


def test_bounds_on_fixture(spark):
    udf = _byte_entropy_udf()
    from my_mapreduce_spark.io import load_table

    rows = (load_table(spark, SF, "documents")
            .select(udf("text").alias("h"))
            .agg(F.min("h"), F.max("h"), F.count("h")).first()
    )
    assert rows[2] > 0
    assert 0.0 <= rows[0] <= rows[1] <= 8.0 + 1e-12


def test_partitioning_and_batch_invariance(spark):
    # same answer under 1 partition, 7 partitions, and a tiny Arrow
    # batch size — the vectorization must not change the math
    base = q_byte_entropy_vectorized(spark, SF).collect()
    base = {r.source: r for r in base}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        small = {r.source: r
                 for r in q_byte_entropy_vectorized(spark, SF).collect()}
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
        else:
            spark.conf.unset(
                "spark.sql.execution.arrow.maxRecordsPerBatch")
    assert set(base) == set(small)
    for k in base:
        assert base[k] == small[k]


def test_plan_is_arrow_vectorized(spark):
    df = q_byte_entropy_vectorized(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # the row-at-a-time slow path


def test_uniform_256_is_8_bits(spark):
    # all 256 byte values equiprobable -> the 8-bit ceiling, via
    # latin-1 round-trip safe construction
    s = bytes(range(256)).decode("latin-1")
    df = spark.createDataFrame([(s,)], "text string")
    udf = _byte_entropy_udf()
    (h,) = [r.h for r in df.select(udf("text").alias("h")).collect()]
    # latin-1 chars >= 0x80 re-encode to 2 UTF-8 bytes, so the byte
    # distribution is NOT uniform anymore — recompute expectation
    enc = s.encode("utf-8")
    from collections import Counter

    c = Counter(enc)
    exp = -sum((n / len(enc)) * math.log2(n / len(enc))
               for n in c.values())
    assert abs(h - exp) < 1e-9
