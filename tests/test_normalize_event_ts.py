"""io.normalize_event_ts must give identical (ts, ts_ns) for every
fixture timestamp encoding the driver has shipped: TIMESTAMP(NANOS)
read as long (nanosAsLong), TIMESTAMP_NTZ micros, and plain
TIMESTAMP. The three encodings of one instant are one row apart from
a cast — any divergence is a silent correctness bug across every
events query."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_mapreduce_spark.io import normalize_event_ts

_MICROS = [
    0,
    1,
    1_706_659_032_194_062,          # fixture max-ts neighborhood
    1_706_659_032_194_062 - 1,
    999_999,
    1_000_000,
    4_102_444_800_000_000,          # 2100-01-01
]


def _collect(df):
    out = normalize_event_ts(df).select(
        "event_id", F.unix_micros("ts").alias("us"), "ts_ns").collect()
    return sorted((r.event_id, r.us, r.ts_ns) for r in out)


def test_all_encodings_agree(spark):
    rows = list(enumerate(_MICROS))
    want = sorted((i, us, us * 1000) for i, us in rows)

    # 1) bigint epoch-nanos (legacy nanosAsLong path)
    nanos = spark.createDataFrame(
        [(i, us * 1000) for i, us in rows], "event_id long, ts long")
    assert _collect(nanos) == want

    # 2) TIMESTAMP_NTZ micros (current fixtures; session TZ is UTC)
    ntz = spark.createDataFrame(
        [(i, us) for i, us in rows], "event_id long, ts long"
    ).select("event_id",
             F.timestamp_micros("ts").cast("timestamp_ntz").alias("ts"))
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    assert _collect(ntz) == want

    # 3) plain TIMESTAMP (already the target type)
    ltz = spark.createDataFrame(
        [(i, us) for i, us in rows], "event_id long, ts long"
    ).select("event_id", F.timestamp_micros("ts").alias("ts"))
    assert _collect(ltz) == want
