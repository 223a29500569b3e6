"""Small-file compaction — the 100 TB table-maintenance operation.

A table written by many tasks (or many streaming micro-batches)
fragments into thousands of small files; scan cost then becomes
file-open-bound, not byte-bound. Compaction rewrites it into
size-targeted files without changing its contents. Two contracts:

1. ``repartition(n)`` rewrite produces exactly n files with
   identical content (the checksum is order-insensitive — XOR of a
   row fingerprint, the same trick as q_table_diff_checksums);
2. ``spark.sql.files.maxRecordsPerFile`` bounds rows-per-file on
   write — the declarative knob when row counts, not partition
   counts, are the target.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table

SF = "/root/testdata/sf0.001"


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def _checksum(df):
    """Order-insensitive content fingerprint: XOR of per-row hashes."""
    row_hash = F.conv(
        F.substring(F.md5(F.concat_ws("|", *[F.col(c).cast("string")
                                             for c in df.columns])), 1, 13),
        16, 10).cast("long")
    return df.agg(F.bit_xor(row_hash).alias("chk"),
                  F.count("*").alias("n")).first()


def test_compaction_preserves_content_and_hits_file_target(spark, tmp_path):
    src = load_table(spark, SF, "lineitem")
    fragmented = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")

    # simulate a fragmented table: 64 writer tasks -> 64 small files
    src.repartition(64).write.parquet(fragmented)
    assert len(_parquet_files(fragmented)) == 64

    frag = spark.read.parquet(fragmented)
    # size-targeted compaction: total bytes / 1 MiB target, floor 1
    total_bytes = sum(os.path.getsize(f) for f in _parquet_files(fragmented))
    n_target = max(1, round(total_bytes / (1 << 20)))
    frag.repartition(n_target).write.parquet(compacted)

    assert len(_parquet_files(compacted)) == n_target
    assert n_target < 64
    before = _checksum(frag)
    after = _checksum(spark.read.parquet(compacted))
    assert (before["n"], before["chk"]) == (after["n"], after["chk"])


def test_max_records_per_file_bounds_every_file(spark, tmp_path):
    src = load_table(spark, SF, "lineitem")
    out = str(tmp_path / "bounded")
    cap = 1000
    (src.repartition(2)
     .write.option("maxRecordsPerFile", cap).parquet(out))

    per_file = (spark.read.parquet(out)
                .groupBy(F.input_file_name().alias("f"))
                .count().collect())
    assert len(per_file) >= src.count() // cap
    assert all(r["count"] <= cap for r in per_file)
    assert sum(r["count"] for r in per_file) == src.count()
