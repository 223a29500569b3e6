"""Small-file compaction: the file-count half of the contract
(q_compaction_roundtrip's oracle pins content preservation; this
pins that compaction actually reduced the file count to the target).
"""

from __future__ import annotations

import os

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.queries.bucketed import _COMPACT_TARGET_FILES
from tests.conftest import SF_DIR


def _parquet_files(path):
    return [f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))]


def test_compaction_reduces_file_count(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    frag = str(tmp_path / "frag")
    compact = str(tmp_path / "compact")
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    assert len(_parquet_files(frag)) == 64
    (spark.read.parquet(frag)
     .repartition(_COMPACT_TARGET_FILES)
     .write.mode("overwrite").parquet(compact))
    assert len(_parquet_files(compact)) == _COMPACT_TARGET_FILES
    # row counts preserved
    assert (spark.read.parquet(compact).count()
            == spark.read.parquet(frag).count())
