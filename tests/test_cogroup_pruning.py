"""Regression guard for the cogroup column-pruning quirk.

On this Spark, a ``cogroup().applyInPandas`` whose output is consumed
by a bare ``.count()`` (no output column referenced) lets column
pruning strip the RIGHT child to just the grouping key — the UDF
receives the right side without its data columns (measured: left kept
all 3 columns, right pruned to ['user_id']). q_asof_cogroup pins its
inputs with an eager localCheckpoint; these tests (a) assert the
query survives a bare count and agrees with the collected length, and
(b) document the underlying quirk so a Spark upgrade that fixes it is
noticed (the raw-plan probe starts passing).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_asof_cogroup_count_equals_collect(spark):
    from my_mapreduce_spark.queries.temporal_joins import q_asof_cogroup

    df = q_asof_cogroup(spark, SF_DIR)
    n = df.count()          # the path that used to die in bench.py
    assert n == len(df.collect())
    assert n > 0


def test_raw_cogroup_right_side_pruning_quirk(spark):
    """Probe the quirk directly: a raw cogroup UDF counted without
    consuming output columns sees the right side pruned to the key.
    If a Spark upgrade fixes the pruning, this starts XPASSing —
    take that as the signal to drop q_asof_cogroup's checkpoint."""
    from my_mapreduce_spark.io import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
    left = ev.select("user_id", "event_id", "ts_us")
    right = ev.select("user_id", "event_id", "ts_us")

    def probe(lft, rgt):
        return pd.DataFrame({
            "l_cols": [len(lft.columns)], "r_cols": [len(rgt.columns)]})

    out = (left.groupBy("user_id").cogroup(right.groupBy("user_id"))
           .applyInPandas(probe, "l_cols long, r_cols long"))
    out.count()  # must not crash — the probe UDF accepts any width
    widths = out.select(F.min("r_cols").alias("w")).collect()[0].w
    if widths == 3:
        pytest.xfail("Spark now preserves cogroup right-side columns "
                     "under count() — quirk fixed upstream; "
                     "q_asof_cogroup's localCheckpoint can be dropped")
    assert widths == 1  # the measured quirk: right side pruned to key


def test_grouped_map_and_map_in_pandas_keep_full_width(spark):
    """The quirk is SCOPED to cogroup's right side: plain grouped-map
    and mapInPandas UDFs keep all input columns under a bare count —
    so no other Arrow-UDF query in the registry needs the checkpoint
    workaround (bench counts every query, which is how the cogroup
    case surfaced)."""
    from my_mapreduce_spark.io import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"))

    def probe(pdf):
        return pd.DataFrame({"w": [len(pdf.columns)]})

    gm = ev.groupBy("user_id").applyInPandas(probe, "w long")
    gm.count()
    assert gm.select(F.min("w")).collect()[0][0] == 3

    def probe_iter(it):
        for pdf in it:
            yield pd.DataFrame({"w": [len(pdf.columns)]})

    mp = ev.mapInPandas(probe_iter, "w long")
    mp.count()
    assert mp.select(F.min("w")).collect()[0][0] == 3
