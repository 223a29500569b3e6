"""Manifest-MVCC snapshot guarantees (my_mapreduce_spark/snapshots.py).

The q_snapshot_time_travel oracle proves the data round-trips; this
suite pins the FILE-level contract the oracle cannot see:
copy-on-write shares unchanged paths, old versions' bytes never
change, and the manifest is the atomic unit of publication.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.snapshots import SnapshotStore

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8
HOT = 3


def _file_hashes(paths):
    out = {}
    for p in paths:
        for root, _, files in os.walk(p):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    fp = os.path.join(root, f)
                    out[fp] = hashlib.md5(
                        open(fp, "rb").read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snap"))
    st = SnapshotStore(root)
    orders = load_table(spark, SF, "orders").withColumn(
        "o_bucket", (F.col("o_orderkey") % N_BUCKETS).cast("int"))
    st.commit_full(orders, 1, "o_bucket")
    updated = orders.withColumn(
        "o_totalprice",
        F.when((F.col("o_bucket") == HOT) & (F.col("o_orderkey") % 2 == 1),
               F.col("o_totalprice") * 2).otherwise(F.col("o_totalprice")))
    st.commit_rewrite(updated, 2, 1, "o_bucket", [HOT])
    return st


def test_copy_on_write_shares_unchanged_paths(store):
    shared = store.shared_paths(1, 2)
    assert len(store.manifest(1)) == N_BUCKETS
    assert len(store.manifest(2)) == N_BUCKETS
    # exactly one bucket was rewritten; the rest are the SAME paths
    assert len(shared) == N_BUCKETS - 1
    replaced = set(store.manifest(2)) - shared
    assert {os.path.basename(p) for p in replaced} == {f"o_bucket={HOT}"}


def test_old_version_bytes_untouched(spark, store):
    # v1's data files are byte-identical after the v2 commit, and a
    # v1 read returns the pre-update aggregate (time travel works)
    before = _file_hashes(store.manifest(1))
    assert before, "v1 manifest lists no parquet files"
    v1 = store.read(spark, 1)
    v2 = store.read(spark, 2)
    s1 = v1.agg(F.sum("o_totalprice")).first()[0]
    s2 = v2.agg(F.sum("o_totalprice")).first()[0]
    assert s2 > s1  # the update only ever doubles prices
    assert v1.count() == v2.count()
    assert _file_hashes(store.manifest(1)) == before


def test_manifest_publish_is_atomic(store):
    # the manifests directory holds only fully-published versions —
    # no temp files left behind by the write+replace protocol
    d = os.path.join(store.root, "manifests")
    assert sorted(os.listdir(d)) == ["v1.json", "v2.json"]
    assert store.versions() == [1, 2]


def test_rewrite_cost_tracks_update_not_table(store):
    # v2 wrote exactly one bucket directory: its data dir contains
    # only the rewritten partition
    v2_dir = os.path.join(store.root, "data", "v2")
    parts = [f for f in os.listdir(v2_dir) if f.startswith("o_bucket=")]
    assert parts == [f"o_bucket={HOT}"]
