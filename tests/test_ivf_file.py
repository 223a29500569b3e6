"""The on-disk IVF index must actually prune: probing the
bucket-partitioned inverted file has to resolve the probe set against
the directory listing (PartitionFilters) and read EXACTLY the probed
lists — never all of them — while holding the family's recall floor.
"""

from __future__ import annotations

import glob
import os
import re

import pytest

from my_mapreduce_spark.queries.similarity import (_IVF_FILE_QUERY_IDS,
                                                   ivf_file_index,
                                                   q_knn_bruteforce,
                                                   q_knn_ivf_file)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def served(spark):
    df = q_knn_ivf_file(spark, SF_DIR)
    rows = df.collect()
    return df, rows


def _partition_filter_sets(plan: str) -> list[set[int]]:
    """Every INSET over the bucket partition column in the plan."""
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)", plan):
        text = m.group(1)
        inset = re.search(r"bucket#\d+L? INSET ([\d, .]+)", text)
        if inset:
            out.append({int(x) for x in
                        inset.group(1).replace("...", "").split(",")
                        if x.strip().isdigit()})
    return out


def test_partition_filter_reaches_listing(spark, served):
    df, _rows = served
    plan = df._jdf.queryExecution().executedPlan().toString()
    sets = _partition_filter_sets(plan)
    assert sets, "no bucket INSET reached PartitionFilters:\n" + plan[:2000]


def test_scan_reads_exactly_the_probed_lists(spark, served):
    """numPartitions (the scan's 'partitions read' metric) must equal
    the probed bucket set exactly, and be a strict subset of the
    on-disk lists."""
    df, _rows = served
    idx, c_mat = ivf_file_index(spark, SF_DIR)
    total = len(glob.glob(os.path.join(idx, "bucket=*")))
    assert total >= 16  # the layout really is one dir per list

    def _scans(node, acc):
        name = node.getClass().getSimpleName()
        if "AdaptiveSparkPlan" in name:      # AQE root / sub-root
            return _scans(node.finalPhysicalPlan(), acc)
        if "QueryStage" in name:             # materialized stage wrapper
            return _scans(node.plan(), acc)
        if "FileSourceScan" in name:
            acc.append(node)
        ch = node.children()
        for i in range(ch.size()):
            _scans(ch.apply(i), acc)
        return acc

    ep = df._jdf.queryExecution().executedPlan()
    n_read = None
    for leaf in _scans(ep, []):
        metrics = leaf.metrics()
        if metrics.contains("numPartitions"):
            n_read = metrics.apply("numPartitions").value()
    assert n_read is not None, "no partitioned FileSourceScan in plan"

    # recompute the probe set the way the query does (plan-string
    # INSET lists truncate past 25 fields, so don't parse them here)
    import numpy as np

    from my_mapreduce_spark.queries.similarity import (_ivf_nprobe,
                                                       _normed)
    from my_mapreduce_spark.io import load_table

    e = _normed(load_table(spark, SF_DIR, "embeddings"))
    qrows = e.where(e.vec_id.isin(*_IVF_FILE_QUERY_IDS)).collect()
    qm = np.stack([np.asarray(r.v) / r.nrm for r in qrows])
    probes = np.argsort(-(qm @ c_mat.T), axis=1)[:, :_ivf_nprobe(len(c_mat))]
    on_disk = {int(d.rsplit("=", 1)[1])
               for d in glob.glob(os.path.join(idx, "bucket=*"))}
    expected = {int(b) for row in probes for b in row} & on_disk
    # planning-time contract: partitions read == |probed set|, < total
    assert n_read == len(expected), (n_read, len(expected))
    assert n_read < total, (n_read, total)


def test_recall_floor_vs_bruteforce(spark, served):
    _df, rows = served
    exact: dict[int, set[int]] = {}
    for r in q_knn_bruteforce(spark, SF_DIR).collect():
        if r.query_id in _IVF_FILE_QUERY_IDS:
            exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(exact) == set(_IVF_FILE_QUERY_IDS)
    hits = sum(len(exact[q] & got[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.80, (hits, total)


def test_index_reuse_is_stable(spark, served):
    """Second call reloads centroids from the sidecar (no retrain) and
    serves identical results."""
    _df, rows = served
    again = q_knn_ivf_file(spark, SF_DIR).collect()
    key = lambda r: (r.query_id, r.rnk)  # noqa: E731
    assert sorted(map(tuple, again), key=lambda t: (t[0], t[3])) == \
        sorted(map(tuple, rows), key=lambda t: (t[0], t[3]))


# ---------------------------------------------------------------------------
# Incremental refresh (q_knn_ivf_file_refresh): the delta batch must
# be SERVED from appended files without rewriting a single base byte.

@pytest.fixture(scope="module")
def refreshed(spark):
    from my_mapreduce_spark.queries.similarity import q_knn_ivf_file_refresh
    df = q_knn_ivf_file_refresh(spark, SF_DIR)
    return df, df.collect()


def test_refresh_recall_floor(spark, refreshed):
    """Recall vs brute force over the FULL corpus (base + delta) —
    the frozen-quantizer index still meets the family floor."""
    _df, rows = refreshed
    exact: dict[int, set[int]] = {}
    for r in q_knn_bruteforce(spark, SF_DIR).collect():
        if r.query_id in _IVF_FILE_QUERY_IDS:
            exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(exact) == set(_IVF_FILE_QUERY_IDS)
    hits = sum(len(exact[q] & got[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.80, (hits, total)


def test_refresh_serves_delta_vectors(spark, refreshed):
    """At least one top-5 neighbor comes from the appended delta
    subset (vec_id % 10 == 9) AND matches the brute-force truth for
    its query — appended lists are live, not just present on disk."""
    from my_mapreduce_spark.queries.similarity import _IVF_DELTA_MOD
    _df, rows = refreshed
    delta_hits = [r for r in rows
                  if r.neighbor_id % _IVF_DELTA_MOD == _IVF_DELTA_MOD - 1]
    assert delta_hits, "no delta vector served from the refreshed index"
    exact = {(r.query_id, r.neighbor_id)
             for r in q_knn_bruteforce(spark, SF_DIR).collect()}
    assert any((r.query_id, r.neighbor_id) in exact for r in delta_hits)


def test_refresh_appends_without_rewriting_base(spark, refreshed):
    """Bucket dirs contain >1 file generation where delta rows landed,
    and a re-serve is byte-stable (idempotent marker: no second
    append, no rebuild)."""
    import glob as g
    from my_mapreduce_spark.queries.similarity import (
        ivf_file_index_incremental, q_knn_ivf_file_refresh)
    idx, _c = ivf_file_index_incremental(spark, SF_DIR)
    files_before = sorted(g.glob(os.path.join(idx, "bucket=*", "*.parquet")))
    assert files_before
    _df, rows = refreshed
    again = q_knn_ivf_file_refresh(spark, SF_DIR).collect()
    files_after = sorted(g.glob(os.path.join(idx, "bucket=*", "*.parquet")))
    assert files_after == files_before  # idempotent: nothing rewritten
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
