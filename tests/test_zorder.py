"""Z-order layout: parquet-footer-level proof that Morton clustering
bounds per-file min/max spans on BOTH dimensions (a linear sort
bounds only its own), and that a secondary-column predicate
therefore overlaps far fewer files."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

_N_FILES = 64


def _file_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] for each column, from the parquet footers
    (exactly the stats a scan planner prunes with)."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        rng = {c: [None, None] for c in cols}
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                lo, hi = rng[c]
                rng[c] = [st.min if lo is None else min(lo, st.min),
                          st.max if hi is None else max(hi, st.max)]
        out.append(rng)
    return out


def _mean_span(ranges: list[dict], col: str, lo: float, hi: float) -> float:
    width = hi - lo
    return sum((r[col][1] - r[col][0]) / width for r in ranges) / len(ranges)


def _overlapping(ranges: list[dict], col: str, lo: float, hi: float) -> int:
    return sum(1 for r in ranges if r[col][0] <= hi and r[col][1] >= lo)


def test_zorder_bounds_both_dims_and_prunes_secondary(spark, tmp_path):
    from my_mapreduce_spark.io import load_table
    from my_mapreduce_spark.layout import write_zordered

    li = load_table(spark, SF_DIR, "lineitem") \
        .select("l_orderkey", "l_partkey", "l_quantity")
    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey")).first()

    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(li, zpath, "l_orderkey", "l_partkey", n_files=_N_FILES)
    (li.repartitionByRange(_N_FILES, "l_orderkey")
     .sortWithinPartitions("l_orderkey")
     .write.mode("overwrite").parquet(lpath))

    cols = ["l_orderkey", "l_partkey"]
    zr = _file_ranges(zpath, cols)
    lr = _file_ranges(lpath, cols)
    assert len(zr) >= _N_FILES // 2 and len(lr) >= _N_FILES // 2

    # linear layout: first dim tightly bounded, second dim spans
    # nearly everything in every file (no pruning possible)
    assert _mean_span(lr, "l_orderkey", lo_o, hi_o) < 0.1
    assert _mean_span(lr, "l_partkey", lo_p, hi_p) > 0.8
    # z-order: BOTH dims bounded (measured ~0.2-0.3 at 64 files)
    assert _mean_span(zr, "l_orderkey", lo_o, hi_o) < 0.45
    assert _mean_span(zr, "l_partkey", lo_p, hi_p) < 0.45

    # the consequence a scan planner sees: a 10%-range predicate on
    # the SECONDARY column overlaps (and must read) every linear file
    # but only a fraction of the z-ordered ones
    q_lo = lo_p + (hi_p - lo_p) * 45 // 100
    q_hi = lo_p + (hi_p - lo_p) * 55 // 100
    n_lin = _overlapping(lr, "l_partkey", q_lo, q_hi)
    n_z = _overlapping(zr, "l_partkey", q_lo, q_hi)
    assert n_lin >= len(lr) - 1
    # measured 22/64 (34%); asserted 45% — the scan reads <half the
    # files where the linear layout reads all of them
    assert n_z <= int(len(zr) * 0.45), (n_z, len(zr))

    # layout changed, relation didn't
    assert spark.read.parquet(zpath).exceptAll(li).count() == 0
    assert li.exceptAll(spark.read.parquet(zpath)).count() == 0
