"""Geo family: the cell-bucketed radius join must equal a
from-scratch numpy BRUTE FORCE (the DuckDB oracle shares the grid
algebra, so this is the independent check that the grid is lossless
— a shared cell-size bug would pass the oracle but fail here), and
the nearest-hub assignment must agree with a numpy argmin."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.queries.geo_ext import (
    _RADIUS_KM,
    q_geo_nearest_hub,
    q_geo_radius_join,
)
from tests.conftest import SF_DIR


def _coords(keys):
    lat, lon = [], []
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        lat.append((int(h[0:8], 16) % 120_000) / 1000.0 - 60.0)
        lon.append((int(h[8:16], 16) % 358_000) / 1000.0 - 179.0)
    return np.array(lat), np.array(lon)


def _haversine_matrix(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1)[:, None], np.radians(lat2)[None, :]
    dphi = (np.radians(lat2)[None, :] - np.radians(lat1)[:, None]) / 2
    dlam = (np.radians(lon2)[None, :] - np.radians(lon1)[:, None]) / 2
    a = np.sin(dphi) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam) ** 2
    return 2 * 6371.0 * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def test_radius_join_matches_numpy_brute_force(spark):
    # sf0.01: the sf0.001 fixture's 150 points are too sparse to
    # produce any 50 km pair (expected pairs ≈ 0.2) — the brute
    # force needs a fixture where the pair set is non-empty
    sf = "/root/testdata/sf0.01"
    keys = [r.c_custkey for r in
            load_table(spark, sf, "customer")
            .select("c_custkey").collect()]
    lat, lon = _coords(keys)
    d = _haversine_matrix(lat, lon, lat, lon)
    k = np.array(keys)
    ii, jj = np.where(d <= _RADIUS_KM)
    want = {(int(min(k[i], k[j])), int(max(k[i], k[j])))
            for i, j in zip(ii, jj) if k[i] < k[j]}
    got = {(r.cust_a, r.cust_b)
           for r in q_geo_radius_join(spark, sf).collect()}
    assert got == want
    assert want, "fixture produced no pairs — threshold too tight"


def test_radius_join_distances_are_symmetric_bounded(spark):
    rows = q_geo_radius_join(spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 <= r.dist_km <= _RADIUS_KM
        assert r.cust_a < r.cust_b


def test_nearest_hub_matches_numpy_argmin(spark):
    ckeys = [r.c_custkey for r in
             load_table(spark, SF_DIR, "customer")
             .select("c_custkey").collect()]
    hkeys = sorted(r.n_nationkey for r in
                   load_table(spark, SF_DIR, "nation")
                   .select("n_nationkey").collect())
    clat, clon = _coords(ckeys)
    hlat, hlon = _coords(hkeys)
    d = _haversine_matrix(clat, clon, hlat, hlon)
    # argmin with the (distance, hub_key) tiebreak; hkeys is sorted
    # so np.argmin's first-wins IS the hub_key tiebreak
    assign = np.array(hkeys)[np.argmin(d, axis=1)]
    want_counts = {int(h): int((assign == h).sum()) for h in set(assign)}
    got = {r.hub_key: r.n_customers
           for r in q_geo_nearest_hub(spark, SF_DIR).collect()}
    # hubs with zero members don't appear in the rollup
    assert got == {h: c for h, c in want_counts.items() if c > 0}


def _skewed_coords(keys):
    """From-scratch reimplementation of _skewed_points (u^2 city +
    jitter) — independent of the query AND the oracle."""
    lat, lon = [], []
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        u = (int(h[16:24], 16) % 100000) / 100000.0
        city = int(np.floor(80 * u * u))
        ch = hashlib.md5(f"city{city}".encode()).hexdigest()
        clat = (int(ch[0:8], 16) % 110_000) / 1000.0 - 55.0
        clon = (int(ch[8:16], 16) % 340_000) / 1000.0 - 170.0
        jlat = (int(h[8:16], 16) % 500) / 1000.0 - 0.25
        jlon = (int(h[24:32], 16) % 500) / 1000.0 - 0.25
        lat.append(clat + jlat)
        lon.append(clon + jlon)
    return np.array(lat), np.array(lon)


def test_skewed_radius_join_matches_numpy_brute_force(spark):
    """The salted grid join's per-cell rollup must equal a numpy
    brute force over the same skewed coordinates — proving BOTH that
    the grid stays lossless under city-clustered points and that the
    conditional salting is value-invariant (a salt-mismatch bug
    would drop hot-cell pairs, exactly where this fixture piles
    ~11% of its rows)."""
    from my_mapreduce_spark.queries.geo_ext import q_geo_radius_join_skewed

    sf = "/root/testdata/sf0.01"
    keys = [r.c_custkey for r in
            load_table(spark, sf, "customer")
            .select("c_custkey").collect()]
    lat, lon = _skewed_coords(keys)
    d = np.round(_haversine_matrix(lat, lon, lat, lon), 6)
    k = np.array(keys)
    ii, jj = np.where(d <= _RADIUS_KM)
    want: dict = {}
    for i, j in zip(ii, jj):
        if k[i] < k[j]:  # pair attributed to b's (the larger key's) cell
            cell = (int(np.floor(lat[j] / 0.5)), int(np.floor(lon[j] / 1.0)))
            want[cell] = want.get(cell, 0) + 1
    got = {(r.cy, r.cx): r.n_pairs
           for r in q_geo_radius_join_skewed(spark, sf).collect()}
    assert got == want
    assert want, "fixture produced no pairs — skew generator broken"


def test_skewed_fixture_is_power_law_and_salting_engages(spark):
    """The skew CLAIM (the hottest cell holds >= 8% of all points —
    u^2 over 80 cities puts ~11% in city 0) and the salting TRIGGER
    (at sf0.1 at least one cell crosses _HOT_CELL_ROWS, so the hot
    path is exercised, while sf0.01's 1500 customers stay below it —
    the cold path is what the sf0.01 oracle run covers)."""
    import pyspark.sql.functions as F

    from my_mapreduce_spark.queries.geo_ext import (_HOT_CELL_ROWS,
                                                    _LAT_CELL, _LON_CELL,
                                                    _skewed_points)

    pts = _skewed_points(spark, "/root/testdata/sf0.1")
    cells = (pts.groupBy(F.floor(F.col("lat") / _LAT_CELL).alias("cy"),
                         F.floor(F.col("lon") / _LON_CELL).alias("cx"))
             .count())
    top = cells.orderBy(F.desc("count")).first()["count"]
    total = pts.count()
    assert top / total >= 0.08, f"hottest cell only {top/total:.3f}"
    assert top > _HOT_CELL_ROWS, "sf0.1 must exercise the salted path"
    small = (_skewed_points(spark, "/root/testdata/sf0.01")
             .groupBy(F.floor(F.col("lat") / _LAT_CELL).alias("cy"),
                      F.floor(F.col("lon") / _LON_CELL).alias("cx"))
             .count().orderBy(F.desc("count")).first()["count"])
    assert small <= _HOT_CELL_ROWS, "sf0.01 should cover the cold path"


def test_skewed_join_partitions_on_salt(spark):
    """The structural guarantee the salting buys: the pair join's
    exchange partitions on (cy, cx, salt) — 8-way parallelism inside
    a hot cell — and the per-cell aggregate is a SEPARATE map-side-
    combined exchange on (cy, cx), i.e. the same-key fusion that
    blocked AQE's skew rule (measured: map-chunk split granularity +
    fused agg ignore even forceOptimizeSkewedJoin) is gone."""
    from my_mapreduce_spark.queries.geo_ext import q_geo_radius_join_skewed

    df = q_geo_radius_join_skewed(spark, "/root/testdata/sf0.1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(
        mode.fromString("formatted"))
    import re
    assert re.search(r"hashpartitioning\(cy#\d+L?, cx#\d+L?, salt#\d+",
                     plan), plan[:4000]
    # the final rollup re-partitions WITHOUT the salt
    assert re.search(r"hashpartitioning\(cy#\d+L?, cx#\d+L?, \d+\)", plan)
