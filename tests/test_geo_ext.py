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
