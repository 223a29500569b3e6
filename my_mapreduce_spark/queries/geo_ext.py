"""Geospatial operators — a new §2D family: distributed spatial
join, nearest-facility assignment, and spatial density rollup.

The fixture tables carry no coordinates, so each entity gets a
DETERMINISTIC synthetic position derived from md5 of its key (the
same engine-portable idiom as q_ab_test_welch's arm assignment):
lat ∈ [-60, 60) and lon ∈ [-179, 179) on a 0.001° grid. Both
engines derive identical doubles from identical md5 hex, so every
trig input — and therefore every haversine output — is bit-stable.

- ``q_geo_radius_join``: all customer pairs within 50 km, via the
  GRID-CELL bucketed spatial join (the geohash/S2 pattern): each
  point replicates to its 3×3 neighbor cells on one side only and
  equi-joins the other side's home cell, so candidate volume is
  collision-bounded and the O(n²) haversine cross join never
  exists. Losslessness: cells are sized so two points within the
  radius can never sit more than one cell apart in either axis
  (lat: 50 km / 111.195 km/° = 0.4497° ≤ 0.5° cell; lon: at
  |lat| ≤ 60°, 50 km / (111.195 · cos 60°) = 0.8994° ≤ 1° cell),
  and the lon domain [-179, 179) leaves a 2° antimeridian gap so
  no sub-threshold pair wraps (production layouts use S2/geohash
  cell coverings, which handle wrap natively).
- ``q_geo_nearest_hub``: assign every customer to the nearest of
  25 nation "hubs" (the k-means-assign / nearest-facility shape):
  a broadcast of the O(k) hub table against one customer scan,
  per-customer top-1 by a PARTITIONED window with a total-order
  tiebreak.
- ``q_geo_grid_density``: per-1° cell count + exact-cent balance
  rollup, top-20 densest cells — the heat-map aggregation, one
  hash-agg.

Float discipline: haversine is transcendental, so per-ROW values
are bit-identical across engines (same md5-derived inputs, same
IEEE op sequence) but cross-row SUMS would be order-dependent —
every distance that feeds an aggregate is therefore rounded to 6
decimals and summed as DECIMAL(38,6) (exact, associative), the
q_anova_oneway fold discipline. Threshold CUTS (d ≤ 50 km) compare
on ROUND(d, 6) in BOTH engines: bit-identical trig is empirically
true here but not an IEEE guarantee (libm implementations may
differ by an ulp), and rounding to 6 decimals (~0.1 mm) absorbs
any sub-ulp divergence so a boundary pair can never flip in/out of
the oracle comparison on another platform.

Scale shape (100 TB): the radius join shuffles each side once by
cell (9× replication on one side only); uniform synthetic points
skew nowhere, and the docstring contract for real city-skewed data
is finer cells + AQE skew join (the same salting playbook as
q_skew_salted_join). The hub assign is a broadcast nested loop
over O(k) hubs — the one cross-join shape that is CORRECT to
broadcast. Density is one combiner-reduced hash-agg.
Reference parity: none — north-star §2D spatial depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_R_KM = 6371.0          # mean earth radius
_RADIUS_KM = 50.0       # radius-join threshold
_LAT_CELL = 0.5         # degrees; >= 50/111.195
_LON_CELL = 1.0         # degrees; >= 50/(111.195*cos(60deg))
_TOP_CELLS = 20


def _coord(key: Column, lo: float, span_milli: int, offset: int) -> Column:
    """Deterministic coordinate in [lo, lo + span_milli/1000) on a
    0.001° grid from an md5 slice of the key — identical doubles on
    both engines (same hex → same bigint → same division)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), offset, 8),
               16, 10).cast("long")
    return (h % span_milli) / 1000.0 + lo


def _coord_sql(key: str, lo: float, span_milli: int, offset: int) -> str:
    return (f"(CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), "
            f"{offset}, 8)) AS BIGINT) % {span_milli}) / 1000.0 + ({lo})")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with synthetic (lat, lon): lat ∈ [-60, 60),
    lon ∈ [-179, 179) — the lon domain leaves the antimeridian gap
    the module docstring's losslessness argument needs."""
    c = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    return c.select(
        "c_custkey", "c_acctbal",
        _coord(key, -60.0, 120_000, 1).alias("lat"),
        _coord(key, -179.0, 358_000, 9).alias("lon"))


_POINTS_CTE = f"""
    pts AS (
        SELECT c_custkey, c_acctbal,
               {_coord_sql('c_custkey', -60.0, 120_000, 1)} AS lat,
               {_coord_sql('c_custkey', -179.0, 358_000, 9)} AS lon
        FROM customer)
"""


def _haversine(lat1: Column, lon1: Column,
               lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km; the asin argument is clamped at
    1.0 (floating roundoff can push antipodal-ish sums over 1)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlam = F.radians(lon2 - lon1) / 2
    a = (F.sin(dphi) * F.sin(dphi)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.sin(dlam) * F.sin(dlam))
    return 2 * _R_KM * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (f"2 * {_R_KM} * asin(least(1.0, sqrt("
            f"pow(sin(radians({lat2} - {lat1}) / 2), 2)"
            f" + cos(radians({lat1})) * cos(radians({lat2}))"
            f" * pow(sin(radians({lon2} - {lon1}) / 2), 2))))")


@register(
    "q_geo_radius_join",
    oracle=f"""
    WITH {_POINTS_CTE},
    cells AS (
        SELECT c_custkey, lat, lon,
               CAST(FLOOR(lat / {_LAT_CELL}) AS BIGINT) AS cy,
               CAST(FLOOR(lon / {_LON_CELL}) AS BIGINT) AS cx
        FROM pts),
    a AS (
        SELECT c.c_custkey, c.lat, c.lon,
               c.cy + dy.d AS cy, c.cx + dx.d AS cx
        FROM cells c,
             (SELECT UNNEST([-1, 0, 1]) AS d) dy,
             (SELECT UNNEST([-1, 0, 1]) AS d) dx),
    cand AS (
        SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
               {_haversine_sql('a.lat', 'a.lon', 'b.lat', 'b.lon')} AS d
        FROM a JOIN cells b
          ON a.cy = b.cy AND a.cx = b.cx
         AND a.c_custkey < b.c_custkey)
    SELECT cust_a, cust_b, ROUND(d, 3) AS dist_km
    FROM cand WHERE ROUND(d, 6) <= {_RADIUS_KM}
    """,
    tags=("geo", "spatial-join", "radius", "customer"),
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 50 km — the distributed SPATIAL
    JOIN via grid-cell bucketing. One side replicates each point to
    its 3×3 neighbor cells (a 9× map-side expansion of a narrow
    relation), the other side keeps home cells only, and the join
    is a plain hash equi-join on (cell_y, cell_x) with the key
    inequality — so each true pair is produced EXACTLY once (the
    replica of a that lands in b's home cell) and no O(n²) shape
    exists anywhere. Haversine runs per candidate, never per pair
    of the cross product.

    Losslessness of the cell size (module docstring): within the
    50 km threshold, |Δlat| ≤ 0.4497° < one 0.5° lat cell and, at
    |lat| ≤ 60°, |Δlon| ≤ 0.8994° < one 1° lon cell — so true
    pairs are never more than one cell apart per axis and the 3×3
    expansion covers them all; the lon domain's 2° antimeridian gap
    rules out wrap pairs. tests/test_geo_ext.py re-proves the pair
    set against a from-scratch numpy brute force.

    At 100 TB: candidate volume is density-bounded per cell;
    city-skewed real data takes finer cells + AQE skew join (the
    q_skew_salted_join playbook). The oracle runs the same
    cell-bucketed algebra in DuckDB — candidate-bounded there too.
    """
    pts = _points(spark, sf_dir)
    cells = pts.select(
        "c_custkey", "lat", "lon",
        F.floor(F.col("lat") / _LAT_CELL).alias("cy"),
        F.floor(F.col("lon") / _LON_CELL).alias("cx"))
    off = F.array([F.lit(d) for d in (-1, 0, 1)])
    a = (cells
         .withColumn("dy", F.explode(off))
         .withColumn("dx", F.explode(off))
         .select("c_custkey", "lat", "lon",
                 (F.col("cy") + F.col("dy")).alias("cy"),
                 (F.col("cx") + F.col("dx")).alias("cx")))
    b = cells.select(F.col("c_custkey").alias("cust_b"),
                     F.col("lat").alias("lat_b"),
                     F.col("lon").alias("lon_b"), "cy", "cx")
    d = _haversine(F.col("lat"), F.col("lon"),
                   F.col("lat_b"), F.col("lon_b"))
    return (a.join(b, ["cy", "cx"])
            .where(F.col("c_custkey") < F.col("cust_b"))
            .withColumn("d", d)
            .where(F.round(F.col("d"), 6) <= _RADIUS_KM)
            .select(F.col("c_custkey").alias("cust_a"), "cust_b",
                    F.round("d", 3).alias("dist_km")))


@register(
    "q_geo_nearest_hub",
    oracle=f"""
    WITH {_POINTS_CTE},
    hubs AS (
        SELECT n_nationkey AS hub_key,
               {_coord_sql('n_nationkey', -60.0, 120_000, 1)} AS hlat,
               {_coord_sql('n_nationkey', -179.0, 358_000, 9)} AS hlon
        FROM nation),
    scored AS (
        SELECT p.c_custkey, h.hub_key,
               {_haversine_sql('p.lat', 'p.lon', 'h.hlat', 'h.hlon')} AS d,
               ROW_NUMBER() OVER (
                   PARTITION BY p.c_custkey
                   ORDER BY {_haversine_sql('p.lat', 'p.lon',
                                            'h.hlat', 'h.hlon')},
                            h.hub_key) AS rk
        FROM pts p CROSS JOIN hubs h)
    SELECT hub_key,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(CAST(ROUND(d, 6) AS DECIMAL(38,6)))
                      AS DOUBLE) / COUNT(*), 3) AS avg_dist_km
    FROM scored WHERE rk = 1
    GROUP BY hub_key
    """,
    tags=("geo", "nearest-neighbor", "assignment", "customer", "nation"),
)
def q_geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every customer to its nearest nation hub (25 hubs at
    md5-derived positions) and roll up per-hub membership + mean
    distance — the k-means-assign / nearest-facility operator.

    Engine shape: the hub table is O(k) and BROADCAST — the one
    cross-join shape that is correct to broadcast at any corpus
    size — then per-customer top-1 via a window PARTITIONED by
    customer (never global) with the (distance, hub_key) total-order
    tiebreak. The rollup sums per-row distances rounded to 6
    decimals as DECIMAL(38,6): transcendental per-row values are
    bit-stable across engines, but a double SUM across rows would
    be order-dependent — the module's float fold discipline.
    """
    pts = _points(spark, sf_dir)
    hubs = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("hub_key"),
        _coord(F.col("n_nationkey"), -60.0, 120_000, 1).alias("hlat"),
        _coord(F.col("n_nationkey"), -179.0, 358_000, 9).alias("hlon"))
    d = _haversine(F.col("lat"), F.col("lon"),
                   F.col("hlat"), F.col("hlon"))
    scored = (pts.crossJoin(F.broadcast(hubs))
              .withColumn("d", d))
    w = Window.partitionBy("c_custkey").orderBy("d", "hub_key")
    best = scored.withColumn("rk", F.row_number().over(w)) \
        .where(F.col("rk") == 1)
    return (best.groupBy("hub_key")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(
                     F.sum(F.round(F.col("d"), 6).cast("decimal(38,6)"))
                     .cast("double") / F.count(F.lit(1)), 3)
                 .alias("avg_dist_km")))


@register(
    "q_geo_grid_density",
    oracle=f"""
    WITH {_POINTS_CTE}
    SELECT CAST(FLOOR(lat) AS BIGINT) AS cell_lat,
           CAST(FLOOR(lon) AS BIGINT) AS cell_lon,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS balance_cents
    FROM pts
    GROUP BY 1, 2
    ORDER BY n_customers DESC, cell_lat, cell_lon
    LIMIT {_TOP_CELLS}
    """,
    tags=("geo", "density", "rollup", "customer"),
)
def q_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 densest 1°×1° cells with exact-cent balance totals —
    the spatial heat-map rollup: one combiner-reduced hash-agg over
    (floor(lat), floor(lon)), then a top-k by the (count desc,
    cell) total order (TakeOrderedAndProject, never a global sort
    of all cells). The cents scaling keeps the money SUM exact
    (the q_partitioned_write_prune idiom); counts and cents are the
    only aggregates, so no float fold exists at all."""
    pts = _points(spark, sf_dir)
    return (pts.groupBy(
        F.floor("lat").alias("cell_lat"),
        F.floor("lon").alias("cell_lon"))
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
             .alias("balance_cents"))
        .orderBy(F.desc("n_customers"), "cell_lat", "cell_lon")
        .limit(_TOP_CELLS))


_PATH_TOP = 20


@register(
    "q_geo_path_length",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               {_coord_sql('event_id', -60.0, 120_000, 1)} AS lat,
               {_coord_sql('event_id', -179.0, 358_000, 9)} AS lon
        FROM events),
    hops AS (
        SELECT user_id,
               LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon,
               lat, lon
        FROM ev WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id)),
    d AS (
        SELECT user_id,
               CAST(ROUND({_haversine_sql('plat', 'plon', 'lat', 'lon')},
                          6) AS DECIMAL(38,6)) AS hop_km
        FROM hops WHERE plat IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_hops,
           ROUND(CAST(SUM(hop_km) AS DOUBLE), 3) AS path_km
    FROM d GROUP BY user_id
    ORDER BY path_km DESC, user_id LIMIT {_PATH_TOP}
    """,
    tags=("geo", "trajectory", "window", "events"),
)
def q_geo_path_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory length: each event gets a deterministic
    md5-derived position (the module's coordinate idiom, keyed by
    event_id), a user's path is their events in time order, and the
    path length is the haversine sum over consecutive hops — the
    windowed-geo operator (fleet mileage, user roaming, GPS-track
    rollups) composing the family's distance kernel with the
    engine's lag machinery. Top-20 longest paths.

    Engine shape: one scan, one USER-partitioned window (never
    global) for the lag pair, then a per-user hash-agg; hop
    distances are transcendental so each is rounded to 6 decimals
    and summed as DECIMAL(38,6) — the module's float fold
    discipline, making the km total order-independent and
    engine-exact. Top-k via TakeOrderedAndProject. The tie-break
    (ts, then event_id) makes the hop sequence — and therefore the
    sum — deterministic under same-timestamp events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        _coord(F.col("event_id"), -60.0, 120_000, 1).alias("lat"),
        _coord(F.col("event_id"), -179.0, 358_000, 9).alias("lon"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = ev.select(
        "user_id",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        "lat", "lon").where(F.col("plat").isNotNull())
    hop_km = F.round(_haversine(F.col("plat"), F.col("plon"),
                                F.col("lat"), F.col("lon")), 6) \
        .cast("decimal(38,6)")
    return (hops.select("user_id", hop_km.alias("hop_km"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_hops"),
                 F.round(F.sum("hop_km").cast("double"), 3)
                 .alias("path_km"))
            .orderBy(F.desc("path_km"), "user_id").limit(_PATH_TOP))


@register(
    "q_geo_morans_i",
    oracle=f"""
    WITH {_POINTS_CTE},
    cells AS (
        SELECT c_custkey, lat, lon,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
               CAST(FLOOR(lat / {_LAT_CELL}) AS BIGINT) AS cy,
               CAST(FLOOR(lon / {_LON_CELL}) AS BIGINT) AS cx
        FROM pts),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s FROM cells),
    a AS (
        SELECT c.c_custkey, c.lat, c.lon, c.cents,
               c.cy + dy.d AS cy, c.cx + dx.d AS cx
        FROM cells c,
             (SELECT UNNEST([-1, 0, 1]) AS d) dy,
             (SELECT UNNEST([-1, 0, 1]) AS d) dx),
    nbr AS (  -- ordered pairs within eps: both directions counted
        SELECT a.cents AS ca, b.cents AS cb
        FROM a JOIN cells b ON a.cy = b.cy AND a.cx = b.cx
         AND a.c_custkey <> b.c_custkey
        WHERE ROUND({_haversine_sql('a.lat', 'a.lon', 'b.lat', 'b.lon')},
                    6) <= {_RADIUS_KM}),
    num AS (  -- centered cross products, exact: X_i = n*x_i - S
        SELECT CAST(COUNT(*) AS BIGINT) AS w,
               CAST(SUM(CAST(tot.n * ca - tot.s AS DECIMAL(38,0))
                        * CAST(tot.n * cb - tot.s AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sxx
        FROM nbr CROSS JOIN tot GROUP BY tot.n, tot.s),
    den AS (
        SELECT CAST(SUM(CAST(tot.n * cents - tot.s AS DECIMAL(38,0))
                        * CAST(tot.n * cents - tot.s AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS sdd
        FROM cells CROSS JOIN tot GROUP BY tot.n, tot.s)
    SELECT tot.n, num.w AS w_pairs,
           ROUND(CAST(tot.n AS DOUBLE) / num.w
                 * (CAST(num.sxx AS DOUBLE) / CAST(den.sdd AS DOUBLE)),
                 6) AS morans_i,
           ROUND(-1.0 / (tot.n - 1), 6) AS expected_i
    FROM tot CROSS JOIN num CROSS JOIN den
    """,
    tags=("geo", "spatial-stats", "autocorrelation", "customer"),
)
def q_geo_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I — IS account balance spatially clustered?
    The canonical spatial-autocorrelation statistic over the
    customer point set, with the binary 50 km neighbor matrix
    produced by the SAME lossless grid join as q_geo_radius_join
    (both directions this time — w_ij is symmetric, so pairs count
    twice, which is exactly W = Σw_ij). On md5-uniform synthetic
    positions the statistic correctly hovers near its null
    expectation E[I] = -1/(n-1): the query is the instrument, the
    fixture is the null calibration.

    Exactness: centered values stay INTEGER by scaling with n
    (X_i = n·x_i − S — exact cents moments, no float mean), so
    every cross product and the denominator are exact
    DECIMAL(38,0) sums; the statistic is one fixed IEEE expression
    at the end (the q_anova_oneway discipline with zero rounding
    before the final step). Engine shape: one scan to cells, the
    candidate-bounded grid join for the numerator, one hash-agg
    for the denominator — no O(n²) anywhere, same scale posture as
    the radius join. Reference parity: none — north-star §2D
    spatial-statistics depth.
    """
    pts = _points(spark, sf_dir)
    cells = pts.select(
        "c_custkey", "lat", "lon",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        F.floor(F.col("lat") / _LAT_CELL).alias("cy"),
        F.floor(F.col("lon") / _LON_CELL).alias("cx"))
    tot = cells.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("cents").alias("s"))
    off = F.array([F.lit(d) for d in (-1, 0, 1)])
    a = (cells
         .withColumn("dy", F.explode(off))
         .withColumn("dx", F.explode(off))
         .select("c_custkey", "lat", "lon",
                 F.col("cents").alias("ca"),
                 (F.col("cy") + F.col("dy")).alias("cy"),
                 (F.col("cx") + F.col("dx")).alias("cx")))
    b = cells.select(F.col("c_custkey").alias("ck_b"),
                     F.col("lat").alias("lat_b"),
                     F.col("lon").alias("lon_b"),
                     F.col("cents").alias("cb"), "cy", "cx")
    d = _haversine(F.col("lat"), F.col("lon"),
                   F.col("lat_b"), F.col("lon_b"))
    nbr = (a.join(b, ["cy", "cx"])
           .where((F.col("c_custkey") != F.col("ck_b"))
                  & (F.round(d, 6) <= _RADIUS_KM))
           .select("ca", "cb"))
    xa = (F.col("n") * F.col("ca") - F.col("s")).cast("decimal(38,0)")
    xb = (F.col("n") * F.col("cb") - F.col("s")).cast("decimal(38,0)")
    # groupBy the (n, s) moments, not a global agg: with ZERO pairs
    # (sparse fixtures) a global agg would emit one null row while
    # the oracle's grouped agg emits none — the statistic is
    # undefined without neighbors, so zero rows is the contract
    num = (nbr.crossJoin(F.broadcast(tot))
           .groupBy("n", "s")
           .agg(F.count(F.lit(1)).alias("w"),
                F.sum(xa * xb).cast("decimal(38,0)").alias("sxx")))
    xc = (F.col("n") * F.col("cents") - F.col("s")).cast("decimal(38,0)")
    den = (cells.crossJoin(F.broadcast(tot))
           .agg(F.sum(xc * xc).cast("decimal(38,0)").alias("sdd")))
    return (num.crossJoin(F.broadcast(den))
            .select("n", F.col("w").alias("w_pairs"),
                    F.round(F.col("n").cast("double") / F.col("w")
                            * (F.col("sxx").cast("double")
                               / F.col("sdd").cast("double")), 6)
                    .alias("morans_i"),
                    F.round(-1.0 / (F.col("n") - 1), 6)
                    .alias("expected_i")))


@register(
    "q_geo_bounding_box",
    oracle=f"""
    WITH {_POINTS_CTE}
    SELECT c.c_nationkey AS nation_key,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(MIN(p.lat), 6) AS min_lat,
           ROUND(MAX(p.lat), 6) AS max_lat,
           ROUND(MIN(p.lon), 6) AS min_lon,
           ROUND(MAX(p.lon), 6) AS max_lon,
           ROUND(CAST(SUM(CAST(ROUND(p.lat, 6) AS DECIMAL(38,6)))
                      AS DOUBLE) / COUNT(*), 6) AS centroid_lat,
           ROUND(CAST(SUM(CAST(ROUND(p.lon, 6) AS DECIMAL(38,6)))
                      AS DOUBLE) / COUNT(*), 6) AS centroid_lon
    FROM pts p JOIN customer c ON p.c_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    tags=("geo", "extent", "rollup", "customer"),
)
def q_geo_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation spatial EXTENT of the customer point set — the
    ST_Extent/ST_Centroid analog: bounding box (min/max lat/lon)
    plus the centroid, one hash-agg per nation. Extents feed every
    spatial planner (tile prefetch, viewport queries, partition
    pruning by region); this is the rollup that sizes them.

    Exactness: MIN/MAX over identical doubles are fold-order-FREE
    (no rounding discipline needed); only the centroid means fold
    floats across rows, so they ride the rounded-then-decimal sum
    (the module discipline). One combiner-reduced aggregate,
    O(nations) output — the cheapest member of the family, and the
    one a production job runs first to bound all the others."""
    pts = _points(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_nationkey")
    dec6 = lambda col: F.round(F.col(col), 6).cast("decimal(38,6)")  # noqa: E731
    return (pts.join(c, "c_custkey")
            .groupBy(F.col("c_nationkey").alias("nation_key"))
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.min("lat"), 6).alias("min_lat"),
                 F.round(F.max("lat"), 6).alias("max_lat"),
                 F.round(F.min("lon"), 6).alias("min_lon"),
                 F.round(F.max("lon"), 6).alias("max_lon"),
                 F.round(F.sum(dec6("lat")).cast("double")
                         / F.count(F.lit(1)), 6).alias("centroid_lat"),
                 F.round(F.sum(dec6("lon")).cast("double")
                         / F.count(F.lit(1)), 6).alias("centroid_lon")))


# --- skewed-coordinate variant (round-8 verdict #8) -----------------------

_N_CITIES = 80        # zipf-ish city count; city 0 holds ~(1/80)^(1/2)
                      # ≈ 11% of all points (u^2 transform below — the
                      # u^3 first cut put 29% in one city, whose
                      # quadratic within-radius pair count made even
                      # the 20x tier infeasible: workload tuning, not
                      # plan tuning)
_JITTER_MILLI = 500   # ±0.25° jitter around the city center
_HOT_CELL_ROWS = 1000  # a home cell above this row count gets salted
# ADAPTIVE salt schedule (round-10 verdict #2): a hot cell's salt
# fan-out grows with its occupancy — salt_n = ceil(n_cell /
# _SALT_TARGET_ROWS), clamped to _GEO_SALT_MAX — so the per-salt
# pair slice stays ~n_cell x _SALT_TARGET_ROWS however dense the
# cell gets. The round-9 fixed fan-out of 8 was sized for sf0.1's
# ~1.6k-row hot cell; at the 30x tier that cell holds ~50k rows and
# 8 slices leave 24 of 32 cores idle through the quadratic kernel
# (measured, BASELINE round-11). The schedule is value-invariant
# (salting only splits join keys), so every oracle stays unsalted.
_SALT_TARGET_ROWS = 250
_GEO_SALT_MAX = 256


def _hot_cells(cells):
    """Broadcastable hot-cell relation: (cy, cx, is_hot, salt_n) for
    cells above _HOT_CELL_ROWS, with the adaptive fan-out. Cell
    counts are grid-bounded, so the broadcast is always tiny."""
    return F.broadcast(
        cells.groupBy("cy", "cx").agg(F.count(F.lit(1)).alias("n_cell"))
        .where(F.col("n_cell") > _HOT_CELL_ROWS)
        .select("cy", "cx", F.lit(True).alias("is_hot"),
                F.least(F.ceil(F.col("n_cell") / _SALT_TARGET_ROWS),
                        F.lit(_GEO_SALT_MAX)).cast("int").alias("salt_n")))


def _salt_explode_col():
    """Replicated-side salt values: every salt in [0, salt_n) for hot
    target cells, the single salt 0 for cold ones."""
    return F.explode(
        F.when(F.col("is_hot"),
               F.sequence(F.lit(0), F.col("salt_n") - F.lit(1)))
        .otherwise(F.array(F.lit(0))))


def _salt_home_col(key: str):
    """Home-side salt assignment: hash-spread across the cell's
    salt_n slices when hot, 0 when cold."""
    return (F.when(F.col("is_hot"),
                   F.pmod(F.xxhash64(key), F.col("salt_n")).cast("int"))
            .otherwise(F.lit(0)))


def _skew_u_sql(key: str) -> str:
    """Uniform u ∈ [0, 1) on a 1e-5 grid from md5 slice @17 — the
    zipf driver, identical doubles on both engines."""
    return (f"(CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 17, 8)) "
            f"AS BIGINT) % 100000) / 100000.0")


def _skewed_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with CITY-SKEWED synthetic positions: a u^2 transform
    of a uniform md5 draw picks one of _N_CITIES cities (power-law
    occupancy — city 0 alone holds ~11% of all points, with a long
    tail after; the u^3 first cut concentrated 29% in one city, which
    the _N_CITIES comment documents), and the point lands within
    ±0.25° of the
    city's md5-derived center. Cell occupancy is therefore power-law
    — the workload the uniform _points fixture cannot produce and
    the module's 'finer cells + AQE skew join' contract was written
    for."""
    c = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    h = lambda off: F.conv(  # noqa: E731
        F.substring(F.md5(key.cast("string")), off, 8), 16, 10).cast("long")
    u = (h(17) % 100000) / 100000.0
    city = F.floor(F.lit(_N_CITIES) * u * u).cast("int")
    jlat = ((h(9) % _JITTER_MILLI) / 1000.0) - (_JITTER_MILLI / 2000.0)
    jlon = ((h(25) % _JITTER_MILLI) / 1000.0) - (_JITTER_MILLI / 2000.0)
    ckey = F.concat(F.lit("city"), city)
    return c.select(
        "c_custkey",
        (_coord(ckey, -55.0, 110_000, 1) + jlat).alias("lat"),
        (_coord(ckey, -170.0, 340_000, 9) + jlon).alias("lon"))


# u*u spelled as multiplication (NOT POW) so both engines run the
# identical IEEE sequence Spark's u*u compiles to — a libm pow could
# diverge by an ulp and flip a floor() city assignment
_SKEWED_POINTS_CTE = f"""
    uu AS (
        SELECT c_custkey,
               {_skew_u_sql('c_custkey')} AS u,
               (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))
                     AS BIGINT) % {_JITTER_MILLI}) / 1000.0
                   - {_JITTER_MILLI / 2000.0} AS jlat,
               (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 25, 8))
                     AS BIGINT) % {_JITTER_MILLI}) / 1000.0
                   - {_JITTER_MILLI / 2000.0} AS jlon
        FROM customer),
    cty AS (
        SELECT c_custkey, jlat, jlon,
               'city' || CAST(CAST(FLOOR({_N_CITIES} * u * u) AS INT)
                              AS VARCHAR) AS ck
        FROM uu),
    pts AS (
        SELECT c_custkey,
               ({_coord_sql('ck', -55.0, 110_000, 1)} + jlat) AS lat,
               ({_coord_sql('ck', -170.0, 340_000, 9)} + jlon) AS lon
        FROM cty)
"""


@register(
    "q_geo_radius_join_skewed",
    oracle=f"""
    WITH {_SKEWED_POINTS_CTE},
    cells AS (
        SELECT c_custkey, lat, lon,
               CAST(FLOOR(lat / {_LAT_CELL}) AS BIGINT) AS cy,
               CAST(FLOOR(lon / {_LON_CELL}) AS BIGINT) AS cx
        FROM pts),
    a AS (
        SELECT c.c_custkey, c.lat, c.lon,
               c.cy + dy.d AS cy, c.cx + dx.d AS cx
        FROM cells c,
             (SELECT UNNEST([-1, 0, 1]) AS d) dy,
             (SELECT UNNEST([-1, 0, 1]) AS d) dx),
    pairs AS (
        SELECT b.cy, b.cx,
               {_haversine_sql('a.lat', 'a.lon', 'b.lat', 'b.lon')} AS d
        FROM a JOIN cells b
          ON a.cy = b.cy AND a.cx = b.cx
         AND a.c_custkey < b.c_custkey)
    SELECT cy, cx,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(CAST(ROUND(d, 6) AS DECIMAL(38,6)))
                      AS DOUBLE), 3) AS sum_dist_km
    FROM pairs WHERE ROUND(d, 6) <= {_RADIUS_KM}
    GROUP BY cy, cx
    """,
    tags=("geo", "spatial-join", "radius", "skew", "customer"),
)
def q_geo_radius_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grid-cell radius join under POWER-LAW cell occupancy — the
    city-skewed workload the uniform q_geo_radius_join cannot stress
    (round-8 verdict #8: the family's 'finer cells + AQE skew join'
    scale contract was asserted but unmeasured because md5 points
    are uniform). Synthetic cities via a u^2 zipf transform: the
    hottest cell holds ~11% of ALL customers (asserted >=8% in
    test_geo_ext), so the (cy, cx) join
    key distribution is exactly the pathology real check-in /
    delivery data shows.

    Same lossless cell algebra as q_geo_radius_join (cells sized so
    true pairs are never >1 cell apart per axis; ROUND(d,6) cut on
    both engines); output is the per-cell pair rollup (count +
    decimal-folded distance sum), so the result stays cell-bounded
    while the JOIN does the full density-quadratic pair work inside
    the hot cells.

    Scale path — CONDITIONAL SALTING, applied, not asserted (the
    q_skew_salted_join playbook specialized to a self-join): a cheap
    per-cell count + broadcast marks HOT home cells (> 1000 rows,
    _HOT_CELL_ROWS) and sizes each one's fan-out ADAPTIVELY —
    salt_n = ceil(n_cell / _SALT_TARGET_ROWS) capped at
    _GEO_SALT_MAX — the home side salting its hot rows by
    pmod(xxhash64(key), salt_n) while the replicated side explodes
    hot target cells across all salt_n values, so the hot cell's
    quadratic pair generation splits into enough parallel tasks to
    keep every core busy AT ANY DENSITY (the round-9 fixed fan-out
    of 8 starved 24 of 32 cores on the 30x tier's 50k-row hot cell
    — measured, BASELINE round-11), and COLD cells pay nothing
    (salt 0, no extra replication). AQE's skew join is NOT the
    guard here, measured twice: (a) its split points are map-output
    chunks, so a hot key fed by few mappers cannot split however
    low the thresholds; (b) the same-key aggregate fused onto the
    join blocks the rule even under forceOptimizeSkewedJoin. The
    salt changes join keys away from the agg keys, which also
    un-fuses the aggregate into a proper map-side combine. Salting
    is value-invariant, so the oracle is the UNSALTED algebra.

    Output growth under replication is density-quadratic IN THE
    WORKLOAD (pairs per hot cell; city centers are fixed, so
    replicas pile into the same cells — the dup-saturation caveat
    scale_probe documents for LSH), recorded with pairs/sec
    normalization in BASELINE.md.
    """
    pts = _skewed_points(spark, sf_dir)
    cells = pts.select(
        "c_custkey", "lat", "lon",
        F.floor(F.col("lat") / _LAT_CELL).alias("cy"),
        F.floor(F.col("lon") / _LON_CELL).alias("cx"))
    hot = _hot_cells(cells)
    off = F.array([F.lit(d) for d in (-1, 0, 1)])
    a = (cells
         .withColumn("dy", F.explode(off))
         .withColumn("dx", F.explode(off))
         .select("c_custkey", "lat", "lon",
                 (F.col("cy") + F.col("dy")).alias("cy"),
                 (F.col("cx") + F.col("dx")).alias("cx")))
    a = (a.join(hot, ["cy", "cx"], "left")
         .withColumn("salt", _salt_explode_col())
         .drop("is_hot", "salt_n"))
    b = (cells.join(hot, ["cy", "cx"], "left")
         .select(F.col("c_custkey").alias("cust_b"),
                 F.col("lat").alias("lat_b"),
                 F.col("lon").alias("lon_b"), "cy", "cx",
                 _salt_home_col("c_custkey").alias("salt")))
    d = _haversine(F.col("lat"), F.col("lon"),
                   F.col("lat_b"), F.col("lon_b"))
    # shuffle_hash hint: BOTH sides are corpus-sized at scale, so the
    # static planner's broadcast of the 9x-replicated side (cheap at
    # fixture scale) is the 100 TB anti-pattern; pinning a shuffled
    # hash join is also what makes the salt effective — the exchange
    # partitions on (cy, cx, salt)
    return (a.join(b.hint("shuffle_hash"), ["cy", "cx", "salt"])
            .where(F.col("c_custkey") < F.col("cust_b"))
            .withColumn("d", d)
            .where(F.round(F.col("d"), 6) <= _RADIUS_KM)
            .groupBy("cy", "cx")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.sum(F.round(F.col("d"), 6)
                               .cast("decimal(38,6)")).cast("double"), 3)
                 .alias("sum_dist_km")))


_DBSCAN_EPS_KM = 25.0   # eps <= 50 km, so the radius-join cell sizing
                        # (0.5 deg lat / 1 deg lon) stays lossless
_DBSCAN_MIN_PTS = 5     # |N_eps(p)| including p itself


@register(
    "q_geo_dbscan_labels",
    oracle=f"""
    WITH {_SKEWED_POINTS_CTE},
    cells AS (
        SELECT c_custkey, lat, lon,
               CAST(FLOOR(lat / {_LAT_CELL}) AS BIGINT) AS cy,
               CAST(FLOOR(lon / {_LON_CELL}) AS BIGINT) AS cx
        FROM pts),
    reps AS (
        SELECT c.c_custkey, c.lat, c.lon,
               c.cy + dy.d AS cy, c.cx + dx.d AS cx
        FROM cells c,
             (VALUES (-1), (0), (1)) AS dy(d),
             (VALUES (-1), (0), (1)) AS dx(d)),
    nbr AS (
        SELECT a.c_custkey AS p, b.c_custkey AS q
        FROM reps a JOIN cells b USING (cy, cx)
        WHERE a.c_custkey <> b.c_custkey
          AND ROUND({_haversine_sql('a.lat', 'a.lon', 'b.lat', 'b.lon')},
                    6) <= {_DBSCAN_EPS_KM}),
    cnt AS (
        SELECT c.c_custkey,
               CAST(COUNT(nbr.q) AS BIGINT) AS n_nbr
        FROM cells c LEFT JOIN nbr ON nbr.p = c.c_custkey
        GROUP BY c.c_custkey),
    flags AS (
        SELECT c_custkey, n_nbr,
               n_nbr + 1 >= {_DBSCAN_MIN_PTS} AS is_core
        FROM cnt),
    lab AS (
        SELECT f.c_custkey, f.n_nbr,
               CASE WHEN f.is_core THEN 'core'
                    WHEN EXISTS (
                        SELECT 1 FROM nbr JOIN flags g
                          ON g.c_custkey = nbr.q AND g.is_core
                        WHERE nbr.p = f.c_custkey) THEN 'border'
                    ELSE 'noise' END AS label
        FROM flags f)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(n_nbr) AS BIGINT) AS sum_nbrs,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM lab GROUP BY label
    """,
    tags=("geo", "dbscan", "density", "clustering", "skew", "customer"),
)
def q_geo_dbscan_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density classification (core / border / noise) over the
    city-skewed point fixture — the density-based clustering family
    beside the partition-based q_kmeans_lloyd: city cores are dense
    (eps = 25 km, minPts = 5 including self), city fringes become
    border points reachable from a core, and the zipf tail's isolated
    customers are noise. The expensive step — |N_eps(p)| for every
    point — is the SAME grid-cell candidate algebra as
    q_geo_radius_join (3x3 replication on one side, home cells on
    the other; eps <= 50 km keeps the cell sizing lossless), so no
    O(n^2) shape exists; core flags are one aggregate over the
    candidate pairs and border reachability is ONE more semi-join of
    the pair relation against the core flags. Full-cluster expansion
    (the transitive labeling) is q_dedup_clusters' CC machinery over
    core-core edges; this operator is the per-point classification
    stage every distributed DBSCAN (e.g. MR-DBSCAN) runs first, and
    its output is grouped per label (counts + exact neighbor-degree
    sums + key range) so the oracle is order-free.

    Distance cuts compare ROUND(d, 6) on both engines (the module's
    threshold discipline); neighbor counts are exact integers.

    At 100 TB — and measured at the 30x tier (round-11): the pair
    relation is NEVER materialized. The round-10 shape persisted nbr
    (p, q) for its two consumers; at 30x density (~50k-row hot cell,
    ~2.4e9 candidate pairs) that persist died with
    UNABLE_TO_ACQUIRE_MEMORY — a pair relation quadratic in local
    density cannot be a cached intermediate at any fixed memory
    budget. Instead: PASS 1 folds the grid join straight into the
    per-point degree aggregate (partial agg inside the join task, so
    only point-linear partial counts ever shuffle); PASS 2 re-runs
    the grid kernel ONLY for non-core probes against core homes —
    the border test needs nothing else, and since cities make their
    members core, the non-core side is the sparse minority: pass 2
    is a sliver of pass 1's volume. Both passes use the adaptive
    per-cell salt schedule (_hot_cells), so the dense cells' kernel
    splits into enough tasks to keep every core busy at any density.
    """
    pts = _skewed_points(spark, sf_dir)
    # consumers: hot-cell census, pass-1 sides, pass-2 sides — pin
    # the narrow relation once (MEMORY_AND_DISK; caller releases via
    # the caching.py contract) instead of re-deriving md5 coords
    cells = pts.select(
        "c_custkey", "lat", "lon",
        F.floor(F.col("lat") / _LAT_CELL).alias("cy"),
        F.floor(F.col("lon") / _LON_CELL).alias("cx")).persist()
    # conditional salting of the hot city cells — the
    # q_geo_radius_join_skewed playbook (value-invariant, so the
    # oracle stays the unsalted algebra; AQE's skew rule provably
    # cannot fire on this shape — SCALE.md round-9), with the
    # fan-out sized adaptively per cell (_hot_cells)
    hot = _hot_cells(cells)
    off = F.array([F.lit(d) for d in (-1, 0, 1)])
    d = _haversine(F.col("lat_a"), F.col("lon_a"),
                   F.col("lat_b"), F.col("lon_b"))

    def grid_pairs(probe_side: DataFrame, home_side: DataFrame) -> DataFrame:
        """Salted grid-cell eps-neighbor pairs (p, q) between two
        point subsets — 3x3 replication on the probe side, home
        cells + hash salt on the other; shuffle_hash pinned (both
        sides corpus-sized at scale; the exchange partitions on
        (cy, cx, salt), which is what makes the salt effective)."""
        reps = (probe_side
                .withColumn("dy", F.explode(off))
                .withColumn("dx", F.explode(off))
                .select(F.col("c_custkey").alias("p"),
                        F.col("lat").alias("lat_a"),
                        F.col("lon").alias("lon_a"),
                        (F.col("cy") + F.col("dy")).alias("cy"),
                        (F.col("cx") + F.col("dx")).alias("cx")))
        reps = (reps.join(hot, ["cy", "cx"], "left")
                .withColumn("salt", _salt_explode_col())
                .drop("is_hot", "salt_n"))
        home = (home_side.join(hot, ["cy", "cx"], "left")
                .select(F.col("c_custkey").alias("q"),
                        F.col("lat").alias("lat_b"),
                        F.col("lon").alias("lon_b"), "cy", "cx",
                        _salt_home_col("c_custkey").alias("salt")))
        return (reps.join(home.hint("shuffle_hash"), ["cy", "cx", "salt"])
                .where(F.col("p") != F.col("q"))
                .where(F.round(d, 6) <= _DBSCAN_EPS_KM)
                .select("p", "q"))

    # PASS 1: per-point degree, aggregated INSIDE the kernel pass —
    # the quadratic pair stream collapses to point-linear partial
    # counts before anything shuffles or caches
    deg = grid_pairs(cells, cells).groupBy("p") \
        .agg(F.count(F.lit(1)).alias("n_nbr"))
    flags = (cells.select(F.col("c_custkey").alias("p"))
             .join(deg, "p", "left")
             .select("p", F.coalesce("n_nbr", F.lit(0)).alias("n_nbr"))
             .withColumn("is_core",
                         F.col("n_nbr") + 1 >= _DBSCAN_MIN_PTS)
             .persist())  # point-linear; feeds pass-2 filters + labels
    # PASS 2: border reachability — rerun the kernel only where it
    # can matter: non-core probes against core homes
    noncore = cells.join(
        flags.where(~F.col("is_core")).select(F.col("p").alias("c_custkey")),
        "c_custkey", "leftsemi")
    corepts = cells.join(
        flags.where("is_core").select(F.col("p").alias("c_custkey")),
        "c_custkey", "leftsemi")
    core_reach = (grid_pairs(noncore, corepts)
                  .select("p").distinct()
                  .withColumn("reach", F.lit(True)))
    lab = (flags.join(core_reach, "p", "left")
           .select("p", "n_nbr",
                   F.when(F.col("is_core"), "core")
                   .when(F.coalesce("reach", F.lit(False)), "border")
                   .otherwise("noise").alias("label")))
    return (lab.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.sum("n_nbr").alias("sum_nbrs"),
                 F.min("p").alias("min_key"),
                 F.max("p").alias("max_key")))
