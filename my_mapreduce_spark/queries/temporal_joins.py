"""Temporal join operators over ``events``: as-of join and range join.

The reference has no joins at all (SURVEY.md §2C — its ceiling is
group-by-key at ``mr/worker.go:194-204``); these are the two
time-series join shapes a training-data/event pipeline needs that
stock SQL engines special-case (DuckDB has ASOF JOIN; Spark does
not), implemented here with scale-correct plans:

- **as-of join** — union-then-window: tag both sides, union, one
  window per key carrying the latest left-side payload forward.
  ONE shuffle on the join key, no range explosion, no skew beyond
  the key's own cardinality. This is the plan that survives 100 TB;
  the naive alternative (theta join ``ts_l <= ts_r`` + row_number)
  is quadratic per key.
- **range join** — bucketed equi-join: quantize time into
  interval-width buckets, replicate each probe row into the 2
  covering buckets, equi-join on (key, bucket), then apply the
  exact range predicate. Turns an O(n^2-per-key) theta join into a
  near-equi join whose fan-out is bounded by bucket occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.registry import register

_RANGE_US = 300 * 1_000_000  # 5-minute follow window


@register(
    "q_asof_join",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
               FROM events),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    v AS (SELECT * FROM e WHERE event_type = 'view'),
    j AS (
        SELECT p.event_id AS purchase_id, p.user_id,
               v.event_id AS prior_view_id,
               p.ts_us - v.ts_us AS gap_us,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts_us DESC, v.event_id DESC) AS rn
        FROM p JOIN v ON v.user_id = p.user_id AND v.ts_us <= p.ts_us)
    SELECT purchase_id, user_id, prior_view_id, gap_us FROM j WHERE rn = 1
    """,
    tags=("join", "asof", "events"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent view by the same
    user at or before it (inclusive as-of), via union-then-window.

    Rows of both sides are unioned and sorted within each user by
    (ts, side, event_id) — views sort before a purchase at the same
    microsecond, making the as-of inclusive — and a running
    ``last(view_payload, ignorenulls)`` carries the answer to each
    purchase row. Single shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("ts_us"))
    payload_t = "struct<event_id:bigint,ts_us:bigint>"
    views = (e.where(F.col("event_type") == "view")
             .select("user_id", "ts_us", F.lit(0).alias("side"), "event_id",
                     F.struct("event_id", "ts_us").cast(payload_t).alias("v")))
    purchases = (e.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts_us", F.lit(1).alias("side"), "event_id",
                         F.lit(None).cast(payload_t).alias("v")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts_us", "side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        views.unionByName(purchases)
        .withColumn("pv", F.last("v", ignorenulls=True).over(w))
        .where((F.col("side") == 1) & F.col("pv").isNotNull())
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("pv.event_id").alias("prior_view_id"),
                (F.col("ts_us") - F.col("pv.ts_us")).alias("gap_us"))
    )


@register(
    "q_range_join_follow",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
    SELECT a.event_id, a.user_id, COUNT(*) AS n_follow
    FROM e a JOIN e b
      ON b.user_id = a.user_id
     AND b.ts_us > a.ts_us AND b.ts_us <= a.ts_us + {_RANGE_US}
    GROUP BY a.event_id, a.user_id
    """,
    tags=("join", "range", "non-equi", "events"),
)
def q_range_join_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many same-user events follow within 5 minutes
    (events with at least one follower).

    Bucketed range join: time is quantized into 5-minute buckets;
    every probe row is replicated into its own and the next bucket
    (the only two a follower can live in), the join is a plain
    equi-join on (user_id, bucket), and the exact interval predicate
    filters inside the matched bucket pair. At 100 TB this keeps the
    shuffle key space fine-grained (user x bucket) instead of
    per-user cross products.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))
    probe = e.withColumn(
        "bkt", F.explode(F.array(F.expr(f"ts_us DIV {_RANGE_US}"),
                                 F.expr(f"ts_us DIV {_RANGE_US} + 1"))))
    build = e.select(F.col("event_id").alias("b_event_id"),
                     F.col("user_id").alias("b_user_id"),
                     F.col("ts_us").alias("b_ts_us"),
                     F.expr(f"ts_us DIV {_RANGE_US}").alias("b_bkt"))
    return (
        probe.join(build,
                   (F.col("user_id") == F.col("b_user_id"))
                   & (F.col("bkt") == F.col("b_bkt"))
                   & (F.col("b_ts_us") > F.col("ts_us"))
                   & (F.col("b_ts_us") <= F.col("ts_us") + _RANGE_US))
        .groupBy("event_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_follow"))
    )


_ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # attribution lookback: 24h


@register(
    "q_multitouch_attribution",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
                      strftime(ts, '%Y-%m-%d') AS day
               FROM events),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    t AS (SELECT * FROM e WHERE event_type IN ('click', 'view')),
    m AS (
        SELECT p.event_id AS purchase_id, p.day AS purchase_day,
               t.event_type AS channel,
               COUNT(*) OVER (PARTITION BY p.event_id) AS n_touch
        FROM p JOIN t
          ON t.user_id = p.user_id
         AND t.ts_us <= p.ts_us
         AND t.ts_us > p.ts_us - {_ATTR_WINDOW_US})
    SELECT purchase_day, channel,
           COUNT(*) AS n_touches,
           ROUND(SUM(1.0 / n_touch), 6) AS credit
    FROM m GROUP BY purchase_day, channel
    """,
    tags=("join", "attribution", "events"),
)
def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click/view in the 24h
    before a purchase by the same user shares that purchase's credit
    equally (credit = 1/n_touches); credits roll up per (purchase
    day, channel). The batch complement of the streaming last-touch
    job (q_streaming_click_attribution) — marketing pipelines run
    exactly this shape nightly.

    Plan: the time-range join is BUCKETED, not theta — purchases
    replicate into the two 24h buckets covering their lookback
    window, the join is an equi-join on (user_id, bucket), and the
    exact range predicate filters after. Per-key fan-out is bounded
    by bucket occupancy (the oracle's theta join is the semantic
    spec, not the plan). The per-purchase touch count is a
    purchase-partitioned window over match rows, then one small agg.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"),
        F.col("ts_us").alias("pts"), F.col("day").alias("purchase_day"))
    t = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("tu"), F.col("ts_us").alias("tts"),
        F.col("event_type").alias("channel"),
        (F.col("ts_us") / _ATTR_WINDOW_US).cast("long").alias("bucket"))
    # purchase covers buckets [bucket(pts - W), bucket(pts)]
    pb = p.select(
        "*", F.explode(F.array(
            (F.col("pts") / _ATTR_WINDOW_US).cast("long"),
            ((F.col("pts") - _ATTR_WINDOW_US) / _ATTR_WINDOW_US)
            .cast("long"))).alias("bucket")).dropDuplicates(
        ["purchase_id", "bucket"])
    m = (pb.join(t, (F.col("tu") == F.col("pu"))
                 & (t.bucket == pb.bucket)
                 & (F.col("tts") <= F.col("pts"))
                 & (F.col("tts") > F.col("pts") - _ATTR_WINDOW_US)))
    w = Window.partitionBy("purchase_id")
    return (m.withColumn("n_touch", F.count("*").over(w))
            .groupBy("purchase_day", "channel")
            .agg(F.count("*").alias("n_touches"),
                 F.round(F.sum(1.0 / F.col("n_touch")), 6).alias("credit")))


_NEAREST_W_US = 30 * 60 * 1_000_000   # nearest-match search radius


@register(
    "q_asof_nearest",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
               FROM events),
    err AS (SELECT * FROM e WHERE event_type = 'error'),
    pur AS (SELECT * FROM e WHERE event_type = 'purchase')
    SELECT err.event_id AS error_id, err.user_id,
           p.event_id AS nearest_purchase_id,
           p.dt_us
    FROM err LEFT JOIN LATERAL (
        SELECT pur.event_id, pur.ts_us - err.ts_us AS dt_us
        FROM pur
        WHERE pur.user_id = err.user_id
          AND abs(pur.ts_us - err.ts_us) <= {_NEAREST_W_US}
        ORDER BY abs(pur.ts_us - err.ts_us),
                 pur.ts_us - err.ts_us,
                 CASE WHEN pur.ts_us - err.ts_us <= 0
                      THEN -pur.event_id ELSE pur.event_id END
        LIMIT 1) p ON TRUE
    """,
    tags=("temporal", "asof", "join", "events"),
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional as-of: for every error event, the NEAREST
    purchase by the same user within ±30 min (ties → the earlier
    one) — the 'what was this user doing around the failure'
    join, completing the one-directional q_asof_join.

    Scale shape: the oracle's LATERAL is the spec; the plan is TWO
    running windows over ONE user-partitioned union sort — a
    backward ``last(purchase, ignorenulls)`` and a forward
    ``first(purchase, ignorenulls)`` — then a row-local choice by
    absolute distance. One shuffle on user_id, no per-row probe
    join. Equal-timestamp purchases order (ts, event_id), so
    backward carries the max id and forward the min id at the
    nearest instant, matching the oracle's signed tie-break.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("ts_us"))
    payload_t = "struct<ts_us:bigint,event_id:bigint>"
    pur = (e.where(F.col("event_type") == "purchase")
           .select("user_id", "ts_us", F.lit(0).alias("side"), "event_id",
                   F.struct("ts_us", "event_id").cast(payload_t).alias("p")))
    err = (e.where(F.col("event_type") == "error")
           .select("user_id", "ts_us", F.lit(1).alias("side"), "event_id",
                   F.lit(None).cast(payload_t).alias("p")))
    # purchases sort before an error at the same microsecond, so the
    # backward window sees dt=0 matches (and wins the tie, as in the
    # oracle's `dt asc` ordering)
    order = [F.col("ts_us"), F.col("side"), F.col("event_id")]
    wb = (Window.partitionBy("user_id").orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("user_id").orderBy(*order)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    u = (pur.unionByName(err)
         .withColumn("pb", F.last("p", ignorenulls=True).over(wb))
         .withColumn("pf", F.first("p", ignorenulls=True).over(wf)))
    probes = u.where(F.col("side") == 1)
    dtb = F.col("ts_us") - F.col("pb.ts_us")          # >= 0
    dtf = F.col("pf.ts_us") - F.col("ts_us")          # > 0 (dt=0 is in pb)
    b_ok = F.col("pb").isNotNull() & (dtb <= _NEAREST_W_US)
    f_ok = F.col("pf").isNotNull() & (dtf <= _NEAREST_W_US)
    take_b = b_ok & (~f_ok | (dtb <= dtf))
    return probes.select(
        F.col("event_id").alias("error_id"), "user_id",
        F.when(take_b, F.col("pb.event_id"))
         .when(f_ok, F.col("pf.event_id")).alias("nearest_purchase_id"),
        F.when(take_b, -dtb).when(f_ok, dtf).alias("dt_us"))


_IVL_BUCKET_US = 5 * 3600 * 1_000_000  # bucket width == max interval len
_IVL_DUR_SQL = "(1 + event_id % 5) * 3600000000"  # 1..5 h, from event_id


@register(
    "q_interval_overlap_join",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS s,
               epoch_us(ts) + {_IVL_DUR_SQL} AS en
        FROM events),
    a AS (SELECT * FROM e WHERE event_type = 'click'),
    b AS (SELECT * FROM e WHERE event_type = 'view'),
    p AS (
        SELECT a.user_id,
               LEAST(a.en, b.en) - GREATEST(a.s, b.s) AS overlap_us
        FROM a JOIN b ON b.user_id = a.user_id
                     AND a.s <= b.en AND b.s <= a.en)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(overlap_us) AS BIGINT) AS sum_overlap_us,
           CAST(MAX(overlap_us) AS BIGINT) AS max_overlap_us
    FROM p GROUP BY 1
    """,
    tags=("join", "interval", "events", "bucketed"),
)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap join per user — click activity
    intervals against view intervals (each event holds an interval
    of 1..5 hours derived deterministically from event_id), with
    per-user overlap-pair counts and total/max overlap duration.
    The remaining temporal-join shape after as-of (point-to-point)
    and range (point-to-interval): BOTH sides are intervals, the
    session-vs-session / downtime-vs-deploy collision query.

    Scale plan — stripe the probe side, key the build side ONCE:
    with bucket width = the declared max interval length, each view
    interval registers at exactly ONE bucket (its start bucket),
    and each click explodes to the <= 3 buckets that can hold an
    overlapping view start ([floor((a_s - maxdur)/W),
    floor(a_e/W)]). The (user, bucket) equi-join then applies the
    exact closed-interval predicate a_s <= b_e AND b_s <= a_e —
    every qualifying pair is found in exactly one bucket, so there
    is NO distinct/dedup pass, and the theta join the oracle runs
    (O(clicks x views) per user) never materializes. Fan-out is
    bounded by bucket occupancy; overlap lengths are exact integer
    microseconds. The max-length contract is the declared knob:
    long-tailed interval data is split into <= maxdur segments
    first (the standard decomposition). Reference parity: none
    (the reference has no joins at all, SURVEY §2C); north-star
    temporal-join completion next to q_asof_join /
    q_range_join_follow.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("s"))
    ev = ev.withColumn(
        "en", F.col("s") + (1 + F.col("event_id") % 5) * 3_600_000_000)
    wdt = _IVL_BUCKET_US
    a = (ev.where(F.col("event_type") == "click")
         .select("user_id", F.col("s").alias("a_s"),
                 F.col("en").alias("a_e"),
                 F.explode(F.sequence(
                     F.expr(f"(s - {wdt}) DIV {wdt}"),
                     F.expr(f"en DIV {wdt}"))).alias("bkt")))
    b = (ev.where(F.col("event_type") == "view")
         .select(F.col("user_id").alias("b_user"),
                 F.col("s").alias("b_s"), F.col("en").alias("b_e"),
                 F.expr(f"s DIV {wdt}").alias("b_bkt")))
    pairs = a.join(
        b, (F.col("user_id") == F.col("b_user"))
        & (F.col("bkt") == F.col("b_bkt"))
        & (F.col("a_s") <= F.col("b_e"))
        & (F.col("b_s") <= F.col("a_e")))
    overlap = (F.least("a_e", "b_e") - F.greatest("a_s", "b_s"))
    return (pairs.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(overlap).alias("sum_overlap_us"),
                 F.max(overlap).alias("max_overlap_us")))


_ASOF_TOL_US = 3_600_000_000  # 1-hour as-of tolerance


@register(
    "q_asof_cogroup",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, event_type, ts,
                      epoch_us(ts) AS ts_us FROM events),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    v AS (SELECT * FROM e WHERE event_type = 'view')
    SELECT p.event_id AS purchase_id, p.user_id,
           v.event_id AS prior_view_id,
           p.ts_us - v.ts_us AS gap_us
    FROM p ASOF JOIN v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    WHERE p.ts_us - v.ts_us <= {_ASOF_TOL_US}
    """,
    tags=("join", "asof", "cogroup", "pandas-udf", "events"),
)
def q_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toleranced as-of join (each purchase ↔ most recent view by the
    same user within the preceding hour) via the COGROUP surface —
    gated by DuckDB's native ASOF JOIN as the oracle.

    Strategy contrast with q_asof_join (union-then-window, pure
    built-ins): cogroup ships both sides of each group to one Arrow
    batch and runs pandas ``merge_asof`` there. The groups are HASH
    BUCKETS of the key, not raw keys: ``merge_asof(by="user_id")``
    handles the per-user as-of inside each bucket, so the number of
    Python invocations is the bucket count (64), NOT the key
    cardinality — per-key cogrouping measured ~10s at sf0.1 from
    ~7.5k tiny UDF calls; bucketed, ~2s. Same single shuffle; this
    is the invocation-amortization pattern any cogroup operator
    needs at 100 TB key cardinalities. The cogroup form itself wins
    over the relational encoding when per-key logic outgrows SQL
    (per-row tolerances, many asof columns, custom tie-breaks).

    Scale: one co-partitioned shuffle by bucket; each Arrow batch
    holds the bucket's views+purchases (1/64 of the corpus — tune
    bucket count to executor memory at scale). No driver traffic.
    """
    import pandas as pd

    n_buckets = 64
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"))
    bkt = F.pmod(F.col("user_id"), F.lit(n_buckets)).alias("bkt")
    views = ev.where(F.col("event_type") == "view") \
        .select(bkt, "user_id", "event_id", "ts_us")
    purchases = ev.where(F.col("event_type") == "purchase") \
        .select(bkt, "user_id", "event_id", "ts_us")

    def merge(views_pdf: pd.DataFrame, pur_pdf: pd.DataFrame) -> pd.DataFrame:
        if pur_pdf.empty or views_pdf.empty:
            return pd.DataFrame({"purchase_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "prior_view_id": pd.Series(dtype="int64"),
                                 "gap_us": pd.Series(dtype="int64")})
        v = views_pdf.sort_values(["ts_us", "event_id"]).rename(
            columns={"event_id": "prior_view_id"})
        p = pur_pdf.sort_values("ts_us").rename(
            columns={"event_id": "purchase_id"})
        m = pd.merge_asof(p[["purchase_id", "user_id", "ts_us"]],
                          v[["user_id", "prior_view_id", "ts_us"]],
                          on="ts_us", by="user_id",
                          direction="backward",
                          tolerance=_ASOF_TOL_US)
        m = m.dropna(subset=["prior_view_id"])
        gap = (m["ts_us"]
               - v.set_index("prior_view_id")["ts_us"]
               .reindex(m["prior_view_id"]).to_numpy())
        return pd.DataFrame({"purchase_id": m["purchase_id"].astype("int64"),
                             "user_id": m["user_id"].astype("int64"),
                             "prior_view_id":
                                 m["prior_view_id"].astype("int64"),
                             "gap_us": gap.astype("int64")})

    out = (views.groupBy("bkt").cogroup(purchases.groupBy("bkt"))
           .applyInPandas(merge, "purchase_id long, user_id long, "
                                 "prior_view_id long, gap_us long"))
    # Materialize eagerly: when NO output column is consumed (a bare
    # .count()), this Spark's column pruning strips the cogroup's
    # RIGHT child down to the grouping key — the UDF then receives
    # purchases without ts_us and dies (measured: left kept its cols,
    # right pruned to the key). The UDF's input needs are opaque
    # to the optimizer, so pin them by materializing the full output
    # here; the result is match-sized (bounded by purchases), and
    # tests/test_cogroup_pruning.py guards the quirk.
    return out.localCheckpoint(eager=True)
