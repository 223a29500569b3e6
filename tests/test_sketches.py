"""HLL sketch operators: accuracy and lossless mergeability.

No DuckDB oracle exists for these (engine-specific HLL), so the
tests pin down the two properties the rows-only registry entry
relies on instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.queries.sketches import (
    daily_user_sketches,
    q_hll_user_sketches,
)
from tests.conftest import SF_DIR


def test_hll_estimate_close_to_exact(spark):
    est = {r.event_type: r.est_users
           for r in q_hll_user_sketches(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    exact = {r.event_type: r.n
             for r in ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for t, e in exact.items():
        assert abs(est[t] - e) <= max(1, 0.02 * e), (t, est[t], e)


def test_hll_union_is_lossless_merge(spark):
    # merging per-day sketches must give the identical estimate to a
    # single sketch over the whole range — mergeability is what makes
    # sketches storable/incremental
    daily = daily_user_sketches(spark, SF_DIR)
    merged = {r.event_type: r.est
              for r in daily.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
              .collect()}
    ev = load_table(spark, SF_DIR, "events")
    whole = {r.event_type: r.est
             for r in ev.groupBy("event_type")
             .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
             .collect()}
    assert merged == whole


def test_countmin_never_undercounts_and_is_tight(spark):
    # CM guarantee: est >= exact for EVERY probe; overshoot is the
    # colliding mass, expected ~N/width per row (min over 4 rows is
    # far tighter) — assert a generous 4*N/width to catch hash bugs
    # without flaking on fixture growth
    from my_mapreduce_spark.functions.text import tokens as tok
    from my_mapreduce_spark.queries.sketches import (_CM_WIDTH,
                                                     q_countmin_tokens)

    rows = q_countmin_tokens(spark, SF_DIR).collect()
    assert rows, "probe tokens must exist in the fixture"
    n = (load_table(spark, SF_DIR, "documents")
         .select(F.explode(tok("text"))).count())
    for r in rows:
        assert r.est >= r.exact, (r.token, r.est, r.exact)
        assert r.overcount <= 4 * n / _CM_WIDTH, (r.token, r.overcount)


def test_streaming_sketch_maintenance_matches_batch(spark):
    # the incrementally-maintained state table must give the IDENTICAL
    # estimate to one batch sketch over everything (HLL merge is
    # lossless), and the run must actually be multi-batch
    from my_mapreduce_spark.streaming.jobs import \
        run_sketch_maintenance_stream

    out, n_batches = run_sketch_maintenance_stream(spark, SF_DIR)
    assert n_batches > 1, "maxFilesPerTrigger=1 should yield several batches"
    got = {r.event_type: (r.n_events, r.est_users) for r in out.collect()}
    ev = load_table(spark, SF_DIR, "events")
    want = {r.event_type: (r.n_events, r.est_users)
            for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
                 .alias("est_users")).collect()}
    assert got == want
