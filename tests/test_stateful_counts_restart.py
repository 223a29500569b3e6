"""applyInPandasWithState per-user profile across checkpointed
restarts (round-6 verdict ask): the (n, sum-cents, max-ts) GroupState
must be RESTORED after a kill between micro-batches — a second run's
emission for a user continues that user's running totals instead of
restarting from zero — and already-committed source files must not be
re-read (offsets restored alongside state).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupStateTimeout


def _write(src, name, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "cents", "ts_us"])
    pdf.to_parquet(src / name)


def _run(spark, src, ckpt, out):
    from my_mapreduce_spark.streaming.stateful import (PROFILE_OUT,
                                                       PROFILE_STATE,
                                                       make_profile_updater)

    stream = (spark.readStream
              .schema("user_id long, cents long, ts_us long")
              .parquet(str(src)))
    # operator mode "append" (not "update"): the parquet sink only
    # supports append, and every emission lands either way — the
    # final-per-user reduction below reads the running maxima
    prof = stream.groupBy("user_id").applyInPandasWithState(
        make_profile_updater(),
        outputStructType=PROFILE_OUT,
        stateStructType=PROFILE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (prof.writeStream.format("parquet").option("path", str(out))
         .outputMode("append").option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # the parquet sink appends every emission; the LAST emission per
    # user is the one with the largest n_events (strictly growing)
    rows = spark.read.parquet(str(out)).collect()
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.sum_cents, r.max_ts_us)
    return final


def test_profile_state_survives_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"

    _write(src, "b1.parquet", [(7, 100, 10), (7, 250, 20), (9, 40, 5)])
    run1 = _run(spark, src, ckpt, out)
    assert run1 == {7: (2, 350, 20), 9: (1, 40, 5)}

    # kill happened here (the first query is terminated); new files
    # arrive, a fresh query restarts from the same checkpoint
    _write(src, "b2.parquet", [(7, 1, 15), (11, 5, 99)])
    run2 = _run(spark, src, ckpt, out)
    # user 7 continues the restored state: 3 events, 351 cents, and
    # max_ts stays 20 (the late 15 does not regress the max) — any of
    # (2, 350, 20) would mean b2 was dropped; (1, 1, 15) would mean
    # state was lost
    assert run2[7] == (3, 351, 20), "restored state not continued"
    assert run2[9] == (1, 40, 5)        # untouched user unchanged
    assert run2[11] == (1, 5, 99)       # new user starts fresh
