"""applyInPandasWithState sessionizer across checkpointed restarts:
the per-user (last_ts, seq) state must be RESTORED, so numbering
continues — an event within the gap of run 1's last event extends
session 1; an event past the gap opens session 2, not session 1.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

_MIN_US = 60 * 1_000_000


def _write(src, name, rows):
    # (event_id, minutes, user_id) -> ts_us in fake epoch-minutes
    pdf = pd.DataFrame(rows, columns=["event_id", "minute", "user_id"])
    pdf["ts_us"] = pdf.pop("minute") * _MIN_US
    pdf.to_parquet(src / name)


def _run(spark, src, ckpt, out, gap_minutes=30):
    from my_mapreduce_spark.streaming.jobs import (SESSIONIZE_OUT,
                                                   SESSIONIZE_STATE,
                                                   make_sessionizer)

    stream = (spark.readStream
              .schema("event_id long, user_id long, ts_us long")
              .parquet(str(src))
              .select("user_id", "event_id", "ts_us"))
    sess = stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_minutes * _MIN_US),
        outputStructType=SESSIONIZE_OUT,
        stateStructType=SESSIONIZE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (sess.writeStream.format("parquet").option("path", str(out))
         .outputMode("append").option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return {r.event_id: (r.user_id, r.session_seq)
            for r in spark.read.parquet(str(out)).collect()}


def test_session_numbering_continues_after_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"

    _write(src, "b1.parquet", [
        (1, 100, 7),   # session 1 opens
        (2, 110, 7),   # within gap -> still session 1
    ])
    out1 = _run(spark, src, ckpt, out)
    assert out1 == {1: (7, 1), 2: (7, 1)}

    _write(src, "b2.parquet", [
        (3, 120, 7),   # 10 min after restored last_ts -> extends session 1
        (4, 200, 7),   # 80 min gap -> session 2 (would be 1 if state lost)
        (5, 205, 9),   # new user starts at session 1
    ])
    out2 = _run(spark, src, ckpt, out)
    assert out2[3] == (7, 1), "state lost: in-gap event opened a new session"
    assert out2[4] == (7, 2), "state lost: numbering restarted"
    assert out2[5] == (9, 1)
