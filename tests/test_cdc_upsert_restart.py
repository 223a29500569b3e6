"""CDC upsert state across a simulated crash: the epoch-partitioned
merge (_cdc_merge_batch) must survive at-least-once foreachBatch
delivery — a replayed epoch re-reads its PREDECESSOR state (never its
own half-merged output) and rewrites identical state, so counts are
neither lost nor doubled. Crash simulated the standard way: delete
the checkpoint's newest commit marker and restart with more input.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from my_mapreduce_spark.streaming.jobs import (_cdc_epochs_on_disk,
                                               _cdc_merge_batch)

_SCHEMA = "user_id long, event_id long, event_type string, ts_us long"


def _write(src, name, rows):
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "event_type", "ts_us"])
    pdf.to_parquet(src / name)


def _run(spark, src, ckpt, state):
    ev = (spark.readStream.schema(_SCHEMA)
          .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (ev.writeStream
         .foreachBatch(lambda b, e: _cdc_merge_batch(b, e, str(state)))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_replayed_epoch_merges_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    state = tmp_path / "state"
    src.mkdir()

    _write(src, "a.parquet", [(10, 1, "view", 100), (10, 2, "click", 200),
                              (11, 3, "view", 150)])
    _write(src, "b.parquet", [(10, 4, "buy", 300), (12, 5, "view", 50)])
    _run(spark, src, ckpt, state)

    # crash after the last epoch's state write but before its offset
    # commit: drop the newest commit marker; restart with more input
    # re-executes that epoch (at-least-once) against existing state
    commits = sorted(c for c in os.listdir(ckpt / "commits")
                     if not c.startswith("."))
    os.remove(ckpt / "commits" / commits[-1])
    crc = ckpt / "commits" / f".{commits[-1]}.crc"
    if crc.exists():
        os.remove(crc)
    _write(src, "c.parquet", [(11, 6, "buy", 500)])
    _run(spark, src, ckpt, state)

    latest = _cdc_epochs_on_disk(str(state))[-1]
    got = {r.user_id: r for r in spark.read.parquet(
        str(state / f"epoch={latest}")).collect()}
    # n_events per user must equal the TRUE event count (no double
    # count from the replayed epoch, nothing lost)
    assert {u: got[u].n_events for u in got} == {10: 3, 11: 2, 12: 1}
    assert (got[10].last_type, got[10].last_ts_us) == ("buy", 300)
    assert (got[11].last_type, got[11].last_ts_us) == ("buy", 500)
    assert (got[12].last_type, got[12].last_ts_us) == ("view", 50)
    # pruning keeps at most the predecessor + the head epoch
    assert len(_cdc_epochs_on_disk(str(state))) <= 2


def test_state_never_exceeds_two_epochs(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    state = tmp_path / "state"
    src.mkdir()
    for i in range(4):
        _write(src, f"f{i}.parquet", [(i, i * 10, "view", 100 + i)])
    _run(spark, src, ckpt, state)
    epochs = _cdc_epochs_on_disk(str(state))
    assert len(epochs) <= 2
    total = (spark.read.parquet(str(state / f"epoch={epochs[-1]}"))
             .agg(F.sum("n_events")).first()[0])
    assert total == 4
