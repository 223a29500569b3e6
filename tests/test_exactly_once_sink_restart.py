"""Exactly-once file landing across a simulated crash: foreachBatch
delivery is at-least-once (a batch whose commit marker was lost is
re-run on restart), and the per-epoch overwrite upgrades that to
exactly-once OUTPUT. The crash is simulated the standard way: delete
the checkpoint's last commit marker so the restarted query must
re-execute that epoch against the already-landed directory.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F


def _write(src, name, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "value"])
    pdf.to_parquet(src / name)


def _run(spark, src, ckpt, land):
    ev = (spark.readStream
          .schema("event_id long, user_id long, value double")
          .option("maxFilesPerTrigger", 1)
          .parquet(str(src)))

    def land_batch(batch_df, epoch_id):
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(str(land), f"batch={epoch_id}")))

    q = (ev.writeStream.foreachBatch(land_batch)
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_replayed_epoch_lands_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    land = tmp_path / "landed"
    src.mkdir()

    _write(src, "a.parquet", [(1, 10, 1.0), (2, 10, 2.0)])
    _write(src, "b.parquet", [(3, 11, 3.0)])
    _run(spark, src, ckpt, land)

    landed = spark.read.option("basePath", str(land)) \
        .parquet(str(land / "batch=*"))
    assert landed.count() == 3

    # simulate a crash after the last epoch's write but before its
    # commit: drop the newest commit marker, then restart with MORE
    # input — the lost epoch re-executes (at-least-once) and the
    # overwrite must not duplicate its rows
    commits = sorted(os.listdir(ckpt / "commits"))
    newest = [c for c in commits if not c.startswith(".")][-1]
    os.remove(ckpt / "commits" / newest)
    crc = ckpt / "commits" / f".{newest}.crc"
    if crc.exists():  # checksum twin must go too or the re-commit
        os.remove(crc)  # rename trips FileAlreadyExists
    _write(src, "c.parquet", [(4, 12, 4.0)])
    _run(spark, src, ckpt, land)

    landed = spark.read.option("basePath", str(land)) \
        .parquet(str(land / "batch=*"))
    rows = {r.event_id for r in landed.collect()}
    assert rows == {1, 2, 3, 4}, rows          # nothing lost
    assert landed.count() == 4                 # nothing duplicated
    assert landed.groupBy("event_id").count() \
        .where(F.col("count") > 1).count() == 0
