"""The stateful LSH band index must survive a checkpointed restart:
signatures accumulated before the kill stay in the state store, so a
document arriving AFTER the restart still pairs with pre-kill corpus
members — and pre-kill pairs are not re-emitted (offsets restored
alongside state).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupStateTimeout

DUP = ("the quick brown fox jumps over the lazy dog again and again "
       "until the corpus repeats itself verbatim")
OTHER = ("completely different content about distributed query engines "
         "and columnar storage formats with no shared shingles at all")


def _write(src, name, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf.to_parquet(src / name)


def _run(spark, src, ckpt, out):
    from my_mapreduce_spark.streaming.stateful import (LSH_OUT, LSH_STATE,
                                                       lsh_band_rows,
                                                       make_lsh_band_updater)

    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(str(src)))
    banded = lsh_band_rows(stream)
    pairs = banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        make_lsh_band_updater(),
        outputStructType=LSH_OUT,
        stateStructType=LSH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (pairs.writeStream.format("parquet").option("path", str(out))
         .outputMode("append").option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.read.parquet(str(out)).collect()
    return {(r.doc_a, r.doc_b): (r.n_matches, r.est_jaccard) for r in rows}, \
        len(rows)


def test_band_index_survives_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"

    # batch 1: docs 1 & 2 are verbatim dups, doc 5 is unrelated
    _write(src, "b1.parquet", [(1, DUP), (2, DUP), (5, OTHER)])
    got1, n1 = _run(spark, src, ckpt, out)
    assert set(got1) == {(1, 2)}
    assert got1[(1, 2)] == (9, 1.0)
    # all 3 bands collide for a verbatim dup, but the pair must land
    # once per band at most — and the sink dedup is downstream, so
    # here we just bound it
    assert n1 <= 3

    # kill happened here; doc 3 (another verbatim dup) arrives, a
    # fresh query restarts from the same checkpoint
    _write(src, "b2.parquet", [(3, DUP)])
    got2, n2 = _run(spark, src, ckpt, out)
    # doc 3 pairs with BOTH pre-kill members: their signatures were
    # restored from the state store, not recomputed from b1 (b1 is
    # already committed and must not be re-read)
    assert set(got2) == {(1, 2), (1, 3), (2, 3)}
    assert got2[(1, 3)] == (9, 1.0) and got2[(2, 3)] == (9, 1.0)
    # (1, 2) rows did not grow: the restarted run emitted only the
    # new pairs (no replay of committed batches)
    assert n2 - n1 <= 6  # two new pairs x <= 3 bands


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Same doc_id delivered twice (the crash-between-state-write-and-
    offset-commit replay): the updater must skip the known id — state
    does not grow and no duplicate pair is emitted."""
    from my_mapreduce_spark.streaming.stateful import make_lsh_band_updater

    update = make_lsh_band_updater()

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    sig_dup = "|".join(["aa"] * 9)
    st = FakeState()
    batch = pd.DataFrame({"doc_id": [1, 2], "sig": [sig_dup, sig_dup]})
    out1 = pd.concat(list(update((0, "h"), [batch], st)))
    assert len(out1) == 1 and (out1.doc_a[0], out1.doc_b[0]) == (1, 2)
    # replay the same batch: nothing new emitted, state unchanged
    out2 = pd.concat(list(update((0, "h"), [batch], st)))
    assert len(out2) == 0
    assert list(st.get[0]) == [1, 2]
