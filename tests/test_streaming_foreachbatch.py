"""foreachBatch exactly-once parquet sink.

The missing piece between a memory-sink demo and a production
pipeline: a streaming job whose sink is an idempotent parquet write.
``foreachBatch`` hands us (batch_df, epoch_id); writing each epoch to
``epoch=<id>/`` with overwrite makes REPLAYS of the same epoch (the
at-least-once delivery Spark guarantees after a crash) land on the
same path instead of duplicating rows — overwrite-by-epoch is the
standard idempotence recipe from the Structured Streaming guide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from tests.conftest import SF_DIR


def _file_stream(spark, src_dir: str):
    # finite file source; availableNow processes it as 1+ micro-batches
    return (spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", "1").parquet(src_dir))


def _run_foreachbatch(spark, src_dir, out_dir, ckpt_dir):
    def write_epoch(batch_df, epoch_id):
        # the epoch=<id> directory name IS the partition column on
        # read-back; overwrite makes a replayed epoch idempotent
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    q = (_file_stream(spark, src_dir).writeStream
         .foreachBatch(write_epoch)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_foreachbatch_idempotent_epochs(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = (load_table(spark, SF_DIR, "events")
          .select("event_id", "user_id", "value").limit(2000))
    # two part-files in one flat dir -> maxFilesPerTrigger=1 forces
    # >= 2 epochs
    ev.where("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    ev.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    _run_foreachbatch(spark, src, out, ckpt)
    first = spark.read.option("basePath", out).parquet(out)
    n_epochs = first.select("epoch").distinct().count()
    assert n_epochs >= 2, "maxFilesPerTrigger=1 should yield >= 2 epochs"
    assert first.count() == ev.count()
    assert first.select(F.sum("event_id")).first()[0] == \
        ev.select(F.sum("event_id")).first()[0]

    # replay the whole stream with a FRESH checkpoint (worst-case
    # redelivery: every epoch re-fires) — overwrite-by-epoch must
    # leave the sink unchanged, not doubled
    _run_foreachbatch(spark, src, out, str(tmp_path / "ckpt2"))
    again = spark.read.option("basePath", out).parquet(out)
    assert again.count() == ev.count()
    assert again.select(F.sum("event_id")).first()[0] == \
        ev.select(F.sum("event_id")).first()[0]


def test_streaming_near_dup_converges_to_batch_lsh(spark):
    """The streaming signature-index near-dup job must (a) genuinely
    run multiple micro-batches, (b) converge to EXACTLY the batch
    MinHash-LSH pair relation — cross-batch pairs surface when the
    later doc arrives, within-batch pairs immediately, none twice."""
    from my_mapreduce_spark.queries.dedup import q_dedup_minhash_lsh
    from my_mapreduce_spark.streaming.jobs import run_near_dup_stream
    from tests.conftest import SF_DIR

    got_df, n_batches = run_near_dup_stream(spark, SF_DIR)
    assert n_batches >= 2, "must exercise the cross-batch path"
    got = {tuple(r) for r in got_df.collect()}
    want = {tuple(r) for r in q_dedup_minhash_lsh(spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    assert want, "fixture should contain near-dups"
    assert got == want


def test_near_dup_merge_replay_idempotent(spark, tmp_path):
    """The exactly-once claim, tested directly: re-applying the SAME
    micro-batch to the near-dup state (a replayed epoch after a
    failure between state write and offset commit) must leave both
    the pair table and the signature index exactly as they were."""
    from my_mapreduce_spark.io import load_table
    from my_mapreduce_spark.streaming.jobs import _neardup_merge
    from tests.conftest import SF_DIR

    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    docs = load_table(spark, SF_DIR, "documents")
    b1 = docs.where("doc_id % 2 = 0")
    b2 = docs.where("doc_id % 2 = 1")

    _neardup_merge(b1, 0, index, pairs)
    _neardup_merge(b2, 1, index, pairs)

    def snap(path):
        return sorted(tuple(r) for r in spark.read.parquet(path).collect())

    pairs_before, index_before = snap(pairs), snap(index)
    _neardup_merge(b2, 1, index, pairs)       # replayed epoch
    assert snap(pairs) == pairs_before
    assert snap(index) == index_before
    spark.catalog.clearCache()


def test_curation_ingest_stream_equals_batch_twin(spark):
    """The streamed quality+dedup survivor set equals the batch
    stages (curation_ext._endgame_survivors) exactly — the struct-
    min merge is arrival-order-invariant."""
    from my_mapreduce_spark.queries.curation_ext import _endgame_survivors
    from my_mapreduce_spark.streaming.jobs import run_curation_ingest_stream

    out, n_batches = run_curation_ingest_stream(spark, SF_DIR)
    assert n_batches >= 2  # genuinely incremental, not one big batch
    got = {(r.doc_id, r.lang, r.n_chars) for r in out.collect()}
    want = {(r.doc_id, r.lang, r.n_chars)
            for r in _endgame_survivors(spark, SF_DIR).collect()}
    assert got == want


def test_curation_merge_replay_idempotent(spark):
    """Re-merging a batch's own partial into the state is a no-op —
    the exactly-once-without-a-log property of the struct-min."""
    from my_mapreduce_spark.io import load_table
    from my_mapreduce_spark.streaming.jobs import (_curation_merged,
                                                   _curation_partial)
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    p1 = _curation_partial(docs.where(F.expr("doc_id % 2 = 0")))
    p2 = _curation_partial(docs.where(F.expr("doc_id % 2 = 1")))
    state = _curation_merged(p2, p1).localCheckpoint(eager=True)
    replayed = _curation_merged(p2, state)  # epoch 2 replays
    snap = lambda df: sorted((r.nh, tuple(r.s)) for r in df.collect())  # noqa: E731
    assert snap(replayed) == snap(state)
