"""Golden parity: mapreduce() compat API vs a sequential Python
MapReduce running the reference's Map/Reduce logic.

This is the analogue of MIT 6.824's ``mrsequential`` golden check
(SURVEY.md §5.1): same Map/Reduce closures, one process, no
parallelism — the engine must produce the identical key→value dict.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.mapreduce import mapreduce
from tests.conftest import SF_DIR


from my_mapreduce_spark.apps import (indexer_map, indexer_reduce, wc_map,
                                     wc_reduce)


def seq_mapreduce(inputs, mapf, reducef) -> dict[str, str]:
    inter: dict[str, list[str]] = defaultdict(list)
    for k, v in inputs:
        for ok, ov in mapf(k, v):
            inter[ok].append(ov)
    return {k: reducef(k, vs) for k, vs in inter.items()}


# --- fixtures ------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus_df(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs.select(F.concat_ws("-", "source", "doc_id").alias("filename"),
                       F.col("text"))


@pytest.fixture(scope="module")
def corpus_rows(corpus_df):
    return [(r.filename, r.text) for r in corpus_df.collect()]


# --- golden tests --------------------------------------------------------

@pytest.mark.parametrize("mapf,reducef", [(wc_map, wc_reduce),
                                          (indexer_map, indexer_reduce)],
                         ids=["wc", "indexer"])
def test_mapreduce_matches_sequential(spark, corpus_df, corpus_rows, mapf, reducef):
    got = {r.key: r.value for r in mapreduce(corpus_df, mapf, reducef).collect()}
    want = seq_mapreduce(corpus_rows, mapf, reducef)
    assert got == want


def test_dataframe_wc_matches_mapreduce_api(spark, corpus_df, corpus_rows):
    """The JVM-side wc query and the compat-API wc agree — i.e. the
    \\p{L} Java tokenizer matches Python str.isalpha on the corpus."""
    from my_mapreduce_spark.queries.reference_parity import wc_word_count

    native = {r.word: r.cnt for r in wc_word_count(spark, SF_DIR).collect()}
    seq = {k: int(v) for k, v in seq_mapreduce(corpus_rows, wc_map, wc_reduce).items()}
    assert native == seq


def test_write_text_output(spark, corpus_df, tmp_path):
    from my_mapreduce_spark.mapreduce import write_text_output

    out = mapreduce(corpus_df, wc_map, wc_reduce, n_reduce=4)
    path = str(tmp_path / "mr-out")
    write_text_output(out, path, n_reduce=4)
    import glob
    files = glob.glob(f"{path}/part-*")
    assert len(files) == 4
    lines = [ln for f in files for ln in open(f).read().splitlines()]
    assert len(lines) == out.count()
    assert all(len(ln.split(" ", 1)) == 2 for ln in lines)
