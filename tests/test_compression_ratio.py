"""q_compression_ratio has no SQL oracle (no zlib in DuckDB), so its
contract is pinned here instead: exact flag rule, bit-determinism
across runs, and the monotonicity that makes the signal useful
(repetition compresses better than varied text)."""

from __future__ import annotations

import pandas as pd

from my_mapreduce_spark.queries.corpus_ops import (
    _CR_REPETITIVE, _compression_batches, q_compression_ratio)

SF = "/root/testdata/sf0.001"


def _run(rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return pd.concat(list(_compression_batches([pdf]))).set_index("doc_id")


def test_monotonic_and_flag():
    out = _run([(1, "spam ham " * 200),
                (2, "the quick brown fox jumps over the lazy dog while "
                    "seventeen quiet marmots debate fiscal policy under "
                    "a violet sky, archiving zigzag blueprints"),
                (3, "a")])
    assert out.loc[1, "ratio"] < out.loc[2, "ratio"] < out.loc[3, "ratio"]
    assert bool(out.loc[1, "repetitive"]) is True
    assert bool(out.loc[2, "repetitive"]) is False
    for i in (1, 2, 3):
        assert (out.loc[i, "repetitive"]
                == (out.loc[i, "ratio"] < _CR_REPETITIVE))


def test_sizes_exact():
    import zlib
    out = _run([(7, "hello world")])
    assert out.loc[7, "raw_bytes"] == len(b"hello world")
    assert out.loc[7, "zlib_bytes"] == len(zlib.compress(b"hello world", 6))


def test_deterministic_on_fixture(spark):
    a = sorted(map(tuple, q_compression_ratio(spark, SF).collect()))
    b = sorted(map(tuple, q_compression_ratio(spark, SF).collect()))
    assert a == b and len(a) > 0
    for _, raw, comp, ratio, rep in a:
        assert raw > 0 and comp > 0
        assert ratio == round(comp / raw, 6)
        assert rep == (ratio < _CR_REPETITIVE)
