"""Golden tests for the indexing/chunking/sampling operators:
independent pure-Python sequential references (SURVEY.md §5 — the
same methodology as the reference's mrsequential goldens), so these
pass/fail without DuckDB.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from my_mapreduce_spark.io import load_table
from my_mapreduce_spark.queries.indexing import (
    _CHUNK,
    _PHRASE,
    _STRIDE,
    q_bpe_pair_counts,
    q_doc_chunking,
    q_phrase_search,
)
from my_mapreduce_spark.queries.sampling_stats import (
    _SAMPLE_K,
    q_weighted_sample,
)

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@pytest.fixture(scope="module")
def docs(spark):
    return {
        int(r["doc_id"]): (r["text"], int(r["n_chars"]))
        for r in load_table(spark, SF, "documents").collect()
    }


def test_chunking_covers_every_token_with_fixed_overlap(spark, docs):
    rows = q_doc_chunking(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, (text, _) in docs.items():
        n = len(_tokens(text))
        chunks = sorted(by_doc[doc_id], key=lambda r: r["start_tok"])
        # chunk count, bounds, and coverage
        assert len(chunks) == math.ceil(n / _STRIDE)
        assert chunks[0]["start_tok"] == 1
        assert chunks[-1]["end_tok"] == n
        for i, c in enumerate(chunks):
            assert c["start_tok"] == 1 + i * _STRIDE
            assert c["end_tok"] == min(c["start_tok"] + _CHUNK - 1, n)
        # consecutive chunks overlap by CHUNK - STRIDE except the tail
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] <= a["end_tok"] + 1  # no gap


def test_phrase_search_matches_sequential_scan(spark, docs):
    got = {int(r["doc_id"]): (r["n_matches"], r["first_pos"])
           for r in q_phrase_search(spark, SF).collect()}
    want: dict[int, tuple[int, int]] = {}
    for doc_id, (text, _) in docs.items():
        toks = _tokens(text)
        hits = [i + 1 for i in range(len(toks) - 2)
                if tuple(toks[i:i + 3]) == _PHRASE]
        if hits:
            want[doc_id] = (len(hits), hits[0])
    assert got == want


def test_bpe_pair_counts_match_counter_reference(spark, docs):
    got = [(r["pair"], r["pair_count"]) for r in
           q_bpe_pair_counts(spark, SF).orderBy("rnk").collect()]
    freq = Counter(t for text, _ in docs.values() for t in _tokens(text))
    pairs: Counter = Counter()
    for word, c in freq.items():
        if len(word) >= 2:
            for i in range(len(word) - 1):
                pairs[word[i:i + 2]] += c
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:len(got)]
    assert got == want


def test_weighted_sample_matches_exponential_race_reference(spark, docs):
    got = [(int(r["doc_id"]), r["rnk"]) for r in
           q_weighted_sample(spark, SF).orderBy("rnk").collect()]
    keyed = []
    for doc_id, (_, n_chars) in docs.items():
        u = (int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
             + 0.5) / 2 ** 52
        keyed.append((-math.log(u) / n_chars, doc_id))
    want = [(doc_id, i + 1) for i, (_, doc_id) in
            enumerate(sorted(keyed)[:_SAMPLE_K])]
    assert got == want


def test_bpe_train_merges_golden(spark, duck):
    """3-iteration BPE trace must equal a pure-Python reference BPE
    (count over distinct-word freqs, deterministic argmax, strict
    left-to-right non-overlapping merge)."""
    import re
    from collections import Counter

    from my_mapreduce_spark.queries.indexing import (_BPE_ITERS,
                                                     q_bpe_train_merges)
    from tests.conftest import SF_DIR

    texts = [r[0] for r in duck.sql(
        f"SELECT lower(text) FROM '{SF_DIR}/documents.parquet'").fetchall()]
    freq = Counter(w for t in texts
                   for w in re.split(r"[^a-z0-9]+", t)
                   if w and len(w) >= 2)
    vocab = {w: tuple(w) for w in freq}

    expected = []
    for it in range(1, _BPE_ITERS + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((it, l, r, l + r, cnt))
        merged = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[w] = tuple(out)
        vocab = merged

    got = [(r.iter, r.left, r.right, r.merged, r.pair_count)
           for r in q_bpe_train_merges(spark, SF_DIR)
           .orderBy("iter").collect()]
    assert got == expected


def test_bpe_merge_fold_matches_python_on_random_words(spark):
    """The SQL aggregate-fold merge (left-to-right, non-overlapping,
    just-merged flag) must agree with the imperative Python merge on
    adversarial inputs — runs of the merged pair ('aaaa' + (a,a) →
    [aa, aa]), odd runs ('aaa' → [aa, a]), interleavings, and the
    pair straddling a fresh merge ('aba'+(a,b) then b? no — single
    pass). 300 random words over a 2-letter alphabet, one Spark job.
    """
    import random

    from pyspark.sql import functions as F

    rng = random.Random(42)
    words = ["".join(rng.choice("ab") for _ in range(rng.randint(1, 12)))
             for _ in range(300)] + ["aaa", "aaaa", "aaaaa", "ababab", "bbaa"]
    left, right = "a", "a"

    def py_merge(w):
        out, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == left and w[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(w[i])
                i += 1
        return out

    df = spark.createDataFrame([(w,) for w in words], "term string") \
        .select(F.expr("filter(split(term, ''), x -> x <> '')")
                .alias("syms"), "term")
    merged = df.select("term", F.expr(f"""
        aggregate(syms,
            named_struct('arr', CAST(array() AS array<string>),
                         'jm', false),
            (acc, x) -> IF(size(acc.arr) > 0 AND NOT acc.jm
                           AND element_at(acc.arr, -1) = '{left}'
                           AND x = '{right}',
                named_struct(
                    'arr', concat(slice(acc.arr, 1, size(acc.arr) - 1),
                                  array('{left}{right}')),
                    'jm', true),
                named_struct('arr', concat(acc.arr, array(x)),
                             'jm', false)),
            acc -> acc.arr)""").alias("m"))
    got = {r.term: list(r.m) for r in merged.collect()}
    for w in words:
        assert got[w] == py_merge(w), (w, got[w], py_merge(w))
