"""Property test for q_sparse_cosine_pairs' integer arithmetic: the
cross-multiplied threshold (dot²·4 >= ‖a‖²·‖b‖²) must agree with the
real-number cosine >= 1/2 decision, and the inverted-index sparse dot
product must equal the dense dot product — on arbitrary tiny corpora,
so the claims cannot silently depend on the fixture's token shapes.

Pure-Python mirror of the query's exact integer scheme (df-cap,
centi-idf weights, bigint dot/norms); no Spark session needed — the
Spark plan's equality to this arithmetic is what the DuckDB oracle
checks every sweep, this pins the arithmetic itself.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_SCALE = 100
_DF_CAP = 0.5

_WORDS = ["a", "b", "c", "d", "e"]


def _pairs(docs: list[list[str]]):
    """Mirror of the query: tf, df-capped centi-idf, w = tf*idf,
    sparse dot over shared terms, threshold dot^2*4 >= n2a*n2b."""
    n = len(docs)
    tf = [Counter(d) for d in docs]
    df = Counter()
    for t in tf:
        for tok in t:
            df[tok] += 1
    idf = {tok: round(math.log(n / c) * _SCALE)
           for tok, c in df.items() if c <= n * _DF_CAP}
    vecs = [{tok: cnt * idf[tok] for tok, cnt in t.items() if tok in idf}
            for t in tf]
    n2 = [sum(w * w for w in v.values()) for v in vecs]
    out = {}
    for i in range(n):
        for j in range(i + 1, n):
            shared = set(vecs[i]) & set(vecs[j])
            dot = sum(vecs[i][t] * vecs[j][t] for t in shared)
            if n2[i] and n2[j]:
                out[(i, j)] = (dot, n2[i], n2[j])
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
                min_size=2, max_size=6))
def test_integer_threshold_equals_real_cosine(docs):
    for (i, j), (dot, a2, b2) in _pairs(docs).items():
        int_decision = dot * dot * 4 >= a2 * b2
        real_cos = dot / (math.sqrt(a2) * math.sqrt(b2))
        # the integer form is exact; the float comparison can only
        # disagree within representation error of exactly-0.5 cases
        if abs(real_cos - 0.5) > 1e-9:
            assert int_decision == (real_cos >= 0.5), \
                ((i, j), dot, a2, b2, real_cos)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
                min_size=2, max_size=6))
def test_sparse_dot_equals_dense_dot(docs):
    n = len(docs)
    tf = [Counter(d) for d in docs]
    df = Counter()
    for t in tf:
        for tok in t:
            df[tok] += 1
    idf = {tok: round(math.log(n / c) * _SCALE)
           for tok, c in df.items() if c <= n * _DF_CAP}
    for (i, j), (dot, _, _) in _pairs(docs).items():
        dense = sum(tf[i][tok] * idf.get(tok, 0) * tf[j][tok] * idf.get(tok, 0)
                    for tok in _WORDS)
        assert dot == dense, ((i, j), dot, dense)
