"""Weighted MinHash-LSH (q_dedup_weighted_minhash) quality gates.

Two claims back the operator's scale-path status:

1. The REPLICATION IDENTITY — for integer weight vectors, plain
   Jaccard over the expanded element multiset (shingle#1..shingle#w)
   equals weighted Jaccard sum-min/sum-max exactly. This is the
   mathematical ground the whole design stands on, so it is proven as
   a hypothesis property, not assumed.
2. A RECALL FLOOR vs the exact milli-scaled weighted-Jaccard pairs
   (q_dedup_weighted_jaccard, the fixture-scale verifier the banded
   path replaces at scale): quantization to unit-scale idf plus
   32-permutation estimation must still recover >= 0.8 of the exact
   pair set at the shared 0.5 threshold. Measured 1.0 at sf0.001 and
   sf0.01 when pinned (RECALL_LOCAL.json trends it per round).
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR


@st.composite
def _weight_vectors(draw):
    universe = draw(st.integers(min_value=1, max_value=8))
    vec = st.lists(st.integers(min_value=0, max_value=6),
                   min_size=universe, max_size=universe)
    return draw(vec), draw(vec)


@given(_weight_vectors())
@settings(max_examples=200, deadline=None)
def test_replication_identity(pair):
    """Jaccard of the replica expansion == weighted Jaccard, exactly
    (Fraction arithmetic — no float tolerance hides an off-by-one)."""
    wa, wb = pair
    expand = lambda ws: {(f, r) for f, w in enumerate(ws)
                         for r in range(1, w + 1)}
    ea, eb = expand(wa), expand(wb)
    union = len(ea | eb)
    if union == 0:
        return
    set_jac = Fraction(len(ea & eb), union)
    num = sum(min(a, b) for a, b in zip(wa, wb))
    den = sum(max(a, b) for a, b in zip(wa, wb))
    assert set_jac == Fraction(num, den)


def test_weighted_minhash_recall_floor(spark):
    from my_mapreduce_spark.queries.dedup import (
        q_dedup_weighted_jaccard,
        q_dedup_weighted_minhash,
    )

    exact = {(r.doc_a, r.doc_b)
             for r in q_dedup_weighted_jaccard(spark, SF_DIR).collect()}
    approx_rows = q_dedup_weighted_minhash(spark, SF_DIR).collect()
    approx = {(r.doc_a, r.doc_b) for r in approx_rows}

    assert all(r.doc_a < r.doc_b for r in approx_rows)       # canonical
    assert all(r.est_jaccard >= 0.5 for r in approx_rows)    # thresholded
    assert exact, "fixture should contain weighted near-dup pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"weighted minhash recall {recall:.2f} below floor"


def test_icws_recall_floor(spark):
    """The real-valued ICWS sampler (rows-only query — float ln/exp
    chains are not cross-engine reproducible) must recover >= 0.8 of
    the exact weighted pairs, and report only canonical thresholded
    pairs. Measured 1.0 at sf0.001 and sf0.01 when pinned."""
    from my_mapreduce_spark.caching import release_caches
    from my_mapreduce_spark.queries.dedup import (
        q_dedup_icws,
        q_dedup_weighted_jaccard,
    )

    exact = {(r.doc_a, r.doc_b)
             for r in q_dedup_weighted_jaccard(spark, SF_DIR).collect()}
    rows = q_dedup_icws(spark, SF_DIR).collect()
    release_caches(spark, force_checkpointed=True)
    approx = {(r.doc_a, r.doc_b) for r in rows}

    assert all(r.doc_a < r.doc_b for r in rows)
    assert all(r.est_weighted_jaccard >= 0.5 for r in rows)
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"ICWS recall {recall:.2f} below floor"


def test_weighted_jaccard_verifier_matches_oracle(spark):
    """The demoted verifier (round-8 verdict #3: out of the benched
    registry, still the family's exactness reference) must stay
    oracle-equal — the same DuckDB twin it carried while registered,
    now pinned here so deregistration cannot silently rot it."""
    import duckdb

    from my_mapreduce_spark.queries.dedup import (
        WEIGHTED_JACCARD_ORACLE,
        q_dedup_weighted_jaccard,
    )
    from tests.oracle_utils import assert_matches_oracle

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_DIR}/documents.parquet'")
    assert_matches_oracle(q_dedup_weighted_jaccard(spark, SF_DIR),
                          con, WEIGHTED_JACCARD_ORACLE)
