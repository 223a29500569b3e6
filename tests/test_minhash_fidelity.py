"""The (bands, rows) MinHash fidelity knob must follow banding
theory: a pair at true Jaccard s becomes an LSH candidate with
probability 1-(1-s^rows)^bands. Pins (a) the registered 3x3 query is
exactly the parametrized builder at (3,3), (b) the measured catch
rate at planted similarity levels tracks the theoretical S-curve for
the production configs 16x4 and 32x4, (c) widening bands strictly
grows the candidate set (shared band prefixes), so fidelity is
monotone."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR

# pairs per planted similarity level: enough that a binomial 3-sigma
# band stays well inside the asserted tolerance
_PAIRS_PER_LEVEL = 100
# (target jaccard, shared shingles m out of 100+100: s = m/(200-m))
_LEVELS = [(0.40, 57), (0.60, 75), (0.80, 89)]


def _planted_shingles(spark):
    """Disjoint shingle universes per pair: doc 2i holds 100 shingles
    p<i>|s0..99, doc 2i+1 shares the first m and brings 100-m of its
    own — exact Jaccard m/(200-m), no cross-pair collisions."""
    rows = []
    doc = 0
    truth = []  # (doc_a, doc_b, s)
    for s_target, m in _LEVELS:
        for p in range(_PAIRS_PER_LEVEL):
            a, b = doc, doc + 1
            doc += 2
            tag = f"{s_target}|{p}"
            rows += [(a, f"{tag}|s{j}") for j in range(100)]
            rows += [(b, f"{tag}|s{j}") for j in range(m)]
            rows += [(b, f"{tag}|t{j}") for j in range(100 - m)]
            truth.append((a, b, m / (200 - m)))
    df = spark.createDataFrame(rows, "doc_id long, shingle string")
    return df, truth


def _theory(s: float, bands: int, rows: int) -> float:
    return 1.0 - (1.0 - s ** rows) ** bands


def test_registered_query_is_3x3_instance(spark):
    from my_mapreduce_spark.queries.dedup import (_shingle_rows,
                                                  minhash_lsh_pairs,
                                                  q_dedup_minhash_lsh)

    via_knob = {tuple(r) for r in minhash_lsh_pairs(
        _shingle_rows(spark, SF_DIR), 3, 3, min_matches=5).collect()}
    registered = {tuple(r) for r in
                  q_dedup_minhash_lsh(spark, SF_DIR).collect()}
    assert via_knob == registered and registered
    spark.catalog.clearCache()


def test_banding_theory_recall_curve(spark):
    from my_mapreduce_spark.queries.dedup import minhash_lsh_pairs

    df, truth = _planted_shingles(spark)
    df = df.cache()
    try:
        prev_cand: set | None = None
        for bands, rows in [(16, 4), (32, 4)]:
            cand = {(r.doc_a, r.doc_b) for r in
                    minhash_lsh_pairs(df, bands, rows).collect()}
            for s_target, m in _LEVELS:
                s = m / (200 - m)
                planted = [(a, b) for a, b, ps in truth
                           if abs(ps - s) < 1e-9]
                caught = sum((a, b) in cand for a, b in planted)
                rate = caught / len(planted)
                want = _theory(s, bands, rows)
                assert abs(rate - want) <= 0.15, (
                    f"{bands}x{rows} at s={s:.2f}: measured {rate:.2f} "
                    f"vs banding theory {want:.2f}")
            # a planted pair never spans similarity levels, so any
            # candidate among planted docs pairs a doc with its twin
            if prev_cand is not None:
                assert cand >= prev_cand, \
                    "widening bands must only ADD candidates"
            prev_cand = cand
            spark.catalog.clearCache()
    finally:
        df.unpersist()


def test_higher_fidelity_catches_mid_similarity_pairs(spark):
    """The motivating case for the knob: at s=0.6 the 3x3 config is
    expected to miss a large fraction (theory 0.52), while 32x4
    catches essentially everything (theory 0.99)."""
    from my_mapreduce_spark.queries.dedup import minhash_lsh_pairs

    df, truth = _planted_shingles(spark)
    df = df.cache()
    try:
        mid = [(a, b) for a, b, s in truth if abs(s - 0.6) < 1e-9]
        low = {(r.doc_a, r.doc_b) for r in
               minhash_lsh_pairs(df, 3, 3).collect()}
        spark.catalog.clearCache()
        high = {(r.doc_a, r.doc_b) for r in
                minhash_lsh_pairs(df, 32, 4).collect()}
        spark.catalog.clearCache()
        rate_low = sum(p in low for p in mid) / len(mid)
        rate_high = sum(p in high for p in mid) / len(mid)
        assert rate_high >= 0.95, f"32x4 at s=0.6 caught only {rate_high:.2f}"
        assert rate_high > rate_low, "knob must raise recall at s=0.6"
    finally:
        df.unpersist()
