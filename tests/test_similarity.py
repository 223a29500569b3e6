"""Quality bounds for the approximate (rows-only) similarity paths."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_lsh_recall_vs_bruteforce(spark):
    from my_mapreduce_spark.queries.similarity import (q_knn_bruteforce,
                                                       q_knn_lsh_buckets)

    exact = _topk(q_knn_bruteforce(spark, SF_DIR))
    approx = _topk(q_knn_lsh_buckets(spark, SF_DIR))
    assert set(approx) == set(exact)  # every query answered
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= 0.6, f"LSH recall {recall:.2f} below bound"


def test_minhash_lsh_finds_true_near_dups(spark):
    """Every exact-Jaccard >= 0.8 pair must be caught by MinHash-LSH
    (banding theory: P[miss] = (1-s^3)^3 < 1.6% at s=0.8; the
    planted near-dups sit at ~0.99 where P[miss] ~ 0)."""
    from my_mapreduce_spark.queries.dedup import (q_dedup_minhash_lsh,
                                                  q_dedup_ngram_jaccard)

    truth = {(r.doc_a, r.doc_b) for r in
             q_dedup_ngram_jaccard(spark, SF_DIR).collect() if r.jaccard >= 0.8}
    found = {(r.doc_a, r.doc_b) for r in q_dedup_minhash_lsh(spark, SF_DIR).collect()}
    assert truth, "fixture should contain planted near-dups"
    missed = truth - found
    assert not missed, f"MinHash-LSH missed true near-dups: {missed}"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF probes nprobe/n_centroids of the corpus; on the fixture's
    near-uniform vectors (LSH/IVF worst case) recall must still
    clear a usefulness bound, and every query must be answered."""
    from my_mapreduce_spark.queries.similarity import (q_knn_bruteforce,
                                                       q_knn_ivf)

    exact = _topk(q_knn_bruteforce(spark, SF_DIR))
    approx = _topk(q_knn_ivf(spark, SF_DIR))
    assert set(approx) == set(exact)
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    assert recall >= 0.5, f"IVF recall {recall:.2f} below bound"
