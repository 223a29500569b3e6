"""SemDeDup quality gates: the clustered pair search must emit a
SUBSET of the exact cosine pairs (precision 1.0 — scores are true
cosines, so a false positive would mean a scoring bug) and recover
most of them (recall — the multi-assign clustering doing its job on
the near-uniform fixture, the clustering worst case)."""

from __future__ import annotations

from tests.conftest import SF_DIR

_THRESHOLD = 0.4


def test_semantic_dedup_precision_and_recall(spark):
    from my_mapreduce_spark.queries.dedup import (
        q_dedup_embedding_cosine,
        q_dedup_semantic,
    )

    sem_rows = q_dedup_semantic(spark, SF_DIR).collect()
    sem = {(r.vec_a, r.vec_b) for r in sem_rows}
    exact = {(min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
             for r in q_dedup_embedding_cosine(spark, SF_DIR).collect()}

    assert all(r.vec_a < r.vec_b for r in sem_rows)          # canonical
    assert all(r.cosine >= _THRESHOLD for r in sem_rows)     # thresholded
    assert sem <= exact, f"false positives: {sorted(sem - exact)[:5]}"
    recall = len(sem & exact) / len(exact)
    assert recall >= 0.75, f"semantic dedup recall {recall:.2f} below bound"
