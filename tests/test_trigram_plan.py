"""q_lang_id_trigram's plan contract: ONE doc-keyed exchange, total.

The round-4 rework repartitions docs by doc_id before the explode so
the (doc,tri) count agg, the doc-norm agg, the post-broadcast dot
agg, the dn join, and the per-doc argmax window all reuse that
partitioning. A regression (e.g. dropping the repartition, or adding
a groupBy key Spark can't prove co-partitioned) shows up as extra
hashpartitioning exchanges over doc-keyed relations — at 100 TB each
one is a full corpus-derived shuffle."""

from __future__ import annotations

import re

from tests.conftest import SF_DIR


def test_single_doc_keyed_exchange(spark):
    from my_mapreduce_spark.queries.text_analysis import q_lang_id_trigram

    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # a previous test's lingering cache would substitute
        # InMemoryRelation for plan-identical subtrees and hide the
        # exchange this test counts
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = q_lang_id_trigram(spark, SF_DIR)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
        plan = df._jdf.queryExecution().explainString(
            mode.fromString("formatted"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
        spark.catalog.clearCache()

    doc_exchanges = re.findall(
        r"Arguments: hashpartitioning\(doc_id[^\n]*", plan)
    assert len(doc_exchanges) == 1, (
        f"expected exactly 1 doc-keyed exchange, got "
        f"{len(doc_exchanges)}: {doc_exchanges}")
    # the centroid side still shuffles by its vocabulary key and the
    # final confusion matrix by (lang, clang) — both bounded; what
    # must NOT appear is any further doc-keyed repartition
    assert "BroadcastExchange" in plan  # centroids broadcast
