"""Dirty-row inputs (NULL/empty text, NULL lang/source, NULL/empty
embedding arrays, malformed props JSON) must degrade to dropped rows
or NULL outputs, never crashes. A real crawl delivers all of these.

Round 4's sweep found the embedding family (np.stack/np.vstack over
NULL/empty arrays), the multimodal decode (bytes(None)) and
q_doc_chunking (sequence(1, 0, 48) THROWS with an explicit step)
crashing; fixed by ingestion-hygiene filters at each entry point
(_normed, _cov_moments, build_asset_table, the chunker's size
guard). This suite pins those plus a family spread against a tier
with injected dirty rows; it also asserts the hygiene filters do
not disturb results on clean rows (the oracles pin that on the
driver side)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from my_mapreduce_spark.io import TABLES, load_table

FIXED = [
    "q_dedup_embedding_cosine", "q_dedup_signal_agreement",
    "q_dedup_semantic", "q_knn_lsh_buckets", "q_knn_ivf", "q_knn_pq_adc",
    "q_embedding_covariance", "q_embedding_pca", "q_doc_chunking",
    "q_multimodal_frame_sample", "q_multimodal_pipeline",
]
SPREAD = [
    "q_lang_id_trigram", "q_variant_json_stats", "q_dedup_minhash_lsh",
    "q_quality_filter_rules", "q_pack_sequences", "q_bm25_search",
    "q_bpe_encode", "q_wilson_ctr", "q_tokenizer_fertility",
    "q_mixture_temperature", "q_dedup_prefix_filter",
    "q_doc_repetition", "q_posting_gap_bits", "q_index_delta_merge",
    "q_itemsets_apriori", "q_editdist1_join", "q_linkpred_resource_alloc",
    "q_sequence_pattern_match", "q_feature_hashing", "q_compression_ratio",
    "q_quantile_normalize", "q_selfjoin_size_stats",
    "q_poisson_bootstrap_ci", "q_roc_auc", "q_gains_table",
    "q_ab_test_welch", "q_chisq_independence", "q_classifier_metrics",
    "q_walk_forward_splits", "q_learning_curve", "q_rendezvous_sharding",
    "q_k_anonymity",
    # fourth round-4 batch: the ECDF grid cross-join and the
    # DP noise expression on zero/null groups
    "q_ks_test", "q_dp_noisy_counts",
    "q_interval_overlap_join", "q_substring_dedup_spans",
    "q_retrieval_recall_mrr",
    "q_survival_life_table", "q_mann_kendall",
    "q_join_size_estimate", "q_jl_projection",
    "q_snapshot_time_travel", "q_autocomplete_prefix_index",
    "q_kmv_sketch_intersect", "q_calibration_ece",
    "q_funnel_ordered_3step", "q_sql_named_window",
    "q_calendar_spine", "q_byte_entropy_vectorized",
    # fifth-seventh round-4 batches: NULL/empty-text token and CDC
    # paths, NaN/Inf event-value filters, NULL/empty embeddings in
    # the tiled mutual-match scorer, the lang-id composition
    "q_cohens_kappa", "q_psi_drift", "q_sentence_centrality",
    "q_cdc_chunks", "q_permutation_test", "q_next_token_suggest",
    "q_decay_weighted_engagement", "q_mutual_best_match",
    "q_rrf_fusion", "q_vocab_coverage_curve",
    "q_theil_sen_slope", "q_seasonal_anomaly", "q_multimodal_phash",
    # round-5 batch: NULL/empty text through the tokenizing paths
    # (sparse cosine, arrow token stats, funnel normalization) and
    # the md5-rank sampler on NULL keys
    "q_dedup_funnel", "q_sparse_cosine_pairs", "q_token_stats_arrow",
    "q_group_sample_exact_k", "q_trimmed_mean_udaf",
    "q_huber_mean", "q_map_hof", "q_bitwise_agg",
]


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_dirty"))
    for t in TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", t)
        if t == "documents":
            d0 = df.limit(1).collect()[0].asDict()
            rows = [dict(d0, doc_id=900001, text=None),
                    dict(d0, doc_id=900002, text=""),
                    dict(d0, doc_id=900003, lang=None, source=None),
                    dict(d0, doc_id=900004, text="xy")]
            df = df.unionByName(spark.createDataFrame(rows, df.schema))
        elif t == "embeddings":
            d0 = df.limit(1).collect()[0].asDict()
            rows = [dict(d0, vec_id=900001, embedding=None),
                    dict(d0, vec_id=900002, embedding=[])]
            df = df.unionByName(spark.createDataFrame(rows, df.schema))
        elif t == "events":
            bad = (df.limit(1)
                   .withColumn("event_id", F.lit(900001).cast("long"))
                   .withColumn("props", F.lit("{not json")))
            df = df.unionByName(bad.select(*df.columns))
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("name", FIXED + SPREAD)
def test_query_survives_dirty_rows(spark, dirty_dir, name):
    from my_mapreduce_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    if name not in REGISTRY:
        pytest.skip(f"{name} not registered")
    REGISTRY[name].fn(spark, dirty_dir).count()  # must not raise
    spark.catalog.clearCache()


def test_dirty_rows_are_dropped_not_counted(spark, dirty_dir):
    """The hygiene filters drop ONLY the poisoned rows: the frame
    sampler sees every non-NULL-payload doc, covariance moments
    count exactly the well-formed vectors."""
    from my_mapreduce_spark.multimodal import build_asset_table
    from my_mapreduce_spark.queries.similarity import _cov_moments

    docs = load_table(spark, dirty_dir, "documents")
    assets = build_asset_table(spark, dirty_dir)
    assert assets.count() == docs.where(F.col("text").isNotNull()).count()

    emb = load_table(spark, dirty_dir, "embeddings")
    n_good = emb.where(F.col("embedding").isNotNull()
                       & (F.size("embedding") > 0)).count()
    n_moments = _cov_moments(spark, dirty_dir) \
        .where((F.col("i") == 1) & (F.col("j") == 1)) \
        .select("n").collect()[0].n
    assert n_moments == n_good


@pytest.fixture(scope="module")
def nan_dir(spark, tmp_path_factory):
    """Events tier with NaN / +Inf / -Inf values injected — float
    telemetry delivers all three; round-4 full-registry sweep found
    zero crashes (Spark aggregates propagate, windows order NaN
    last); this spread keeps the class pinned."""
    out = str(tmp_path_factory.mktemp("sf_nan"))
    for t in TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", t)
        if t == "events":
            one = df.limit(3)
            mid = F.monotonically_increasing_id()
            bad = (one.withColumn(
                       "value",
                       F.when(mid == 0, float("nan"))
                        .when(mid == 1, float("inf"))
                        .otherwise(float("-inf")))
                   .withColumn("event_id",
                               (F.col("event_id") + F.lit(900000))
                               .cast(df.schema["event_id"].dataType)))
            df = df.unionByName(bad.select(*df.columns))
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.parametrize("name", [
    "q_percentile_trend", "q_mad_outliers", "q_events_latest_state",
    "q_window_lag_events", "q_events_time_rollup", "q_approx_quantiles",
    "q_twap_events", "q_ewma_events",
])
def test_query_survives_nan_inf_values(spark, nan_dir, name):
    from my_mapreduce_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    REGISTRY[name].fn(spark, nan_dir).count()  # must not raise
    spark.catalog.clearCache()
