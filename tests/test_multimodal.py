"""Multimodal plumbing: binary schema, real decode, determinism."""

from __future__ import annotations

from my_mapreduce_spark.multimodal import (build_asset_table,
                                           byte_raster_features,
                                           extract_features)
from tests.conftest import SF_DIR


def test_byte_raster_deterministic():
    assert byte_raster_features(b"payload") == byte_raster_features(b"payload")
    w, h, n = byte_raster_features(b"payload")
    assert (w, h) == (7, 1) and 0.0 <= n <= 1.0


def test_asset_table_schema(spark):
    assets = build_asset_table(spark, SF_DIR)
    assert dict(assets.dtypes) == {
        "doc_id": "bigint", "payload": "binary", "mime": "string",
        "n_bytes": "bigint"}


def test_feature_extraction_partition_invariant(spark):
    """Features must not depend on partitioning (the mapInPandas
    batch boundaries)."""
    assets = build_asset_table(spark, SF_DIR)
    one = {r.doc_id: (r.width, r.height, r.feat_norm)
           for r in extract_features(assets.coalesce(1)).collect()}
    many = {r.doc_id: (r.width, r.height, r.feat_norm)
            for r in extract_features(assets.repartition(16)).collect()}
    assert one == many
    assert len(one) == assets.count()
