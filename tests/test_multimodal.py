"""Multimodal plumbing: binary schema, stub gating, determinism."""

from __future__ import annotations

import pytest

from my_mapreduce_spark.multimodal import (build_asset_table, decode_image,
                                           extract_features, fake_decode)
from tests.conftest import SF_DIR


def test_decode_stub_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_decode_deterministic():
    assert fake_decode(b"payload") == fake_decode(b"payload")
    w, h, n = fake_decode(b"payload")
    assert 64 <= w <= 319 and 64 <= h <= 319 and 0.0 <= n <= 1.0


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
