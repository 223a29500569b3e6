"""transformWithStateInPandas running aggregate (streaming/tws.py).

The operator needs protobuf (the Python↔state-server wire protocol);
where the sandbox lacks it the tests assert the honest gating —
implementation present, query not registered — instead of silently
passing.
"""

from __future__ import annotations

import pytest

from my_mapreduce_spark.registry import REGISTRY, _ensure_loaded
from my_mapreduce_spark.streaming.tws import _protobuf_available


def test_registration_matches_dependency():
    _ensure_loaded()
    assert ("q_streaming_tws_running_agg" in REGISTRY) \
        == _protobuf_available()


@pytest.mark.skipif(not _protobuf_available(),
                    reason="protobuf not available in sandbox")
def test_tws_running_agg_matches_batch(spark, duck):
    from my_mapreduce_spark.streaming.tws import (TWS_ORACLE,
                                                  run_tws_running_agg)
    from tests.conftest import SF_DIR
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle(run_tws_running_agg(spark, SF_DIR), duck,
                          TWS_ORACLE)
