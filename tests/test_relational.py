"""Every registered query with an oracle must match DuckDB at sf0.001."""

from __future__ import annotations

import pytest

from my_mapreduce_spark.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_matches_oracle

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke
    else:
        assert_matches_oracle(df, duck, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
