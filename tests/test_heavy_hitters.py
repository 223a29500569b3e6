"""Misra-Gries heavy-hitter properties beyond the oracle parity test:
the per-partition summary is bounded (the constant-memory contract)
and never loses a true heavy hitter (the exactness contract)."""

from __future__ import annotations

import pandas as pd

from my_mapreduce_spark.queries.pipeline_ext import (
    _HH_SUMMARY_K,
    _mg_summaries,
)


def _run_mg(stream: list[list[str]]) -> set[str]:
    batches = (pd.DataFrame({"token": b}) for b in stream)
    (out,) = list(_mg_summaries(batches))
    assert len(out) <= _HH_SUMMARY_K
    return set(out["token"])


def test_mg_summary_is_bounded_and_keeps_heavy_items():
    # 2000 distinct rare tokens (1x each) + 3 heavy tokens at ~10%
    # each, interleaved across batches; n = 2000 + 3*600 = 3800,
    # n/(k+1) ~ 7.4, so the heavy items (600 >> 7.4) must survive
    rare = [f"rare{i}" for i in range(2000)]
    heavy = ["alpha", "beta", "gamma"] * 600
    stream, step = [], 200
    mixed = []
    for i in range(0, len(rare), step):
        mixed.extend(rare[i:i + step])
        mixed.extend(heavy[i * 9 // 10:(i + step) * 9 // 10])
    for i in range(0, len(mixed), 500):
        stream.append(mixed[i:i + 500])
    kept = _run_mg(stream)
    assert {"alpha", "beta", "gamma"} <= kept


def test_mg_exact_on_small_vocab():
    # vocab under the counter budget: nothing is ever trimmed, the
    # summary is the exact distinct set
    stream = [["a", "b", "a"], ["c", "a", "b"]]
    assert _run_mg(stream) == {"a", "b", "c"}
