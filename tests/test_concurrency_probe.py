"""Concurrent-stream throughput probe (tools/concurrency_probe.py)
regression pin: streams driving one session concurrently must all
complete, error-free, with real parallel speedup — the multi-tenant
seam bench.py's sequential convention never exercises.

Run at sf0.001 so the pin is cheap; the measured sf0.1 numbers live
in CONCURRENCY_LOCAL.json / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_concurrent_streams_complete_with_speedup(tmp_path):
    out = str(tmp_path / "conc.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "concurrency_probe.py"),
         "--sf", "/root/testdata/sf0.001", "--streams", "3",
         "--out", out],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    with open(out) as f:
        rep = json.load(f)
    assert rep["errors"] == []
    assert rep["scheduler_mode"] == "FAIR"
    # 3 streams of identical work through one session: anything
    # under 1.2x means the streams serialized (a held lock, a
    # convoying stage) — at sf0.001 fixed per-query overhead
    # dominates, so demand real overlap, not the ideal 3x
    assert rep["throughput_speedup"] >= 1.2, rep["throughput_speedup"]
    # fairness: no query may starve an order of magnitude under
    # contention
    for name, row in rep["queries"].items():
        assert row["slowdown"] < 10, (name, row)
