"""Engine fault-tolerance contract (SURVEY.md §5.2 item 3): the
crash-injection experiment runs in a subprocess because it needs a
retry-capable master (``local[4, 4]``), which the shared test
session does not use."""

from __future__ import annotations

import os
import subprocess
import sys

_DEMO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "fault_tolerance_demo.py")


def test_injected_crashes_are_retried_with_identical_output():
    out = subprocess.run(
        [sys.executable, _DEMO], capture_output=True, text=True, timeout=300,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "output identical to clean run" in out.stdout
