"""Executor-loss chaos contract (round-9 verdict #8): SIGKILL a real
executor JVM mid-run of the exactly-once streaming sink and the
checkpointed CC loop; output must be identical to a crash-free run —
the modern analogue of the reference's crash.go experiment
(``mrapps/crash.go:22-34``). Runs in a subprocess because it needs a
``local-cluster[2, 4, 2048]`` master with real executor processes,
which the shared test session does not use."""

from __future__ import annotations

import os
import subprocess
import sys

_DEMO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "chaos_kill_executor.py")


def test_executor_kill_recovers_with_identical_output():
    out = subprocess.run(
        [sys.executable, _DEMO], capture_output=True, text=True, timeout=580,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.01"})
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "output identical to clean run after executor kill" in out.stdout
