"""Multi-host (2 REAL processes) smoke — VERDICT r2 item 9.

Launches scripts/multihost_smoke.py, which spawns two coordinated JAX
processes (gloo CPU collectives, 2 virtual devices each), runs one
production ViViT train_step over a dp=4 mesh spanning both hosts with each
host feeding only its ``local_batch_slice``, and asserts the result matches
a single-process run (i.e. gradients really crossed the process boundary).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
SCRIPT = os.path.join(REPO, "scripts", "multihost_smoke.py")


@pytest.mark.slow
def test_multihost_smoke_two_processes():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, SCRIPT], capture_output=True, text=True, timeout=900,
        env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert verdict["multihost_smoke_ok"] is True
    assert len(verdict["reports"]) == 2
