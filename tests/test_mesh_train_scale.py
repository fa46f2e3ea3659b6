"""Realistic-shape multi-device training on the virtual CPU mesh.

VERDICT r03 item 5: the driver dryrun proves the dp train step compiles at
toy shapes; shape-dependent sharding bugs (uneven segment pads across dp
ranks, cap-boundary padding, per-rank FPS divergence) can hide behind
hidden=64.  This runs tools/bench_mesh_train.py as a subprocess: the SAME
dp=8 train step at the shipped recipe's hidden 768 / 120 queries / 512
segments with deliberately UNEVEN scenes per rank, and asserts the sharded
loss stays finite across steps.  The `smoke` scale keeps the level caps
CPU-sized (8192...) so the test finishes on the 1-core box; the `full`
scale (shipped caps 65536...) is the manual pre-round-end check
(PERF.md "mesh training at realistic scale").

Counterpart capability in the reference: Accelerate DDP at full scale
(/root/reference/trainer/build.py:123-129), validated there only by real
jobs; here it is a standing harness.
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def test_mesh_train_realshape_smoke():
    env = dict(os.environ)
    env["HF_HUB_OFFLINE"] = "1"
    env["PQ3D_NO_COMPILE_CACHE"] = "1"  # cross-host CPU AOT entries SIGILL
    r = subprocess.run(
        [sys.executable, "tools/bench_mesh_train.py", "smoke", "8", "2"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=5400)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
    assert "MESH_TRAIN_OK" in r.stdout, r.stdout[-4000:]
