"""True multi-process (DCN-analog) validation: two JAX processes with two
virtual CPU devices each form one 4-device data mesh, run ONE full instseg
training step on a cross-process-sharded batch, and must agree bit-for-bit
— and match a single-process 4-device run of the same step.

This covers what the in-process 8-device tests cannot: the coordination
service (launch.init_distributed), make_array_from_process_local_data,
cross-process collectives in the SPMD step, and the host-side object
gather (parallel/multihost.all_gather_object, ref dist_utils.py:170-220).
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mh_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _parse(out: str):
    m = re.search(r"RESULT loss=([\d.e+-]+) gather=\[([\d, ]+)\]", out)
    assert m, f"no RESULT line in:\n{out}"
    return float(m.group(1)), [int(x) for x in m.group(2).split(",")]


def test_two_process_train_step_matches_single_process():
    coord = f"127.0.0.1:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), coord], env=_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    (l0, g0), (l1, g1) = _parse(outs[0]), _parse(outs[1])
    # the two controllers executed ONE global SPMD step: identical loss
    assert l0 == l1
    assert np.isfinite(l0)
    # host-side object gather saw both processes
    assert g0 == g1 == [0, 1]

    # single-process 4-device reference: data parallelism must be invariant
    # to the process boundary.  The U-Net convs run bf16-compute by default,
    # so cross-topology reduction reorders flip bf16 roundings that cascade
    # through train-mode BN — 1e-4-level loss noise is expected (identical
    # programs above stay bit-exact; see PERF.md measurement notes).
    r = subprocess.run([sys.executable, WORKER, "0", "single"], env=_env(),
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=900)
    assert r.returncode == 0, f"single-process reference failed:\n{r.stdout}"
    ls, _ = _parse(r.stdout)
    np.testing.assert_allclose(l0, ls, rtol=1e-3)


EVAL_WORKER = os.path.join(REPO, "tests", "_mh_eval_worker.py")


def _parse_eval(out: str):
    m = re.search(r"RESULT og_acc=([\d.e+-]+) count=(\d+)", out)
    assert m, f"no RESULT line in:\n{out}"
    return float(m.group(1)), int(m.group(2))


def test_two_process_evaluator_matches_single_process():
    """A REAL evaluator (ScanReferEval) across 2 processes over a
    non-divisible eval set (5 items, bs=2, wrap-padded final batch):
    each process scores its contiguous rows of every global batch,
    merge_eval_dicts combines the accumulators, and the merged metric
    equals the single-process run exactly (VERDICT r04 item 5)."""
    coord = f"127.0.0.1:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, EVAL_WORKER, str(pid), coord], env=_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"eval worker failed:\n{out}"
    (a0, c0), (a1, c1) = _parse_eval(outs[0]), _parse_eval(outs[1])
    # merged metric identical on both controllers
    assert a0 == a1
    # per-process local counts partition the 5 real items exactly once
    assert c0 + c1 == 5, (c0, c1)

    r = subprocess.run([sys.executable, EVAL_WORKER, "0", "single"],
                       env=_env(), stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True, timeout=900)
    assert r.returncode == 0, f"single-process eval failed:\n{r.stdout}"
    a_s, c_s = _parse_eval(r.stdout)
    assert c_s == 5
    # 3 of 5 deterministic items are correct; merged == single == 0.6
    assert a0 == a_s == 0.6
