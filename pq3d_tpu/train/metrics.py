"""Experiment tracking + metric logging.

Replaces the reference's wandb/Tracker stack (reference: trainer/build.py:29-45
Tracker, :59-81 init_trackers, :149-160 accelerator.log) with a local-first
design: a JSONL metrics log + optional TensorBoard (tensorboardX is in the
image; wandb is not).  The `ExpTracker` dict (epoch, best_result) is
checkpointed with the train state so it survives resume.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict


class MetricsLogger:
    def __init__(self, exp_dir: str, use_tensorboard: bool = True):
        self.exp_dir = exp_dir
        os.makedirs(exp_dir, exist_ok=True)
        self._jsonl = open(os.path.join(exp_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(exp_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, metrics: Dict[str, Any], step: int, prefix: str = "train"):
        rec = {"step": step, "time": time.time(), "prefix": prefix}
        for k, v in metrics.items():
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            rec[k] = v
            if self._tb is not None:
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class ExpTracker:
    """Epoch / best-result state carried across resume
    (ref trainer/build.py:29-45)."""

    def __init__(self):
        self.epoch = 0
        self.best_result = -float("inf")

    def state_dict(self) -> Dict[str, Any]:
        return {"epoch": self.epoch, "best_result": self.best_result}

    def load_state_dict(self, d: Dict[str, Any]):
        self.epoch = int(d.get("epoch", 0))
        self.best_result = float(d.get("best_result", -float("inf")))

    def is_better(self, result: float) -> bool:
        if result > self.best_result:
            self.best_result = result
            return True
        return False
