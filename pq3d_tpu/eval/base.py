"""Evaluator base: update -> record lifecycle with (value, count) accumulation.

Mirrors the reference's BaseEvaluator (reference: evaluator/build.py:13-56).
Cross-host metric merging uses jax.experimental.multihost_utils when running
multi-process (the reference used torch.distributed gather_dict,
common/misc.py:134-140).
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Any, Dict, Optional

import numpy as np


class BaseEvaluator:
    def __init__(self, save_dir: Optional[str] = None):
        self.save_dir = save_dir
        self.eval_dict: Dict[str, list] = defaultdict(list)
        self.total_count = 0
        self.best_result = -np.inf
        self.target_metric = "target_metric"

    def reset(self):
        self.eval_dict = defaultdict(list)
        self.total_count = 0

    def update(self, out: Dict[str, Any], batch: Dict[str, Any]) -> None:
        raise NotImplementedError

    def batch_metrics(self, out, batch) -> Dict[str, float]:
        raise NotImplementedError

    def record(self) -> Dict[str, float]:
        """Aggregate accumulated (value, count) pairs into means (merged
        across hosts when running multi-process)."""
        from pq3d_tpu.parallel.multihost import merge_eval_dicts
        results = {}
        merged = merge_eval_dicts(dict(self.eval_dict))
        for k, pairs in merged.items():
            v = sum(x * c for x, c in pairs)
            c = sum(c for _, c in pairs)
            results[k] = v / max(c, 1)
        if self.target_metric in results:
            results["target_metric"] = results[self.target_metric]
        if self.save_dir:
            os.makedirs(self.save_dir, exist_ok=True)
            with open(os.path.join(self.save_dir, "results.json"), "w") as f:
                json.dump(results, f, indent=2)
        return results
