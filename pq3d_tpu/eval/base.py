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


def truncate_batch_rows(tree: Any, n_real: int, batch_rows: int) -> Any:
    """Drop wrap-padding rows before an evaluator sees them.

    Eval loaders pad the final non-divisible batch to full size by
    wrap-around and mark ``_meta['n_real']`` (the reference pads in its
    distributed sampler and truncates at gather, common/misc.py:103-117);
    this drops those rows from evaluator-facing copies (model inputs keep
    their static shapes).

    Sliced, precisely (genericity here risks slicing the wrong axis —
    e.g. a per-scene meta array whose dim0 happens to equal the batch
    size):
      * np arrays with leading dim == ``batch_rows`` anywhere in the tree
        (batch-led tensors; per-LAYER lists of them slice elementwise);
      * lists/tuples of length ``batch_rows`` that do NOT consist of
        batch-led arrays (per-row payloads: meta lists, decoded texts).
    """
    if n_real >= batch_rows:
        return tree

    def cut(x):
        if isinstance(x, dict):
            return {k: cut(v) for k, v in x.items()}
        if isinstance(x, np.ndarray):
            return x[:n_real] if (x.ndim >= 1 and
                                  x.shape[0] == batch_rows) else x
        if isinstance(x, (list, tuple)):
            elems_batch_led = all(
                isinstance(v, np.ndarray) and v.ndim >= 1 and
                v.shape[0] == batch_rows for v in x) and len(x) > 0
            if elems_batch_led:         # e.g. per-round prediction stacks
                return type(x)(v[:n_real] for v in x)
            if len(x) == batch_rows:    # per-row payloads
                return type(x)(x[:n_real])
            return type(x)(cut(v) for v in x)
        return x
    return cut(tree)


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
