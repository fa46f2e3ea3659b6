"""Multi-host utilities: cross-process metric / object merging.

Replaces the reference's torch.distributed gather machinery
(reference: common/dist_utils.py:121-220 all_gather/all_gather_unaligned,
common/misc.py:43-140 gather_dict): evaluators accumulate host-side
(value, count) pairs per process; these helpers merge them across hosts
with jax.experimental.multihost_utils (no gloo side-channel needed — JAX
owns the DCN mesh).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process
    (ref dist_utils.py:170-220 byte-tensor gather over gloo)."""
    import jax
    if jax.process_count() == 1:
        return [obj]
    import pickle
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across hosts
    n = np.asarray([len(payload)], np.int32)
    lengths = multihost_utils.process_allgather(n).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[:len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(lengths[i])].tobytes())
            for i in range(len(lengths))]


def merge_eval_dicts(eval_dict: Dict[str, List]) -> Dict[str, List]:
    """Merge per-process evaluator (value, count) accumulators
    (ref misc.py:134-140 gather_dict at evaluator record())."""
    import jax
    if jax.process_count() == 1:
        return eval_dict
    merged: Dict[str, List] = {}
    for d in all_gather_object(eval_dict):
        for k, pairs in d.items():
            merged.setdefault(k, []).extend(pairs)
    return merged
