"""Checkpoint save / resume (orbax).

Mirrors the reference's Accelerate checkpointing semantics (reference:
trainer/build.py:162-189): ``latest`` / ``best`` / ``ckpt_N`` snapshots of
model + optimizer + RNG + experiment tracker, plus non-strict warm-start
from pretrained weights.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from pq3d_tpu.train.state import TrainState


class CheckpointManager:
    """``async_save=True`` lets orbax commit the snapshot in the background
    so the next train step starts immediately (the functional train step
    builds a NEW state pytree, so the saved one stays immutable while the
    write completes); each save waits for the previous one first, since
    latest/best are overwritten in place."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 5,
                 async_save: bool = False):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.async_save = async_save

    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def save(self, name: str, state: TrainState,
             tracker: Optional[Dict[str, Any]] = None) -> None:
        payload = {"state": state}
        if tracker:
            payload["tracker"] = {k: np.asarray(v) for k, v in tracker.items()}
        path = self._path(name)
        self._ckptr.wait_until_finished()   # in-place overwrite of prior save
        self._ckptr.save(path, payload, force=True)
        if not self.async_save:
            self._ckptr.wait_until_finished()

    def close(self) -> None:
        """Block until any in-flight async save is durably committed."""
        self._ckptr.wait_until_finished()

    def restore(self, name: str, state: TrainState
                ) -> tuple[TrainState, Dict[str, Any]]:
        self._ckptr.wait_until_finished()   # an async save may be in flight
        target = {"state": state,
                  "tracker": {"epoch": np.asarray(0),
                              "best_result": np.asarray(-np.inf)}}
        path = self._path(name)
        try:
            restored = self._ckptr.restore(path, target)
        except ValueError:
            # checkpoint without a tracker payload
            restored = self._ckptr.restore(path, {"state": state})
            restored["tracker"] = {}
        tracker = restored.get("tracker") or {}
        return restored["state"], {k: v.item() if hasattr(v, "item") else v
                                   for k, v in tracker.items()}

    def exists(self, name: str) -> bool:
        self._ckptr.wait_until_finished()   # an async save may be in flight
        return os.path.isdir(self._path(name))


def load_pretrain(params: Any, pretrained: Dict[str, Any]) -> Any:
    """Non-strict warm start: copy matching-shaped leaves by path, report
    the diff (ref trainer/build.py:176-186 strict=False load)."""
    flat_new, treedef = jax.tree_util.tree_flatten_with_path(params)
    flat_old = {"/".join(str(k) for k in p): v
                for p, v in jax.tree_util.tree_flatten_with_path(pretrained)[0]}
    out, loaded, skipped = [], [], []
    for path, leaf in flat_new:
        key = "/".join(str(k) for k in path)
        src = flat_old.get(key)
        if src is not None and getattr(src, "shape", None) == leaf.shape:
            out.append(src.astype(leaf.dtype) if hasattr(src, "astype") else src)
            loaded.append(key)
        else:
            out.append(leaf)
            skipped.append(key)
    if skipped:
        print(f"[pretrain] loaded {len(loaded)} leaves, kept init for "
              f"{len(skipped)} (first few: {skipped[:5]})")
    return jax.tree_util.tree_unflatten(treedef, out)
