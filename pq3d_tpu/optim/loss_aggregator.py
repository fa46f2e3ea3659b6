"""Registry-driven loss aggregation.

Mirrors the reference ``Loss`` module (reference: optim/loss/loss.py:113-152):
loss names from the config's ``loss_list`` resolve through ``LOSS_REGISTRY``,
each returns a scalar given ``(out, batch)``, and ``loss_weights`` scales the
weighted sum.  Unlike the reference, entries whose required tensors are
absent from the batch/outputs contribute nothing instead of crashing (the
unified mixed-task loader produces per-task batches with different keys).
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp

from pq3d_tpu.registry import LOSS_REGISTRY


def _register_defaults():
    from pq3d_tpu.optim import losses as L

    if "ground_loss" in LOSS_REGISTRY:
        return

    @LOSS_REGISTRY.register(name="ground_loss")
    def ground_loss(out, batch):
        if "ground_logits" not in out or "tgt_object_id" not in batch:
            return None
        return L.cross_entropy(out["ground_logits"], batch["tgt_object_id"])

    @LOSS_REGISTRY.register(name="og3d_loss")
    def og3d_loss(out, batch):
        if "og3d_logits" not in out or "tgt_object_id" not in batch:
            return None
        return L.cross_entropy(out["og3d_logits"], batch["tgt_object_id"])

    @LOSS_REGISTRY.register(name="generation_loss")
    def generation_loss(out, batch):
        if "generation_logits" not in out or "response" not in batch:
            return None
        return L.generation_loss(out, batch)

    @LOSS_REGISTRY.register(name="answer_loss")
    def answer_loss(out, batch):
        """BCE sum / batch (ref optim/loss/loss.py:54-57)."""
        if "answer_scores" not in out or "answer_label" not in batch:
            return None
        import optax
        bce = optax.sigmoid_binary_cross_entropy(
            out["answer_scores"].astype(jnp.float32),
            batch["answer_label"].astype(jnp.float32))
        return bce.sum() / out["answer_scores"].shape[0]

    @LOSS_REGISTRY.register(name="query3d_mask_loss")
    def mask_loss(out, batch):
        if "predictions_mask" not in out or "gt_attn_mask" not in batch:
            return None
        return L.query3d_mask_loss(out["predictions_mask"],
                                   out["predictions_class"], batch)


class Loss:
    """Weighted sum of registered per-head losses.

    ``loss_list``: names in LOSS_REGISTRY (or custom callables registered by
    the caller).  ``loss_weights``: name -> float (default 1.0, ref
    loss.py:140-146).  Call returns ``(total, {name: value})`` with only the
    losses that actually applied to this batch.
    """

    def __init__(self, loss_list: Sequence[str],
                 loss_weights: Optional[Mapping[str, float]] = None,
                 extra: Optional[Mapping[str, Callable]] = None):
        _register_defaults()
        self.entries = []
        extra = dict(extra or {})
        for name in loss_list:
            fn = extra.get(name) or LOSS_REGISTRY.get(name)
            self.entries.append((name, fn))
        self.weights = {k: float(v)
                        for k, v in (loss_weights or {}).items()}

    def __call__(self, out: Dict, batch: Dict
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        total = jnp.zeros((), jnp.float32)
        parts: Dict[str, jnp.ndarray] = {}
        for name, fn in self.entries:
            val = fn(out, batch)
            if val is None:
                continue
            if isinstance(val, tuple):   # (scalar, detail-dict) losses
                val, detail = val
                parts.update(detail)
            parts[name] = val
            total = total + self.weights.get(name, 1.0) * val
        return total, parts
