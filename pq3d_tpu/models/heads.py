"""Task heads (flax linen).

Re-designs of the reference heads (reference: modules/heads/*):
- MaskHeadSegLevel  <- mask_head.py:10-57
- GroundHead        <- grounding_head.py:42-55
- ClsHead           <- aux_head.py:8-18
(The T5 generation head lives in generation.py — it wraps the native T5.)

Mask logits convention: (B, S, Q) like the reference (segments x queries);
attention masks returned as True = attend.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models.layers import MLPHead, dense_init, NEG_INF
from pq3d_tpu.registry import HEADS_REGISTRY


class MaskPredictionLayer(nn.Module):
    """q/k projection + segment-query inner product
    (ref mask_head.py:46-57)."""
    hidden_size: int

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
        q = nn.Dense(self.hidden_size, kernel_init=dense_init, name="q_proj")(query)
        k = nn.Dense(self.hidden_size, use_bias=False, kernel_init=dense_init,
                     name="k_proj")(key)
        return jnp.einsum("bsd,bqd->bsq", k, q)  # (B, S, Q)


@HEADS_REGISTRY.register(name="MaskHeadSegLevel")
class MaskHeadSegLevel(nn.Module):
    """Class + segment-mask prediction from queries
    (ref mask_head.py:10-44).

    Returns ``(cls_logits (B,Q,T), mask_logits (B,S,Q), attend_mask (B,Q,S))``
    where attend_mask is True where the query may attend (sigmoid >= 0.5).
    """
    hidden_size: int
    num_targets: int
    num_memories: int = 1                    # memories_for_match
    filter_out_classes: Sequence[int] = ()
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query: jnp.ndarray,
                 seg_fts_for_match: List[Tuple[jnp.ndarray, jnp.ndarray]],
                 seg_valid: jnp.ndarray,
                 offline_attn_masks: Optional[jnp.ndarray] = None,
                 skip_prediction: bool = False,
                 deterministic: bool = True):
        if skip_prediction:
            return None, None, offline_attn_masks
        cls_logits = MLPHead(self.hidden_size, self.num_targets,
                             dropout=self.dropout, name="cls_head")(
            query, deterministic)
        if self.filter_out_classes:
            idx = jnp.asarray(list(self.filter_out_classes))
            cls_logits = cls_logits.at[..., idx].set(NEG_INF)

        mask_sum = 0.0
        cnt = 0.0
        for i in range(self.num_memories):
            feat, valid = seg_fts_for_match[i]
            logits = MaskPredictionLayer(self.hidden_size,
                                         name=f"mask_pred_{i}")(query, feat)
            w = valid[..., None].astype(logits.dtype)  # (B, S, 1)
            mask_sum = mask_sum + logits * w
            cnt = cnt + w
        mask_logits = mask_sum / (cnt + 1e-8)
        mask_logits = jnp.where(seg_valid[..., None], mask_logits, -1e6)

        if offline_attn_masks is not None:
            attend = offline_attn_masks
        else:
            attend = jax.lax.stop_gradient(
                jax.nn.sigmoid(mask_logits).swapaxes(1, 2)) >= 0.5
        return cls_logits, mask_logits, attend


@HEADS_REGISTRY.register(name="GroundHead")
class GroundHead(nn.Module):
    """Per-query grounding logit (ref grounding_head.py:42-55)."""
    hidden_size: int = 384
    dropout: float = 0.3

    @nn.compact
    def __call__(self, obj_embeds: jnp.ndarray,
                 obj_valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        logits = MLPHead(self.hidden_size, 1, dropout=self.dropout,
                         name="og3d_head")(obj_embeds, deterministic)[..., 0]
        if obj_valid is not None:
            logits = jnp.where(obj_valid, logits, NEG_INF)
        return logits


@HEADS_REGISTRY.register(name="GroundHeadV1")
class GroundHeadV1(nn.Module):
    """Legacy grounding head with auxiliary txt/obj classification
    (ref grounding_head.py:8-39)."""
    input_size: int = 768
    hidden_size: int = 768
    sem_cls_size: int = 607
    dropout: float = 0.3
    detach_all_aux_loss: bool = False

    @nn.compact
    def __call__(self, txt_embeds, obj_embeds, obj_pre_embeds, obj_valid,
                 deterministic: bool = True):
        og3d = MLPHead(self.hidden_size, 1, dropout=self.dropout,
                       name="og3d_head")(obj_embeds, deterministic)[..., 0]
        og3d = jnp.where(obj_valid, og3d, NEG_INF)
        if self.detach_all_aux_loss:
            txt_embeds = jax.lax.stop_gradient(txt_embeds)
            obj_embeds = jax.lax.stop_gradient(obj_embeds)
            obj_pre_embeds = jax.lax.stop_gradient(obj_pre_embeds)
        txt_cls = MLPHead(self.hidden_size, self.sem_cls_size,
                          dropout=self.dropout, name="txt_clf_head")(
            txt_embeds[:, 0], deterministic)
        obj_cls = MLPHead(self.hidden_size, self.sem_cls_size,
                          dropout=self.dropout, name="obj3d_clf_head")(
            obj_embeds, deterministic)
        obj_cls_pre = MLPHead(self.hidden_size, self.sem_cls_size,
                              dropout=self.dropout,
                              name="obj3d_clf_pre_head")(
            obj_pre_embeds, deterministic)
        return txt_cls, obj_cls, obj_cls_pre, og3d


@HEADS_REGISTRY.register(name="ClsHead")
class ClsHead(nn.Module):
    """Plain MLP classifier head (ref aux_head.py:8-18)."""
    hidden_size: int
    num_classes: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return MLPHead(self.hidden_size, self.num_classes,
                       dropout=self.dropout)(x, deterministic)
