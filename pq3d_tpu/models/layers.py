"""Shared neural layers (flax linen).

JAX re-design of the reference's layer library (reference:
modules/grounding/query_encoder.py:184-483, modules/layers/transformers.py,
modules/utils.py:18-32).  All attention is implemented directly with einsums
(bf16 on the MXU, f32 softmax), with explicit mask semantics:

* masks here are **True = attend / valid** (HF convention); the reference
  mixes torch (True = masked) and HF conventions — we standardize.
* cross attention reproduces torch's ``add_zero_attn=True`` (an extra
  all-zero key/value slot with logit 0) so fully-masked rows stay finite.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# bert-style init used throughout the reference (modules/weights.py:3-20)
dense_init = nn.initializers.normal(stddev=0.02)
xavier_init = nn.initializers.xavier_uniform()

NEG_INF = -1e9


def get_activation(name: str) -> Callable:
    return {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "glu": jax.nn.glu}[name]


class MLPHead(nn.Module):
    """Linear -> ReLU -> LayerNorm -> Dropout -> Linear
    (ref modules/utils.py:18-25 get_mlp_head)."""
    hidden_size: int
    output_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_size, kernel_init=dense_init)(x)
        x = jax.nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-12)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.output_size, kernel_init=dense_init)(x)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, k = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * k)


def masked_softmax(logits: jnp.ndarray, mask: Optional[jnp.ndarray],
                   zero_attn: bool = False) -> jnp.ndarray:
    """Softmax over the last axis with an attend-mask (True = attend).

    With ``zero_attn`` an implicit extra slot with logit 0 joins the
    normalization (torch add_zero_attn) and its weight is dropped, so rows
    with no attendable key produce zero output instead of NaN.
    """
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    if zero_attn:
        zeros = jnp.zeros(logits.shape[:-1] + (1,), logits.dtype)
        probs = jax.nn.softmax(jnp.concatenate([logits, zeros], axis=-1), axis=-1)
        return probs[..., :-1]
    return jax.nn.softmax(logits, axis=-1)


class MultiHeadAttention(nn.Module):
    """Standard MHA with optional zero-attention slot.

    ``attn_mask`` may be (B, Kv), (B, Q, Kv) or (B, H, Q, Kv); True = attend.
    """
    d_model: int
    n_head: int
    dropout: float = 0.0
    zero_attn: bool = False

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, deterministic: bool = True):
        h = self.n_head
        qp = _split_heads(nn.Dense(self.d_model, kernel_init=xavier_init, name="q_proj")(q), h)
        kp = _split_heads(nn.Dense(self.d_model, kernel_init=xavier_init, name="k_proj")(k), h)
        vp = _split_heads(nn.Dense(self.d_model, kernel_init=xavier_init, name="v_proj")(v), h)
        scale = 1.0 / jnp.sqrt(qp.shape[-1]).astype(qp.dtype)
        logits = jnp.einsum("bhqk,bhtk->bhqt", qp * scale, kp)
        if attn_mask is not None:
            if attn_mask.ndim == 2:       # key padding (B, Kv)
                attn_mask = attn_mask[:, None, None, :]
            elif attn_mask.ndim == 3:     # (B, Q, Kv)
                attn_mask = attn_mask[:, None, :, :]
        probs = masked_softmax(logits, attn_mask, zero_attn=self.zero_attn)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqt,bhtv->bhqv", probs.astype(vp.dtype), vp)
        out = nn.Dense(self.d_model, kernel_init=xavier_init, name="out_proj")(_merge_heads(out))
        return out


class SelfAttentionLayer(nn.Module):
    """Post/pre-norm residual self-attention with positional add
    (ref query_encoder.py:184-254)."""
    d_model: int
    n_head: int
    dropout: float = 0.0
    normalize_before: bool = False

    @nn.compact
    def __call__(self, tgt, attend_mask=None, query_pos=None,
                 deterministic: bool = True):
        attn = MultiHeadAttention(self.d_model, self.n_head, self.dropout)
        ln = nn.LayerNorm()
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        src = ln(tgt) if self.normalize_before else tgt
        qk = src if query_pos is None else src + query_pos
        out = attn(qk, qk, src, attn_mask=attend_mask, deterministic=deterministic)
        tgt = tgt + drop(out)
        if not self.normalize_before:
            tgt = ln(tgt)
        return tgt


class CrossAttentionLayer(nn.Module):
    """Residual cross-attention with zero-attn slot
    (ref query_encoder.py:257-351, add_zero_attn=True)."""
    d_model: int
    n_head: int
    dropout: float = 0.0
    normalize_before: bool = False

    @nn.compact
    def __call__(self, tgt, memory, attend_mask=None, query_pos=None,
                 pos=None, deterministic: bool = True):
        attn = MultiHeadAttention(self.d_model, self.n_head, self.dropout,
                                  zero_attn=True)
        ln = nn.LayerNorm()
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        src = ln(tgt) if self.normalize_before else tgt
        q = src if query_pos is None else src + query_pos
        k = memory if pos is None else memory + pos
        out = attn(q, k, memory, attn_mask=attend_mask, deterministic=deterministic)
        tgt = tgt + drop(out)
        if not self.normalize_before:
            tgt = ln(tgt)
        return tgt


class FFNLayer(nn.Module):
    """Residual feed-forward (ref query_encoder.py:354-399)."""
    d_model: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False

    @nn.compact
    def __call__(self, tgt, deterministic: bool = True):
        ln = nn.LayerNorm()
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        src = ln(tgt) if self.normalize_before else tgt
        h = nn.Dense(self.dim_feedforward, kernel_init=xavier_init)(src)
        h = drop(get_activation(self.activation)(h))
        h = nn.Dense(self.d_model, kernel_init=xavier_init)(h)
        tgt = tgt + drop(h)
        if not self.normalize_before:
            tgt = ln(tgt)
        return tgt


class MultiHeadAttentionSpatial(nn.Module):
    """Self-attention fused with pairwise spatial geometry
    (ref modules/layers/transformers.py:158-240).

    Fusion modes: 'mul' (log of relu'd spatial logit added), 'bias', 'add'
    (softmax average), 'ctx' (spatial keys), 'cond' (query-conditioned
    per-head spatial weights).
    """
    d_model: int
    n_head: int
    dropout: float = 0.1
    spatial_multihead: bool = True
    spatial_dim: int = 5
    spatial_attn_fusion: str = "mul"

    @nn.compact
    def __call__(self, q, k, v, pairwise_locs, key_attend_mask=None,
                 deterministic: bool = True):
        h = self.n_head
        sh = h if self.spatial_multihead else 1
        residual = q
        qp = _split_heads(nn.Dense(self.d_model, kernel_init=dense_init, name="w_qs")(q), h)
        kp = _split_heads(nn.Dense(self.d_model, kernel_init=dense_init, name="w_ks")(k), h)
        vp = _split_heads(nn.Dense(self.d_model, kernel_init=dense_init, name="w_vs")(v), h)
        scale = 1.0 / jnp.sqrt(qp.shape[-1]).astype(jnp.float32)
        attn = jnp.einsum("bhqk,bhtk->bhqt", qp, kp).astype(jnp.float32) * scale

        if self.spatial_attn_fusion in ("mul", "bias", "add"):
            loc = nn.Dense(sh, kernel_init=dense_init, name="pairwise_loc_fc")(pairwise_locs)
            loc = loc.transpose(0, 3, 1, 2)  # (B, sh, L, L)
            if self.spatial_attn_fusion == "mul":
                loc = jax.nn.relu(loc)
            if not self.spatial_multihead:
                loc = jnp.repeat(loc, h, axis=1)
        elif self.spatial_attn_fusion == "ctx":
            loc = nn.Dense(self.d_model, kernel_init=dense_init, name="pairwise_loc_fc")(pairwise_locs)
            loc = loc.reshape(loc.shape[:3] + (h, -1))      # (B,L,T,h,k)
            loc = jnp.einsum("bhqk,bqthk->bhqt", qp, loc).astype(jnp.float32) * scale
        elif self.spatial_attn_fusion == "cond":
            w = nn.Dense(sh * (self.spatial_dim + 1), kernel_init=dense_init,
                         name="lang_cond_fc")(residual)
            w = w.reshape(w.shape[0], w.shape[1], sh, self.spatial_dim + 1)
            w = w.transpose(0, 2, 1, 3)  # (B, sh, L, d+1)
            if sh == 1:
                w = jnp.repeat(w, h, axis=1)
            bias, w = w[..., :1], w[..., 1:]
            loc = jnp.einsum("bhld,bltd->bhlt", w, pairwise_locs) + bias
            loc = jax.nn.sigmoid(loc)
        else:
            raise NotImplementedError(self.spatial_attn_fusion)
        loc = loc.astype(jnp.float32)

        if key_attend_mask is not None:
            km = key_attend_mask[:, None, None, :]
            attn = jnp.where(km, attn, NEG_INF)
            if self.spatial_attn_fusion in ("mul", "cond"):
                loc = jnp.where(km, loc, 0.0)
            else:
                loc = jnp.where(km, loc, NEG_INF)

        if self.spatial_attn_fusion == "add":
            fused = (jax.nn.softmax(attn, -1) + jax.nn.softmax(loc, -1)) / 2
        else:
            if self.spatial_attn_fusion in ("mul", "cond"):
                fused = jnp.log(jnp.clip(loc, 1e-6, None)) + attn
            else:
                fused = loc + attn
            fused = jax.nn.softmax(fused, -1)

        fused = nn.Dropout(self.dropout, deterministic=deterministic)(fused)
        out = jnp.einsum("bhqt,bhtv->bhqv", fused.astype(vp.dtype), vp)
        out = nn.Dense(self.d_model, kernel_init=dense_init, name="fc")(_merge_heads(out))
        return out, fused


class SpatialSelfAttentionLayer(nn.Module):
    """Residual wrapper around MultiHeadAttentionSpatial
    (ref query_encoder.py:402-483)."""
    d_model: int
    n_head: int
    dropout: float = 0.0
    normalize_before: bool = False
    spatial_dim: int = 5
    spatial_attn_fusion: str = "mul"

    @nn.compact
    def __call__(self, tgt, pairwise_locs, key_attend_mask=None,
                 query_pos=None, deterministic: bool = True):
        attn = MultiHeadAttentionSpatial(
            self.d_model, self.n_head, dropout=self.dropout,
            spatial_dim=self.spatial_dim,
            spatial_attn_fusion=self.spatial_attn_fusion)
        ln = nn.LayerNorm()
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        src = ln(tgt) if self.normalize_before else tgt
        qk = src if query_pos is None else src + query_pos
        out, _ = attn(qk, qk, src, pairwise_locs,
                      key_attend_mask=key_attend_mask,
                      deterministic=deterministic)
        tgt = tgt + drop(out)
        if not self.normalize_before:
            tgt = ln(tgt)
        return tgt


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of padded (B, N, C) voxel features.

    Replaces MinkowskiBatchNorm; under a sharded data axis the statistics are
    global (sync-BN semantics — the batch is one logical array under jit).
    Momentum follows torch: new = (1-m)*running + m*batch (ref bn_momentum
    0.02, configs/instseg_sceneverse.yaml:109).
    """
    momentum: float = 0.02
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, valid, use_running_average: bool = False):
        c = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = valid[..., None].astype(jnp.float32)
            cnt = jnp.maximum(w.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * w).sum(axis=reduce_axes) / cnt
            var = (jnp.square(xf - mean) * w).sum(axis=reduce_axes) / cnt
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        # float-multiply mask, NOT jnp.where: the select blocks XLA from
        # fusing the BN epilogue into the conv and costs ~+130 ms per
        # residual block at L1 shapes on v5e (chip A/B in PERF.md round-5,
        # tools/bench_bnrelu_fusion.py: where 315 / multiply 149 / unmasked
        # 120-181 ms/block).  Identical semantics for finite y; pad-row
        # activations are bounded (convs emit 0 on pad rows — no taps —
        # so y there is just the BN bias), never inf/nan.
        y = y * valid[..., None].astype(y.dtype)
        return y.astype(x.dtype)
