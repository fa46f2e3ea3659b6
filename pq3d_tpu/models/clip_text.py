"""CLIP text tower (flax linen) — native implementation.

Replaces the reference's frozen HF ``CLIPTextModelWithProjection``
(openai/clip-vit-large-patch14 text config: vocab 49408, width 768,
12 heads, 12 layers, quick-gelu, 77 max positions) used at
reference modules/language/clip.py:12-42.  The reference projects every
token with text_projection and L2-normalizes, then applies a trainable
MLP/attention projection; we reproduce that exactly.

Weight import from HF checkpoints is supported via
:mod:`pq3d_tpu.utils.hf_import` (zero-egress images train from scratch).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models.layers import MLPHead, SelfAttentionLayer, masked_softmax
from pq3d_tpu.registry import LANGUAGE_REGISTRY


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: Optional[jnp.dtype] = None  # bf16 = frozen-tower inference mode

    @nn.compact
    def __call__(self, x, attend_mask):
        h = self.heads
        d = self.width // h
        q = nn.Dense(self.width, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.width, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.width, dtype=self.dtype, name="v_proj")(x)
        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, d).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q / jnp.sqrt(d), k)
        L = x.shape[1]
        causal = jnp.tril(jnp.ones((L, L), bool))
        mask = causal[None, None] & attend_mask[:, None, None, :]
        probs = masked_softmax(logits, mask)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class CLIPBlock(nn.Module):
    width: int
    heads: int
    intermediate: int = 0   # 0 -> 4x width
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attend_mask):
        x = x + CLIPAttention(self.width, self.heads, self.dtype,
                              name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x), attend_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.intermediate or self.width * 4, dtype=self.dtype,
                     name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextTower(nn.Module):
    """Causal transformer + final LN + text projection."""
    vocab_size: int = 49408
    width: int = 768
    heads: int = 12
    layers: int = 12
    max_positions: int = 77
    projection_dim: int = 768
    intermediate: int = 0   # 0 -> 4x width
    # 'bfloat16' runs the (frozen) tower's matmuls in bf16 — the unified
    # inference headline spends ~5 ms/batch on this tower in f32 (PERF.md);
    # the trainable projection stays f32 either way
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, ids: jnp.ndarray, attend_mask: jnp.ndarray):
        cdt = (jnp.bfloat16 if self.compute_dtype == "bfloat16" else None)
        emb = nn.Embed(self.vocab_size, self.width, name="token_embedding")(ids)
        L = ids.shape[1]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.max_positions, self.width))
        x = emb + pos[:L]
        for i in range(self.layers):
            x = CLIPBlock(self.width, self.heads, self.intermediate, cdt,
                          name=f"block{i}")(x, attend_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.projection_dim))
        return x @ proj


@LANGUAGE_REGISTRY.register(name="CLIPLanguageEncoder")
class CLIPTextEncoder(nn.Module):
    """Frozen tower -> per-token projection -> L2 norm -> trainable
    projection (ref modules/language/clip.py:28-42)."""
    output_dim: int = 768
    freeze_backbone: bool = True
    use_projection: bool = True
    projection_type: str = "mlp"
    num_projection_layers: int = 1
    dropout: float = 0.1
    vocab_size: int = 49408
    width: int = 768
    tower_heads: int = 12
    tower_layers: int = 12
    compute_dtype: str = "float32"   # 'bfloat16' = fast frozen-tower mode

    @nn.compact
    def __call__(self, ids: jnp.ndarray, attend_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        txt = CLIPTextTower(vocab_size=self.vocab_size, width=self.width,
                            heads=self.tower_heads, layers=self.tower_layers,
                            projection_dim=self.width,
                            compute_dtype=self.compute_dtype,
                            name="tower")(ids, attend_mask)
        txt = txt.astype(jnp.float32)
        if self.freeze_backbone:
            txt = jax.lax.stop_gradient(txt)
        txt = txt / jnp.maximum(
            jnp.linalg.norm(txt, axis=-1, keepdims=True), 1e-8)
        if self.use_projection:
            if self.projection_type == "mlp":
                txt = MLPHead(self.output_dim, self.output_dim,
                              dropout=self.dropout, name="projection")(
                    txt, deterministic)
            elif self.projection_type == "attention":
                for i in range(self.num_projection_layers):
                    txt = SelfAttentionLayer(
                        self.width, 12, dropout=self.dropout,
                        name=f"projection{i}")(
                        txt, attend_mask=attend_mask,
                        deterministic=deterministic)
            else:
                raise NotImplementedError(self.projection_type)
        return txt


@LANGUAGE_REGISTRY.register(name="BERTLanguageEncoder")
class BERTTextEncoder(nn.Module):
    """Truncated 4-layer BERT-style encoder
    (ref modules/language/bert.py:8-26)."""
    hidden_size: int = 768
    num_layers: int = 4
    num_heads: int = 12
    vocab_size: int = 30522
    max_positions: int = 512

    @nn.compact
    def __call__(self, ids: jnp.ndarray, attend_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.hidden_size,
                       name="word_embeddings")(ids)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (self.max_positions, self.hidden_size))
        x = nn.LayerNorm(epsilon=1e-12)(emb + pos[:ids.shape[1]])
        for i in range(self.num_layers):
            x = SelfAttentionLayer(self.hidden_size, self.num_heads,
                                   name=f"layer{i}")(
                x, attend_mask=attend_mask, deterministic=deterministic)
            h = nn.Dense(self.hidden_size * 4, name=f"ffn{i}_1")(x)
            h = jax.nn.gelu(h)
            h = nn.Dense(self.hidden_size, name=f"ffn{i}_2")(h)
            x = nn.LayerNorm(epsilon=1e-12, name=f"ffn{i}_ln")(x + h)
        return x
