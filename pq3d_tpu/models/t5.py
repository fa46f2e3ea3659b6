"""T5 decoder stack (flax linen) — native implementation.

The reference's generation head feeds projected query embeddings straight in
as ``encoder_outputs`` (reference: modules/heads/generation_head.py:20-30),
so only the **decoder** of T5 runs: token embedding, pre-RMSNorm blocks of
[self-attn with relative position bias, cross-attn over the queries, ReLU
FFN], final RMSNorm, and tied-embedding logits scaled by d_model^-1/2
(t5-small config: d_model 512, d_kv 64, 8 heads, 6 layers, vocab 32128).

Greedy decoding runs as a fixed-length ``lax.scan`` with a causal mask —
static shapes, no KV-cache needed at 50-token captions.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models.layers import masked_softmax

T5_PAD_ID = 0          # also the decoder start token
T5_EOS_ID = 1


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


def relative_position_bucket(rel_pos: jnp.ndarray, num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """T5 causal relative position bucketing (decoder: no bidirectional
    split; negative distances only)."""
    rp = -jnp.minimum(rel_pos, 0)   # distance back in time, >= 0
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    log_ratio = jnp.log(jnp.maximum(rp, 1).astype(jnp.float32) / max_exact)
    log_denom = jnp.log(max_distance / max_exact)
    large = max_exact + (log_ratio / log_denom * (num_buckets - max_exact)
                         ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return jnp.where(is_small, rp, large)


class T5Attention(nn.Module):
    d_model: int
    d_kv: int
    heads: int
    has_rel_bias: bool = False
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, x, kv, mask, pos_bias: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        h, dk = self.heads, self.d_kv
        inner = h * dk

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, dk).transpose(0, 2, 1, 3)
        q = split(nn.Dense(inner, use_bias=False, name="q")(x))
        k = split(nn.Dense(inner, use_bias=False, name="k")(kv))
        v = split(nn.Dense(inner, use_bias=False, name="v")(kv))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)  # T5: no 1/sqrt(d) scale
        if self.has_rel_bias and pos_bias is None:
            ql, kl = x.shape[1], kv.shape[1]
            rel = (jnp.arange(kl)[None, :] - jnp.arange(ql)[:, None])
            bucket = relative_position_bucket(rel, self.num_buckets,
                                              self.max_distance)
            table = nn.Embed(self.num_buckets, h,
                             name="relative_attention_bias")(bucket)
            pos_bias = table.transpose(2, 0, 1)[None]  # (1, h, q, k)
        if pos_bias is not None:
            logits = logits + pos_bias
        probs = masked_softmax(logits, mask)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner)
        return nn.Dense(self.d_model, use_bias=False, name="o")(out), pos_bias


class T5DecoderBlock(nn.Module):
    d_model: int
    d_kv: int
    heads: int
    d_ff: int
    has_rel_bias: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, enc, self_mask, cross_mask, pos_bias,
                 deterministic=True):
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        normed = RMSNorm(name="ln_self")(x)
        h, pos_bias = T5Attention(self.d_model, self.d_kv, self.heads,
                                  has_rel_bias=self.has_rel_bias,
                                  name="self_attn")(
            normed, normed, self_mask, pos_bias)
        x = x + drop(h)
        h, _ = T5Attention(self.d_model, self.d_kv, self.heads,
                           name="cross_attn")(
            RMSNorm(name="ln_cross")(x), enc, cross_mask)
        x = x + drop(h)
        f = RMSNorm(name="ln_ff")(x)
        f = nn.Dense(self.d_ff, use_bias=False, name="wi")(f)
        f = jax.nn.relu(f)
        f = drop(f)
        f = nn.Dense(self.d_model, use_bias=False, name="wo")(f)
        return x + drop(f), pos_bias


class T5Decoder(nn.Module):
    """Decoder-only T5 over external encoder states."""
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, enc: jnp.ndarray,
                 enc_mask: jnp.ndarray,
                 dec_valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.d_model,
                       embedding_init=nn.initializers.normal(1.0),
                       name="embed")
        x = emb(tokens)
        L = tokens.shape[1]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        self_mask = causal
        if dec_valid is not None:
            self_mask = self_mask & dec_valid[:, None, None, :]
        cross_mask = enc_mask[:, None, None, :]
        pos_bias = None
        for i in range(self.num_layers):
            x, pos_bias = T5DecoderBlock(
                self.d_model, self.d_kv, self.heads, self.d_ff,
                has_rel_bias=(i == 0), dropout=self.dropout,
                name=f"block{i}")(x, enc, self_mask, cross_mask, pos_bias,
                                  deterministic)
        x = RMSNorm(name="ln_final")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        # tied embeddings, scaled (T5 tie_word_embeddings)
        logits = emb.attend(x * (self.d_model ** -0.5))
        return logits
