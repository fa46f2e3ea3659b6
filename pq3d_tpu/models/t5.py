"""T5 decoder stack (flax linen) — native implementation.

The reference's generation head feeds projected query embeddings straight in
as ``encoder_outputs`` (reference: modules/heads/generation_head.py:20-30),
so only the **decoder** of T5 runs: token embedding, pre-RMSNorm blocks of
[self-attn with relative position bias, cross-attn over the queries, ReLU
FFN], final RMSNorm, and tied-embedding logits scaled by d_model^-1/2
(t5-small config: d_model 512, d_kv 64, 8 heads, 6 layers, vocab 32128).

Greedy decoding runs as a fixed-length ``lax.scan`` over a per-layer KV
cache: each step embeds ONE token, projects its K/V into the cache, and
attends over cached keys — the cross-attention K/V and the relative-position
bias table are computed once before the scan.  (The uncached path would
re-run the full prefix every step: ~L x redundant FLOPs at L=50.)

Setup-style modules (not nn.compact) so the teacher-forced ``__call__`` and
the cached ``decode`` share parameters; attribute names are chosen to keep
the param tree identical to the original compact layout (q/k/v/o, block{i},
embed) — checkpoint- and hf_import-compatible.
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

    def setup(self):
        inner = self.heads * self.d_kv
        self.q = nn.Dense(inner, use_bias=False)
        self.k = nn.Dense(inner, use_bias=False)
        self.v = nn.Dense(inner, use_bias=False)
        self.o = nn.Dense(self.d_model, use_bias=False)
        if self.has_rel_bias:
            self.relative_attention_bias = nn.Embed(self.num_buckets,
                                                    self.heads)

    def _split(self, t):
        return t.reshape(t.shape[0], t.shape[1], self.heads,
                         self.d_kv).transpose(0, 2, 1, 3)

    def pos_bias_table(self, qlen: int, klen: int) -> jnp.ndarray:
        """(1, h, qlen, klen) relative position bias."""
        rel = (jnp.arange(klen)[None, :] - jnp.arange(qlen)[:, None])
        bucket = relative_position_bucket(rel, self.num_buckets,
                                          self.max_distance)
        return self.relative_attention_bias(bucket).transpose(2, 0, 1)[None]

    def kv_proj(self, kv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project K/V once (cross-attention cache / self-cache fill)."""
        return self._split(self.k(kv)), self._split(self.v(kv))

    def _attend(self, q, k, v, mask, pos_bias):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)  # T5: no 1/sqrt(d)
        if pos_bias is not None:
            logits = logits + pos_bias
        probs = masked_softmax(logits, mask)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(
            out.shape[0], -1, self.heads * self.d_kv)
        return self.o(out)

    def __call__(self, x, kv, mask, pos_bias: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        q = self._split(self.q(x))
        k, v = self.kv_proj(kv)
        if self.has_rel_bias and pos_bias is None:
            pos_bias = self.pos_bias_table(x.shape[1], kv.shape[1])
        return self._attend(q, k, v, mask, pos_bias), pos_bias

    def step(self, x, k_cache, v_cache, mask, pos_bias_row):
        """One decode step against a fixed K/V cache.  x (B, 1, D);
        caches (B, h, L, d_kv); mask (..., 1, L); bias (1, h, 1, L)."""
        q = self._split(self.q(x))
        return self._attend(q, k_cache, v_cache, mask, pos_bias_row)

    def self_step(self, x, k_cache, v_cache, pos, mask, pos_bias_row):
        """Self-attention decode step: project this token's K/V into the
        cache at ``pos``, then attend.  Returns (out, k_cache, v_cache)."""
        k_new, v_new = self.kv_proj(x)
        # mixed-precision serving: promotion can leave the cache and the
        # step projection at different dtypes; the cache dtype wins
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.astype(k_cache.dtype), (0, 0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.astype(v_cache.dtype), (0, 0, pos, 0))
        out = self.step(x, k_cache, v_cache, mask, pos_bias_row)
        return out, k_cache, v_cache


class T5DecoderBlock(nn.Module):
    d_model: int
    d_kv: int
    heads: int
    d_ff: int
    has_rel_bias: bool = False
    dropout: float = 0.1

    def setup(self):
        self.ln_self = RMSNorm()
        self.self_attn = T5Attention(self.d_model, self.d_kv, self.heads,
                                     has_rel_bias=self.has_rel_bias)
        self.ln_cross = RMSNorm()
        self.cross_attn = T5Attention(self.d_model, self.d_kv, self.heads)
        self.ln_ff = RMSNorm()
        self.wi = nn.Dense(self.d_ff, use_bias=False)
        self.wo = nn.Dense(self.d_model, use_bias=False)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, enc, self_mask, cross_mask, pos_bias,
                 deterministic=True):
        def drop(t):
            return self.drop(t, deterministic=deterministic)
        normed = self.ln_self(x)
        h, pos_bias = self.self_attn(normed, normed, self_mask, pos_bias)
        x = x + drop(h)
        h, _ = self.cross_attn(self.ln_cross(x), enc, cross_mask)
        x = x + drop(h)
        f = self.ln_ff(x)
        f = self.wi(f)
        f = jax.nn.relu(f)
        f = drop(f)
        f = self.wo(f)
        return x + drop(f), pos_bias

    def decode_step(self, x, cache, pos, self_mask, cross_mask,
                    pos_bias_row):
        """Single-token step.  cache = dict(self_k, self_v, cross_k,
        cross_v); returns (x, updated cache)."""
        h, sk, sv = self.self_attn.self_step(
            self.ln_self(x), cache["self_k"], cache["self_v"], pos,
            self_mask, pos_bias_row)
        x = x + h
        h = self.cross_attn.step(self.ln_cross(x), cache["cross_k"],
                                 cache["cross_v"], cross_mask, None)
        x = x + h
        f = jax.nn.relu(self.wi(self.ln_ff(x)))
        x = x + self.wo(f)
        return x, {**cache, "self_k": sk, "self_v": sv}


class T5Decoder(nn.Module):
    """Decoder-only T5 over external encoder states."""
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    heads: int = 8
    dropout: float = 0.1

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model,
                              embedding_init=nn.initializers.normal(1.0))
        for i in range(self.num_layers):
            setattr(self, f"block{i}", T5DecoderBlock(
                self.d_model, self.d_kv, self.heads, self.d_ff,
                has_rel_bias=(i == 0), dropout=self.dropout))
        self.ln_final = RMSNorm()
        self.drop_final = nn.Dropout(self.dropout)

    def _blocks(self):
        return [getattr(self, f"block{i}") for i in range(self.num_layers)]

    def _logits(self, x):
        # tied embeddings, scaled (T5 tie_word_embeddings)
        return self.embed.attend(x * (self.d_model ** -0.5))

    def __call__(self, tokens: jnp.ndarray, enc: jnp.ndarray,
                 enc_mask: jnp.ndarray,
                 dec_valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = self.embed(tokens)
        L = tokens.shape[1]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        self_mask = causal
        if dec_valid is not None:
            self_mask = self_mask & dec_valid[:, None, None, :]
        cross_mask = enc_mask[:, None, None, :]
        pos_bias = None
        for block in self._blocks():
            x, pos_bias = block(x, enc, self_mask, cross_mask, pos_bias,
                                deterministic)
        x = self.ln_final(x)
        x = self.drop_final(x, deterministic=deterministic)
        return self._logits(x)

    def decode(self, enc: jnp.ndarray, enc_mask: jnp.ndarray,
               max_tokens: int, early_exit: bool = False) -> jnp.ndarray:
        """KV-cached greedy decode: (B, M, D) encoder states ->
        (B, max_tokens) token ids (EOS-frozen, start token stripped).

        ``early_exit=True`` swaps the fixed-length ``lax.scan`` for a
        ``lax.while_loop`` that stops once EVERY row has emitted EOS —
        token-exact with the scan (finished rows emit PAD either way)
        but skips the tail of the window; real QA answers run ~3-8
        tokens against a 50-token cap."""
        b = enc.shape[0]
        L1 = max_tokens + 1
        blocks = self._blocks()
        # cross K/V + full relative bias: computed ONCE
        caches = []
        for blk in blocks:
            ck, cv = blk.cross_attn.kv_proj(enc)
            # cache dtype follows the PROJECTED dtype (== param compute
            # dtype), not enc's — under a bf16 param cast enc may still be
            # f32 while projections run bf16.  (An f32-cache variant was
            # chip-A/B'd against the bf16 serving inversion and changed
            # nothing — the loop-scheduling fence in generation.py is the
            # actual fix; PERF.md round-3 "bf16 inversion".)
            caches.append({
                "self_k": jnp.zeros((b, self.heads, L1, self.d_kv),
                                    ck.dtype),
                "self_v": jnp.zeros((b, self.heads, L1, self.d_kv),
                                    ck.dtype),
                "cross_k": ck, "cross_v": cv,
            })
        bias_full = blocks[0].self_attn.pos_bias_table(L1, L1)  # (1,h,L1,L1)
        cross_mask = enc_mask[:, None, None, :]
        key_iota = jnp.arange(L1)[None, None, None, :]

        def step(carry, t):
            cur, finished, caches = carry
            x = self.embed(cur[:, None])                     # (B, 1, D)
            self_mask = key_iota <= t                        # causal window
            bias_row = jax.lax.dynamic_slice(
                bias_full, (0, 0, t, 0),
                (1, bias_full.shape[1], 1, L1))
            new_caches = []
            for blk, cache in zip(blocks, caches):
                x, cache = blk.decode_step(x, cache, t, self_mask,
                                           cross_mask, bias_row)
                new_caches.append(cache)
            x = self.ln_final(x)
            logits = self._logits(x)[:, 0]                   # (B, V)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(finished, T5_PAD_ID, nxt)
            finished = finished | (nxt == T5_EOS_ID)
            return (nxt, finished, new_caches), nxt

        cur0 = jnp.full((b,), T5_PAD_ID, jnp.int32)          # decoder start
        fin0 = jnp.zeros((b,), bool)
        if not early_exit:
            _, out = jax.lax.scan(step, (cur0, fin0, caches),
                                  jnp.arange(max_tokens))
            return out.T                                      # (B, max_tokens)

        out0 = jnp.full((b, max_tokens), T5_PAD_ID, jnp.int32)

        def cond(state):
            t, _, finished, _, _ = state
            return (t < max_tokens) & ~jnp.all(finished)

        def body(state):
            t, cur, finished, caches, out = state
            (nxt, finished, caches), _ = step((cur, finished, caches), t)
            out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, t))
            return (t + 1, nxt, finished, caches, out)

        state = (jnp.asarray(0, jnp.int32), cur0, fin0, caches, out0)
        return jax.lax.while_loop(cond, body, state)[-1]
