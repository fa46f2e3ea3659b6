"""T5 generation head: query embeddings -> caption/answer tokens.

Re-design of the reference's T5 head (reference:
modules/heads/generation_head.py:8-30): projected query embeddings act as
the encoder states; teacher-forced logits in training, greedy decode at
eval.  The greedy loop is a fixed-length ``lax.scan`` (static shapes; 50
tokens over <=120 queries is tiny).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models.layers import dense_init
from pq3d_tpu.models.t5 import T5Decoder, T5_PAD_ID, T5_EOS_ID
from pq3d_tpu.registry import HEADS_REGISTRY


@HEADS_REGISTRY.register(name="T5")
class T5GenerationHead(nn.Module):
    cfg: "GenerationHeadCfg" = None  # pq3d_tpu.models.query3d.GenerationHeadCfg

    @nn.compact
    def __call__(self, query_embeds: jnp.ndarray, query_valid: jnp.ndarray,
                 labels: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        enc = query_embeds
        if c.use_projection:
            enc = nn.Dense(c.d_model, kernel_init=dense_init,
                           name="input_proj")(enc)
            enc = nn.LayerNorm()(enc)
        decoder = T5Decoder(vocab_size=c.vocab_size, d_model=c.d_model,
                            d_kv=c.d_kv, d_ff=c.d_ff,
                            num_layers=c.num_layers, heads=c.num_heads,
                            name="decoder")

        if labels is not None:
            # teacher forcing: shift-right with the decoder start (=pad) token
            dec_in = jnp.pad(labels[:, :-1], ((0, 0), (1, 0)),
                             constant_values=T5_PAD_ID)
            dec_valid = jnp.pad(labels[:, :-1] != T5_PAD_ID, ((0, 0), (1, 0)),
                                constant_values=True)
            return decoder(dec_in, enc, query_valid, dec_valid,
                           deterministic=deterministic)

        # KV-cached greedy decode, fixed max_new_tokens (see t5.py:decode)
        b = enc.shape[0]
        L = c.max_new_tokens

        if self.is_initializing():
            # create decoder params via the full forward (the cached decode
            # path reuses exactly these params)
            decoder(jnp.zeros((b, L + 1), jnp.int32), enc, query_valid,
                    None, deterministic=True)
            return jnp.zeros((b, L), jnp.int32)

        if c.two_phase:
            # serving lever: return the projected encoder states and let the
            # caller run decode_states() as its OWN jit.  Fused into the big
            # jit, XLA schedules the bf16 decode loop ~2.5x slower than the
            # identical standalone decode (chip A/B, PERF.md round-3 "bf16
            # inversion"; an optimization_barrier did NOT restore it) — the
            # split does, and costs no extra host round-trip since the
            # states stay on device between the two dispatches.
            return enc

        return decoder.decode(enc, query_valid, L, early_exit=c.early_exit)


def decode_states(variables, enc: jnp.ndarray, enc_mask: jnp.ndarray,
                  cfg) -> jnp.ndarray:
    """Phase-2 greedy decode over states returned by a ``two_phase`` head.

    ``variables`` is the FULL model variable tree; the decoder params are
    extracted from ``params/generation_head/decoder``.  Jit this separately
    from the model forward (see GenerationHeadCfg.two_phase)."""
    dec = T5Decoder(vocab_size=cfg.vocab_size, d_model=cfg.d_model,
                    d_kv=cfg.d_kv, d_ff=cfg.d_ff,
                    num_layers=cfg.num_layers, heads=cfg.num_heads)
    params = variables["params"]["generation_head"]["decoder"]
    return dec.apply({"params": params}, enc, enc_mask,
                     cfg.max_new_tokens, early_exit=cfg.early_exit,
                     method=T5Decoder.decode)
