"""Import HuggingFace torch checkpoints into native flax modules.

The reference loads pretrained HF torch weights for CLIP text
(openai/clip-vit-large-patch14) and T5 (t5-small) (reference:
modules/language/clip.py:16, modules/heads/generation_head.py:11).  We ship
native flax implementations; this module maps HF ``state_dict`` tensors onto
their parameter trees so real checkpoints can be imported when available
(and so parity tests can validate the native code against torch).

All inputs are ``dict[str, np.ndarray]`` (call ``.numpy()`` on torch tensors
first or pass a torch state_dict — tensors are converted on the fly).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def import_t5_decoder(sd: Dict[str, Any], num_layers: int) -> Dict:
    """HF T5ForConditionalGeneration state_dict -> params for
    :class:`pq3d_tpu.models.t5.T5Decoder` (decoder side + shared embedding)."""
    p: Dict[str, Any] = {}
    p["embed"] = {"embedding": _np(sd["shared.weight"])}
    for i in range(num_layers):
        base = f"decoder.block.{i}.layer"
        blk: Dict[str, Any] = {}
        blk["self_attn"] = {
            "q": {"kernel": _np(sd[f"{base}.0.SelfAttention.q.weight"]).T},
            "k": {"kernel": _np(sd[f"{base}.0.SelfAttention.k.weight"]).T},
            "v": {"kernel": _np(sd[f"{base}.0.SelfAttention.v.weight"]).T},
            "o": {"kernel": _np(sd[f"{base}.0.SelfAttention.o.weight"]).T},
        }
        if i == 0:
            blk["self_attn"]["relative_attention_bias"] = {
                "embedding": _np(
                    sd[f"{base}.0.SelfAttention.relative_attention_bias.weight"])}
        blk["ln_self"] = {"weight": _np(sd[f"{base}.0.layer_norm.weight"])}
        blk["cross_attn"] = {
            "q": {"kernel": _np(sd[f"{base}.1.EncDecAttention.q.weight"]).T},
            "k": {"kernel": _np(sd[f"{base}.1.EncDecAttention.k.weight"]).T},
            "v": {"kernel": _np(sd[f"{base}.1.EncDecAttention.v.weight"]).T},
            "o": {"kernel": _np(sd[f"{base}.1.EncDecAttention.o.weight"]).T},
        }
        blk["ln_cross"] = {"weight": _np(sd[f"{base}.1.layer_norm.weight"])}
        blk["wi"] = {"kernel": _np(sd[f"{base}.2.DenseReluDense.wi.weight"]).T}
        blk["wo"] = {"kernel": _np(sd[f"{base}.2.DenseReluDense.wo.weight"]).T}
        blk["ln_ff"] = {"weight": _np(sd[f"{base}.2.layer_norm.weight"])}
        p[f"block{i}"] = blk
    p["ln_final"] = {"weight": _np(sd["decoder.final_layer_norm.weight"])}
    return p


def import_clip_text_tower(sd: Dict[str, Any], num_layers: int) -> Dict:
    """HF CLIPTextModelWithProjection state_dict -> params for
    :class:`pq3d_tpu.models.clip_text.CLIPTextTower`."""
    def lin(prefix):
        return {"kernel": _np(sd[f"{prefix}.weight"]).T,
                "bias": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"])}

    p: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(
            sd["text_model.embeddings.token_embedding.weight"])},
        "positional_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]),
        "ln_final": ln("text_model.final_layer_norm"),
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    for i in range(num_layers):
        base = f"text_model.encoder.layers.{i}"
        p[f"block{i}"] = {
            "attn": {
                "q_proj": lin(f"{base}.self_attn.q_proj"),
                "k_proj": lin(f"{base}.self_attn.k_proj"),
                "v_proj": lin(f"{base}.self_attn.v_proj"),
                "out_proj": lin(f"{base}.self_attn.out_proj"),
            },
            "ln_1": ln(f"{base}.layer_norm1"),
            "ln_2": ln(f"{base}.layer_norm2"),
            "fc1": lin(f"{base}.mlp.fc1"),
            "fc2": lin(f"{base}.mlp.fc2"),
        }
    return p
