"""Unified promptable query decoder (flax linen).

Re-design of the reference's QueryMaskEncoder / QueryEncoderLayer
(reference: modules/grounding/query_encoder.py:11-181): ``num_blocks`` x
``num_layers`` rounds of [mask prediction -> masked cross-attention over
memories -> (spatial) self-attention -> FFN].

Memories are a dict name -> (feat, attend_mask, pos) with True = attend.
The per-layer mask prediction (use_self_mask) turns the thresholded mask
logits into next-round cross-attention masks, Mask3D style.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models.layers import (CrossAttentionLayer, FFNLayer,
                                    SelfAttentionLayer,
                                    SpatialSelfAttentionLayer)
from pq3d_tpu.registry import GROUNDING_REGISTRY

Memory = Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]


class QueryEncoderLayer(nn.Module):
    """One decoder layer: per-memory CA + self-attn + FFN with 4 fusion
    structures (ref query_encoder.py:96-181)."""
    d_model: int
    n_head: int
    memories: Sequence[str]
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    prenorm: bool = False
    spatial_selfattn: bool = False
    structure: str = "mixed"
    memory_dropout: float = 0.0
    drop_memories_test: Sequence[str] = ()

    def setup(self):
        if self.spatial_selfattn:
            self.self_attn = SpatialSelfAttentionLayer(
                self.d_model, self.n_head, dropout=self.dropout,
                normalize_before=self.prenorm)
        else:
            self.self_attn = SelfAttentionLayer(
                self.d_model, self.n_head, dropout=self.dropout,
                normalize_before=self.prenorm)
        self.cross_attns = {
            m: CrossAttentionLayer(self.d_model, self.n_head,
                                   dropout=self.dropout,
                                   normalize_before=self.prenorm)
            for m in self.memories}
        self.ffn = FFNLayer(self.d_model, self.dim_feedforward,
                            dropout=self.dropout, activation=self.activation,
                            normalize_before=self.prenorm)
        if self.structure == "gate":
            self.gate_proj = nn.Dense(self.d_model)

    def _sequential_ca(self, query, names, inputs, query_pos, deterministic):
        for m in names:
            feat, mask, pos = inputs[m]
            query = self.cross_attns[m](query, feat, attend_mask=mask,
                                        query_pos=query_pos, pos=pos,
                                        deterministic=deterministic)
        return query

    def _parallel_ca(self, query, names, inputs, query_pos, train,
                     deterministic):
        updates = [self.cross_attns[m](query, inputs[m][0],
                                       attend_mask=inputs[m][1],
                                       query_pos=query_pos, pos=inputs[m][2],
                                       deterministic=deterministic)
                   for m in names]
        stacked = jnp.stack(updates, axis=1)  # (B, M, Q, D)
        if train and self.memory_dropout > 0.0:
            # per-sample memory dropout with >=1 survivor + renormalization
            # (ref query_encoder.py:144-153)
            rng = self.make_rng("dropout")
            keep = jax.random.uniform(
                rng, (query.shape[0], len(names))) > self.memory_dropout
            keep = jnp.logical_or(keep, keep.sum(1, keepdims=True) == 0)
            n_keep = keep.sum(axis=1).astype(stacked.dtype)
            w = keep[..., None, None].astype(stacked.dtype)
            return (stacked * w).sum(axis=1) / n_keep[:, None, None]
        return stacked.mean(axis=1)

    def __call__(self, query: jnp.ndarray, inputs: Dict[str, Memory],
                 pairwise_locs: Optional[jnp.ndarray] = None,
                 train: bool = False, deterministic: bool = True):
        _, query_valid, query_pos = inputs["query"]
        names = [m for m in self.memories
                 if train or m not in self.drop_memories_test]

        if self.structure == "sequential":
            query = self._sequential_ca(query, names, inputs, query_pos,
                                        deterministic)
        elif self.structure == "parallel":
            query = self._parallel_ca(query, names, inputs, query_pos, train,
                                      deterministic)
        elif self.structure == "mixed":
            query = self._parallel_ca(query, [m for m in names if m != "prompt"],
                                      inputs, query_pos, train, deterministic)
            query = self._sequential_ca(query, ["prompt"], inputs, query_pos,
                                        deterministic)
        elif self.structure == "gate":
            prompt = self._sequential_ca(query, ["prompt"], inputs, query_pos,
                                         deterministic)
            gate = jax.nn.sigmoid(self.gate_proj(prompt))
            update = self._parallel_ca(query,
                                       [m for m in self.memories if m != "prompt"],
                                       inputs, query_pos, train, deterministic)
            query = (1.0 - gate) * query + gate * update
        else:
            raise NotImplementedError(self.structure)

        if self.spatial_selfattn:
            query = self.self_attn(query, pairwise_locs,
                                   key_attend_mask=query_valid,
                                   query_pos=query_pos,
                                   deterministic=deterministic)
        else:
            query = self.self_attn(query, attend_mask=query_valid,
                                   query_pos=query_pos,
                                   deterministic=deterministic)
        return self.ffn(query, deterministic=deterministic)


@GROUNDING_REGISTRY.register(name="QueryMaskEncoder")
class QueryMaskEncoder(nn.Module):
    """Iterative mask-guided decoder (ref query_encoder.py:51-94).

    ``mask_head`` is a callable ``query -> (cls_logits, mask_logits,
    attend_mask)`` (bound with segment features by the caller).  Rounds are
    unrolled (num_blocks x num_layers is small and static).
    """
    hidden_size: int = 768
    num_attention_heads: int = 12
    num_layers: int = 4
    num_blocks: int = 1
    memories: Sequence[str] = ("voxel", "mv", "pc")
    structure: str = "parallel"
    spatial_selfattn: bool = True
    use_self_mask: bool = False
    memory_dropout: float = 0.0
    drop_memories_test: Sequence[str] = ()
    share_layer: bool = False

    @nn.compact
    def __call__(self, inputs: Dict[str, Memory],
                 pairwise_locs: Optional[jnp.ndarray] = None,
                 mask_head: Optional[Callable] = None,
                 train: bool = False, deterministic: bool = True):
        layers = [QueryEncoderLayer(
            self.hidden_size, self.num_attention_heads, tuple(self.memories),
            spatial_selfattn=self.spatial_selfattn, structure=self.structure,
            memory_dropout=self.memory_dropout,
            drop_memories_test=tuple(self.drop_memories_test),
            name=f"layer{i}") for i in range(self.num_layers)]

        predictions_class: List[jnp.ndarray] = []
        predictions_mask: List[jnp.ndarray] = []
        query = inputs["query"][0]
        voxel_feat = inputs.get("voxel", (None,))[0]
        inputs = dict(inputs)

        for _ in range(self.num_blocks):
            for i, layer in enumerate(layers):
                if mask_head is not None:
                    cls_logits, mask_logits, attend = mask_head(query)
                    if cls_logits is not None:
                        predictions_class.append(cls_logits)
                        predictions_mask.append(mask_logits)
                    if self.use_self_mask and attend is not None:
                        # unblock queries that can attend nowhere
                        # (ref query_encoder.py:83)
                        none_ok = ~attend.any(-1, keepdims=True)
                        attend = jnp.logical_or(attend, none_ok)
                        for m in self.memories:
                            if m in ("query", "prompt") or m not in inputs:
                                continue
                            feat, _, pos = inputs[m]
                            inputs[m] = (feat, attend, pos)
                if isinstance(voxel_feat, (list, tuple)):
                    feat, mask, pos = inputs["voxel"]
                    inputs["voxel"] = (voxel_feat[i], mask, pos)
                query = layer(query, inputs, pairwise_locs, train=train,
                              deterministic=deterministic)
        return query, predictions_class, predictions_mask


@GROUNDING_REGISTRY.register(name="QueryEncoder")
class QueryEncoder(nn.Module):
    """Non-mask variant with whole-memory sample dropout
    (ref query_encoder.py:11-49)."""
    hidden_size: int = 768
    num_attention_heads: int = 12
    num_layers: int = 4
    memories: Sequence[str] = ("mv", "pc", "prompt")
    structure: str = "sequential"
    spatial_selfattn: bool = False
    memory_dropout: float = 0.0
    drop_memories_test: Sequence[str] = ()

    @nn.compact
    def __call__(self, inputs: Dict[str, Memory],
                 pairwise_locs: Optional[jnp.ndarray] = None,
                 train: bool = False, deterministic: bool = True):
        inputs = dict(inputs)
        scene_memories = [m for m in self.memories if m != "prompt"]
        if (train and self.memory_dropout > 0) or \
           (not train and self.drop_memories_test):
            for m in scene_memories:
                feat, mask, pos = inputs[m]
                if train:
                    rng = self.make_rng("dropout")
                    drop = jax.random.uniform(rng, (feat.shape[0],)) < self.memory_dropout
                else:
                    drop = jnp.full((feat.shape[0],),
                                    m in self.drop_memories_test)
                feat = jnp.where(drop[:, None, None], 0.0, feat)
                pos = jnp.where(drop[:, None, None], 0.0, pos) if pos is not None else None
                inputs[m] = (feat, mask, pos)

        query = inputs["query"][0]
        voxel_feat = inputs.get("voxel", (None,))[0]
        for i in range(self.num_layers):
            layer = QueryEncoderLayer(
                self.hidden_size, self.num_attention_heads, tuple(self.memories),
                spatial_selfattn=self.spatial_selfattn, structure=self.structure,
                name=f"layer{i}")
            if isinstance(voxel_feat, (list, tuple)):
                feat, mask, pos = inputs["voxel"]
                inputs["voxel"] = (voxel_feat[i], mask, pos)
            query = layer(query, inputs, pairwise_locs, train=train,
                          deterministic=deterministic)
        return query, [], []
