"""Legacy 3D-VisTA-style object encoders (registered for parity).

Re-designs of the reference's registered-but-unused encoders (reference:
modules/vision/pcd_tokenize_encoder.py PointTokenizeEncoder,
modules/vision/pcd_pointnet_encoder.py PcdObjEncoder): PointNet++ per-object
features with an optional spatial-transformer context stage and semantic
(GloVe/CLIP label) mixing.  None of the shipped reference configs use these;
they are provided so reference users find the same registry entries.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models.layers import SpatialSelfAttentionLayer, dense_init
from pq3d_tpu.models.pointnet import PointNetPP
from pq3d_tpu.ops.pairwise import calc_pairwise_locs
from pq3d_tpu.registry import VISION_REGISTRY


@VISION_REGISTRY.register(name="PcdObjEncoder")
class PcdObjEncoder(nn.Module):
    """Per-object PointNet++ features, nothing else
    (ref pcd_pointnet_encoder.py)."""
    hidden_size: int = 768
    dropout: float = 0.1

    @nn.compact
    def __call__(self, obj_pcds: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        b, o = obj_pcds.shape[:2]
        pts = obj_pcds.reshape((b * o,) + obj_pcds.shape[2:])
        feats = PointNetPP(name="backbone")(pts, deterministic=deterministic)
        feats = feats.reshape(b, o, -1)
        if feats.shape[-1] != self.hidden_size:
            feats = nn.Dense(self.hidden_size, kernel_init=dense_init)(feats)
        return nn.Dropout(self.dropout, deterministic=deterministic)(feats)


@VISION_REGISTRY.register(name="PointTokenizeEncoder")
class PointTokenizeEncoder(nn.Module):
    """PointNet++ tokens + spatial-transformer context layers
    (ref pcd_tokenize_encoder.py): per-object features refined by
    pairwise-location-aware self-attention across the scene's objects."""
    hidden_size: int = 768
    num_layers: int = 2
    num_heads: int = 12
    dropout: float = 0.1
    spatial_dim: int = 5

    @nn.compact
    def __call__(self, obj_pcds: jnp.ndarray, obj_locs: jnp.ndarray,
                 obj_valid: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        b, o = obj_pcds.shape[:2]
        pts = obj_pcds.reshape((b * o,) + obj_pcds.shape[2:])
        feats = PointNetPP(name="backbone")(pts, deterministic=deterministic)
        feats = feats.reshape(b, o, -1)
        if feats.shape[-1] != self.hidden_size:
            feats = nn.Dense(self.hidden_size, kernel_init=dense_init)(feats)
        pairwise = calc_pairwise_locs(obj_locs[..., :3],
                                      spatial_dim=self.spatial_dim)
        for i in range(self.num_layers):
            feats = SpatialSelfAttentionLayer(
                self.hidden_size, self.num_heads, dropout=self.dropout,
                spatial_dim=self.spatial_dim, name=f"spatial_layer{i}")(
                feats, pairwise, key_attend_mask=obj_valid,
                deterministic=deterministic)
        return feats
