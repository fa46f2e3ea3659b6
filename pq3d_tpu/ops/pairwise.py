"""Pairwise spatial relation features between object/query centers.

JAX port of the reference's 5-dim spatial features consumed by the spatial
self-attention (reference: modules/utils.py:38-87 ``calc_pairwise_locs``):
[normalized distance, dz/dist, dist2d/dist, dy/dist2d, dx/dist2d].
"""
from __future__ import annotations

import jax.numpy as jnp


def calc_pairwise_locs(centers: jnp.ndarray, whls: jnp.ndarray | None = None,
                       eps: float = 1e-10, pairwise_rel_type: str = "center",
                       spatial_dist_norm: bool = True,
                       spatial_dim: int = 5) -> jnp.ndarray:
    """(B, L, 3) -> (B, L, L, spatial_dim) pairwise spatial features."""
    if pairwise_rel_type == "mlp":
        locs = jnp.concatenate([centers, whls], axis=-1)
        a = jnp.broadcast_to(locs[:, :, None, :], locs.shape[:2] + locs.shape[1:2] + locs.shape[-1:])
        b = jnp.broadcast_to(locs[:, None, :, :], a.shape)
        return jnp.concatenate([a, b], axis=-1)

    rel = centers[:, :, None, :] - centers[:, None, :, :]        # (B,L,L,3)
    dist = jnp.sqrt(jnp.sum(rel ** 2, axis=-1) + eps)            # (B,L,L)
    if spatial_dist_norm:
        max_dist = jnp.max(dist.reshape(dist.shape[0], -1), axis=1)
        norm_dist = dist / max_dist[:, None, None]
    else:
        norm_dist = dist

    if spatial_dim == 1:
        return norm_dist[..., None]

    dist2d = jnp.sqrt(jnp.sum(rel[..., :2] ** 2, axis=-1) + eps)
    if pairwise_rel_type == "center":
        feats = jnp.stack([
            norm_dist,
            rel[..., 2] / dist,
            dist2d / dist,
            rel[..., 1] / dist2d,
            rel[..., 0] / dist2d,
        ], axis=-1)
    elif pairwise_rel_type == "vertical_bottom":
        bottom = centers.at[..., 2].add(-whls[..., 2]) if whls is not None else centers
        brel = bottom[:, :, None, :] - bottom[:, None, :, :]
        bdist = jnp.sqrt(jnp.sum(brel ** 2, axis=-1) + eps)
        bdist2d = jnp.sqrt(jnp.sum(brel[..., :2] ** 2, axis=-1) + eps)
        feats = jnp.stack([
            norm_dist,
            brel[..., 2] / bdist,
            bdist2d / bdist,
            rel[..., 1] / dist2d,
            rel[..., 0] / dist2d,
        ], axis=-1)
    else:
        raise NotImplementedError(pairwise_rel_type)

    if spatial_dim == 4:
        feats = feats[..., 1:]
    return feats
