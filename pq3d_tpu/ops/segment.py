"""Segment (scatter) pooling — TPU-native replacement for torch_scatter.

The reference pools voxel features onto over-segmentation segments with
``torch_scatter.scatter_mean`` (reference: modules/vision/pcd_mask3d_encoder.py:122,149,
data/datasets/sceneverse_instseg.py:183-186).  XLA has native unsorted segment
reductions, so no custom kernel is needed (SURVEY.md §2.8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Sum rows of ``x`` into ``num_segments`` buckets.

    ``seg_ids`` >= num_segments (e.g. padded voxels mapped to a trash bucket)
    are dropped.
    """
    return jax.ops.segment_sum(x, seg_ids, num_segments=num_segments + 1,
                               indices_are_sorted=False)[:num_segments]


def segment_mean(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Mean-pool rows of ``x`` per segment (empty segments -> 0)."""
    sums = segment_sum(x, seg_ids, num_segments)
    cnt = segment_sum(jnp.ones((x.shape[0], 1), dtype=x.dtype), seg_ids, num_segments)
    return sums / jnp.maximum(cnt, 1)


def segment_max(x: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
                fill_value: float = 0.0) -> jnp.ndarray:
    out = jax.ops.segment_max(x, seg_ids, num_segments=num_segments + 1)[:num_segments]
    # segment_max yields -inf for empty segments; replace for stability
    return jnp.where(jnp.isfinite(out), out, fill_value)
