"""On-device sparse-hierarchy construction (serving transfer-killer).

The host pipeline builds kernel maps with C++/numpy and ships 60-100 MB of
int32 maps per batch to the device (PERF.md round-3 serving table: that
transfer+build dominates instseg serving).  This module builds the SAME
hierarchy ON the TPU from just the quantized voxel coordinates (~0.8 MB):

  * voxel keys: coords are ravel-key sorted (ops/voxelize.quantize), so a
    scene-extent-derived linear packing gives a sorted int32 key vector;
  * stride-1 neighbor maps: 27 (or 125 for the k=5 stem) offset queries
    answered by ``jnp.searchsorted`` (sort-merge method — no random HBM
    walks) + an equality check;
  * stride-2 downsampling: parent keys of a sorted level are sorted, so
    dedup is a shifted-compare + cumsum compaction — no search at all;
  * child/ancestor maps: static-shape scatters/gathers.

Outputs match ops/kernel_maps.build_hierarchy bit-for-bit for biased,
16-aligned-origin coords (pinned by tests/test_device_maps.py).  Everything
is jit-compatible with static level caps; callers vmap over the batch.

Reference counterpart: MinkowskiEngine coordinate-manager kernel maps
(reference modules/third_party/mask3d/res16unet.py via ME) — built there by
a CPU hash engine per batch; here the accelerator builds its own maps.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.ops import kernel_maps

_PAD_KEY = np.int32(np.iinfo(np.int32).max)


def _pack(coords: jnp.ndarray, dy: jnp.ndarray, dz: jnp.ndarray
          ) -> jnp.ndarray:
    """Lexicographic int32 key of non-negative (N, 3) coords.

    ``dy``/``dz`` are strict per-axis bounds + margin so +-1 offsets never
    carry between fields; the caller guarantees dx*dy*dz < 2^31.
    """
    c = coords.astype(jnp.int32)
    return (c[:, 0] * dy + c[:, 1]) * dz + c[:, 2]


def _level_keys(coords: jnp.ndarray, valid: jnp.ndarray,
                dy: jnp.ndarray, dz: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(valid, _pack(coords, dy, dz), _PAD_KEY)


def _neighbor_map(coords: jnp.ndarray, keys: jnp.ndarray,
                  valid: jnp.ndarray, n: jnp.ndarray,
                  offsets: np.ndarray, dy: jnp.ndarray, dz: jnp.ndarray
                  ) -> jnp.ndarray:
    """(N_cap, K) neighbor indices, -1 missing — rows >= n are all -1."""
    cols = []
    for off in offsets:
        q = _pack(coords + jnp.asarray(off, jnp.int32)[None, :], dy, dz)
        idx = jnp.searchsorted(keys, q, method="sort").astype(jnp.int32)
        idx_c = jnp.minimum(idx, keys.shape[0] - 1)
        hit = (keys[idx_c] == q) & (idx_c < n) & valid
        cols.append(jnp.where(hit, idx_c, -1))
    return jnp.stack(cols, axis=1)


def build_device_hierarchy(coords0: jnp.ndarray, n0: jnp.ndarray,
                           level_caps: Sequence[int],
                           conv0_kernel: int = 5,
                           build_nbr5: bool = True,
                           num_levels: int = 5) -> Dict[str, jnp.ndarray]:
    """Device twin of kernel_maps.build_hierarchy for ONE scene.

    Args:
      coords0: (cap0, 3) int32 quantized voxel coords, ravel-key sorted,
        non-negative with a 16-aligned origin (so stride-2 grouping matches
        the unbiased host maps at every level); padding rows arbitrary.
      n0: () int32 true voxel count.
      level_caps: static per-level pads (level_caps[0] == coords0.shape[0]).

    Returns a dict with the same per-level arrays the host pipeline ships:
      coords_l (cap_l, 3), valid_l (cap_l,), n_l (), nbr3_l (cap_l, 27),
      child_l (cap_{l+1}, 8), parent_l (cap_l,), parent_off_l (cap_l,),
      nbr5_0 (cap0, 125) [optional], ancestor (num_levels, cap0).
    """
    assert len(level_caps) >= num_levels
    cap0 = coords0.shape[0]
    assert cap0 == level_caps[0], (cap0, level_caps)
    off3 = kernel_maps.kernel_offsets(3)
    out: Dict[str, jnp.ndarray] = {}

    coords = coords0.astype(jnp.int32)
    n = n0.astype(jnp.int32)
    rows0 = jnp.arange(cap0, dtype=jnp.int32)
    valid = rows0 < n
    # field bounds from the finest level (+3 margin: +-1 conv offsets plus
    # one spare; coarser levels shrink, so one bound serves all levels)
    cmax = jnp.max(jnp.where(valid[:, None], coords, 0), axis=0)
    dy = cmax[1] + 3
    dz = cmax[2] + 3

    ancestor = [rows0]
    for lvl in range(num_levels):
        cap = level_caps[lvl]
        rows = jnp.arange(cap, dtype=jnp.int32)
        keys = _level_keys(coords, valid, dy, dz)
        out[f"coords_{lvl}"] = jnp.where(valid[:, None], coords, 0)
        out[f"valid_{lvl}"] = valid
        out[f"n_{lvl}"] = n
        out[f"nbr3_{lvl}"] = _neighbor_map(coords, keys, valid, n, off3,
                                           dy, dz)
        if lvl == 0 and build_nbr5:
            off5 = kernel_maps.kernel_offsets(conv0_kernel)
            out[f"nbr5_{lvl}"] = _neighbor_map(coords, keys, valid, n,
                                               off5, dy, dz)
        if lvl == num_levels - 1:
            break
        cap_next = level_caps[lvl + 1]
        coarse_all = coords >> 1
        pk = _level_keys(coarse_all, valid, dy, dz)
        first = valid & jnp.concatenate(
            [jnp.ones((1,), bool), pk[1:] != pk[:-1]])
        parent = jnp.where(valid, jnp.cumsum(first) - 1, -1).astype(jnp.int32)
        n_next = jnp.sum(first).astype(jnp.int32)
        # offset id within the 2^3 parent cell, kernel_offsets(2) order
        lsb = coords & 1
        poff = (lsb[:, 0] * 4 + lsb[:, 1] * 2 + lsb[:, 2]).astype(jnp.int32)
        out[f"parent_{lvl}"] = parent
        out[f"parent_off_{lvl}"] = jnp.where(valid, poff, 0)
        # compact the coarse coords (scatter first occurrences; drop on
        # overflow — callers check n_{l+1} <= cap host-side)
        tgt = jnp.where(first, jnp.minimum(parent, cap_next - 1), cap_next)
        coarse = jnp.zeros((cap_next + 1, 3), jnp.int32).at[tgt].set(
            coarse_all, mode="drop")[:cap_next]
        child = jnp.full((cap_next * 8,), -1, jnp.int32).at[
            jnp.where(valid & (parent < cap_next),
                      parent * 8 + poff, cap_next * 8)].set(
            rows, mode="drop").reshape(cap_next, 8)
        out[f"child_{lvl}"] = child
        anc_next = jnp.where(ancestor[-1] >= 0,
                             parent[jnp.maximum(ancestor[-1], 0)], -1)
        ancestor.append(anc_next.astype(jnp.int32))
        coords = coarse
        n = jnp.minimum(n_next, cap_next)
        valid = jnp.arange(cap_next, dtype=jnp.int32) < n
    out["ancestor"] = jnp.stack(ancestor)
    return out


def hierarchy_to_host_format(dev: Dict[str, jnp.ndarray],
                             num_levels: int = 5) -> Dict[str, np.ndarray]:
    """Materialize the device dict as numpy (test/debug helper)."""
    return {k: np.asarray(v) for k, v in dev.items()}
