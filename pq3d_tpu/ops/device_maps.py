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
  * stride-2 downsampling: parent keys are NOT sorted for row-major child
    keys (only Morton order would keep them so — round-3 advisor finding),
    so each coarse level argsorts its parent keys, dedups by
    shifted-compare on the sorted keys, and numbers groups in ascending
    key order — exactly the host downsample_coords ordering;
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
        # Row-major child keys do NOT keep parent keys sorted (e.g. children
        # (0,2) < (1,0) have parents (0,1) > (0,0)) — only Morton codes
        # would.  Sort the parent keys explicitly; pads (_PAD_KEY) go last.
        # Group numbering then follows ascending coarse key — the exact
        # ordering the host's downsample_coords produces.
        order = jnp.argsort(pk)
        spk = pk[order]
        valid_s = spk != _PAD_KEY
        first_s = valid_s & jnp.concatenate(
            [jnp.ones((1,), bool), spk[1:] != spk[:-1]])
        rank_s = (jnp.cumsum(first_s) - 1).astype(jnp.int32)
        n_next = jnp.sum(first_s).astype(jnp.int32)
        # scatter ranks back to original row order
        parent = jnp.zeros(cap, jnp.int32).at[order].set(
            jnp.where(valid_s, rank_s, -1))
        # offset id within the 2^3 parent cell, kernel_offsets(2) order
        lsb = coords & 1
        poff = (lsb[:, 0] * 4 + lsb[:, 1] * 2 + lsb[:, 2]).astype(jnp.int32)
        out[f"parent_{lvl}"] = parent
        out[f"parent_off_{lvl}"] = jnp.where(valid, poff, 0)
        # compact the coarse coords in ascending-key order (overflow rows
        # route to the trash slot cap_next and are dropped — callers size
        # level_caps generously; n_{l+1} is clamped below)
        tgt = jnp.where(first_s & (rank_s < cap_next), rank_s, cap_next)
        coarse = jnp.zeros((cap_next + 1, 3), jnp.int32).at[tgt].set(
            coarse_all[order], mode="drop")[:cap_next]
        child = jnp.full((cap_next * 8,), -1, jnp.int32).at[
            jnp.where(valid & (parent >= 0) & (parent < cap_next),
                      parent * 8 + poff, cap_next * 8)].set(
            rows, mode="drop").reshape(cap_next, 8)
        out[f"child_{lvl}"] = child
        anc_next = jnp.where(ancestor[-1] >= 0,
                             parent[jnp.maximum(ancestor[-1], 0)], -1)
        ancestor.append(anc_next.astype(jnp.int32))
        coords = coarse
        n = jnp.minimum(n_next, cap_next)
        valid = jnp.arange(cap_next, dtype=jnp.int32) < n
    # pad rows are 0 at every level, matching the host's zero-initialized
    # ancestor table (build_hierarchy)
    valid0 = rows0 < n0
    out["ancestor"] = jnp.where(valid0[None, :], jnp.stack(ancestor), 0)
    return out


def bias_coords_16(coords: np.ndarray, align: int = 16) -> tuple:
    """Host helper: shift coords to a non-negative, ``align``-aligned origin.

    ``floor(c / 2^l) - base / 2^l == floor((c - base) / 2^l)`` exactly when
    ``base`` is a multiple of ``2^l`` — 16-alignment keeps every stride-2
    grouping (4 levels) and the 8^3 stem blocking identical to the host
    build on the original coords, so all INDEX arrays are unchanged
    (pinned by tests/test_device_maps.py).

    Swin window packs at level ``l`` additionally need ``base`` divisible
    by ``window * 2^l`` (window grouping ``(c - base/2^l) // window`` must
    equal ``c // window`` up to a constant): window 4 through level 4
    needs ``align=64`` (tests/test_device_flat_maps.py pins this).
    Returns ``(biased_coords int32, base int64)``.
    """
    base = np.floor_divide(coords.min(0).astype(np.int64), align) * align
    return (coords.astype(np.int64) - base).astype(np.int32), base


def swin_bias_align(swin_window: int, max_level: int = 4) -> int:
    """Bias alignment keeping hierarchy AND swin window grouping intact."""
    return max(16, int(swin_window) << max_level) if swin_window else 16


def build_device_stem_pack(coords0: jnp.ndarray, n0: jnp.ndarray,
                           cap0: int, nb_cap: int, block: int = 8
                           ) -> Dict[str, jnp.ndarray]:
    """Device twin of window_maps.build_window_pack (shift=0) for the
    dense-block stem conv: pack level-0 voxels into dense ``block^3``
    spatial blocks ON the accelerator.

    Args:
      coords0: (cap0, 3) int32, lexicographically sorted, non-negative.
      n0: () int32 true count.
      nb_cap: static pad for the occupied-block count.

    Returns ``vox_slot (cap0,)`` (-1 pad/overflow), ``cell_to_vox
    (nb_cap*block^3,)``, ``nbr_win (nb_cap, 27)``, ``n_win ()`` — matching
    the host pack bit-for-bit within the true region
    (tests/test_device_maps.py).
    """
    assert block & (block - 1) == 0, block
    shift = block.bit_length() - 1
    b3 = block ** 3
    c = coords0.astype(jnp.int32)
    rows = jnp.arange(cap0, dtype=jnp.int32)
    valid = rows < n0.astype(jnp.int32)
    bc = c >> shift
    bmax = jnp.max(jnp.where(valid[:, None], bc, 0), axis=0)
    dy = bmax[1] + 3
    dz = bmax[2] + 3
    keys = jnp.where(valid, _pack(bc, dy, dz), _PAD_KEY)
    # same argsort-dedup as the hierarchy levels: lexicographically sorted
    # voxels do NOT give sorted block keys (row-major carry)
    order = jnp.argsort(keys)
    sk = keys[order]
    valid_s = sk != _PAD_KEY
    first_s = valid_s & jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    rank_s = (jnp.cumsum(first_s) - 1).astype(jnp.int32)
    n_win = jnp.sum(first_s).astype(jnp.int32)
    win_of = jnp.full((cap0,), -1, jnp.int32).at[order].set(
        jnp.where(valid_s, rank_s, -1))
    local = c & (block - 1)
    cell = ((local[:, 0] * block + local[:, 1]) * block
            + local[:, 2]).astype(jnp.int32)
    ok = valid & (win_of >= 0) & (win_of < nb_cap)
    vox_slot = jnp.where(ok, win_of * b3 + cell, -1)
    cell_to_vox = jnp.full((nb_cap * b3 + 1,), -1, jnp.int32).at[
        jnp.where(ok, vox_slot, nb_cap * b3)].set(
        rows, mode="drop")[:nb_cap * b3]
    # compact the block coords in ascending-key order, then the 27-offset
    # halo map over them
    tgt = jnp.where(first_s & (rank_s < nb_cap), rank_s, nb_cap)
    wb = jnp.zeros((nb_cap + 1, 3), jnp.int32).at[tgt].set(
        bc[order], mode="drop")[:nb_cap]
    nw = jnp.minimum(n_win, nb_cap)
    valid_win = jnp.arange(nb_cap, dtype=jnp.int32) < nw
    wkeys = _level_keys(wb, valid_win, dy, dz)
    nbr_win = _neighbor_map(wb, wkeys, valid_win, nw,
                            kernel_maps.kernel_offsets(3), dy, dz)
    return {"vox_slot": vox_slot, "cell_to_vox": cell_to_vox,
            "nbr_win": nbr_win, "n_win": n_win}


def build_batch_maps(vox_coords: jnp.ndarray, n_voxels: jnp.ndarray,
                     voxel_feats: Optional[jnp.ndarray],
                     level_caps: Sequence[int],
                     conv0_kernel: int = 5,
                     stem_mode: str = "dense_block",
                     stem_blocks: Optional[int] = None,
                     stem_block: int = 8,
                     ztriple: bool = False) -> Dict[str, jnp.ndarray]:
    """Batched device-built ``maps`` dict for the sparse U-Net — jit-safe.

    The on-device counterpart of instseg_pipeline.collate's maps section:
    given only the biased voxel coords (B, cap0, 3) + true counts (B,), it
    builds every index array the backbone consumes — hierarchy levels, the
    dense-block stem pack (incl. the packed ``stem_dense`` feature blocks
    when ``voxel_feats`` is given) or the 125-tap ``nbr5_0`` map, and
    optionally the z-run conv plans for levels 1-3 — in the same (B, ...)
    shapes, so models/sparse_unet.flatten_maps and everything after it are
    untouched (parity pinned by tests/test_device_maps.py).

    Reference counterpart: ME's CPU coordinate manager builds these maps
    per batch on the host (mask3d/res16unet.py via MinkowskiEngine); here
    the accelerator builds its own maps from a ~0.8 MB coord array instead
    of receiving 60-100 MB of int32 maps over the wire.
    """
    caps = tuple(int(c) for c in level_caps)
    assert vox_coords.shape[-2] == caps[0], (vox_coords.shape, caps)
    build_nbr5 = stem_mode == "gather"
    maps = jax.vmap(lambda c, n: build_device_hierarchy(
        c, n, caps, conv0_kernel=conv0_kernel,
        build_nbr5=build_nbr5))(vox_coords, n_voxels)
    if stem_mode == "dense_block":
        nb_cap = stem_blocks
        if nb_cap is None:
            # same default the host pipeline derives (stem_pad_blocks):
            # real 0.02 m scans occupy ~N/30 8^3 blocks; /16 is ~2x headroom
            from pq3d_tpu.ops import window_maps
            nb_cap = window_maps.bucket(caps[0] // 16)
        b3 = stem_block ** 3
        pack = jax.vmap(lambda c, n: build_device_stem_pack(
            c, n, caps[0], nb_cap, block=stem_block))(vox_coords, n_voxels)
        maps["stem_nbrblk"] = pack["nbr_win"]
        maps["stem_slot"] = pack["vox_slot"]
        maps["stem_c2v"] = pack["cell_to_vox"]
        maps["stem_n_win"] = pack["n_win"]
        if voxel_feats is not None:
            b, cap0, cin = voxel_feats.shape
            slot = pack["vox_slot"]                    # (B, cap0), -1 pad
            tgt = jnp.where(slot >= 0, slot, nb_cap * b3)
            dense = jnp.zeros((b, nb_cap * b3 + 1, cin),
                              voxel_feats.dtype).at[
                jnp.arange(b)[:, None], tgt].set(
                voxel_feats, mode="drop")[:, :nb_cap * b3]
            maps["stem_dense"] = dense.reshape(b, nb_cap, b3 * cin)
    if ztriple:
        from pq3d_tpu.ops import pallas_zt
        for l in (1, 2, 3):                 # instseg_pipeline.ZTRIPLE_LEVELS
            zb, zc = jax.vmap(pallas_zt.device_zrun_plan)(maps[f"nbr3_{l}"])
            maps[f"zt{l}_base"] = zb
            maps[f"zt{l}_code"] = zc
    return maps


def hierarchy_to_host_format(dev: Dict[str, jnp.ndarray],
                             num_levels: int = 5) -> Dict[str, np.ndarray]:
    """Materialize the device dict as numpy (test/debug helper)."""
    return {k: np.asarray(v) for k, v in dev.items()}
