"""On-device FLAT kernel-map construction (serving transfer-killer, round 5).

Round 4 shipped device-built maps for the rectangular layout only
(ops/device_maps.py), while the chip-fastest instseg path is the FLAT
swin layout (flat_swin_bf16, PERF.md round-4: 36.7 vs 11.2 scenes/s) —
so serving had to choose between the transfer win and the compute win
(VERDICT r04 weak #4).  This module composes them: it builds the flat
maps dict of ``instseg_pipeline.collate_flat`` ON the accelerator from
just the concatenated voxel coords + per-scene counts.

Design: the flat layout is scene-major and each scene's coords arrive
ravel-key sorted (ops/voxelize.quantize), so a **scene-augmented key**
``scene * K + pack(coords)`` (uint32; K = field volume) makes the whole
flat vector globally sorted.  Then:

  * stride-1 neighbor maps: one ``jnp.searchsorted`` per conv offset over
    the flat keys — results are flat row indices directly (no per-scene
    offsetting step at all);
  * stride-2 downsampling / window packs: one argsort-dedup over the flat
    vector; ascending (scene, key) group numbering IS the host's
    "per-scene ascending key, concatenated by scene" numbering, so global
    ranks equal the host's ``local_rank + starts[scene]`` without ever
    materializing per-scene offsets.

All output shapes are static, taken from a ``caps`` dict with the same
keys ``collate_flat`` records in ``_meta['flat_dims']`` (``tot_l``,
``rect_l``, ``win{l}s{j}_nw``, ``stem_nb``) — the serving shape lock.
Outputs match ``collate_flat``'s maps bit-for-bit (pinned by
tests/test_device_flat_maps.py).

uint32 key-space contract: ``B * dx*dy*dz < 2**32 - dx*dy*dz`` where
``d*`` are the biased level-0 coord bounds (+3 margin).  At 0.02 m voxels
this admits ~20 m scene extents at B=4; the host collate checks and warns
(instseg_pipeline.collate_flat_device).

Reference counterpart: MinkowskiEngine's CPU coordinate manager
(reference modules/third_party/mask3d/res16unet.py via ME) builds all
kernel maps on host per batch; here the accelerator builds its own from
a ~0.5 MB coord array.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.ops import kernel_maps

_PAD = jnp.uint32(0xFFFFFFFF)


def _aug_key(coords: jnp.ndarray, scene: jnp.ndarray, valid: jnp.ndarray,
             dims: jnp.ndarray) -> jnp.ndarray:
    """Scene-augmented uint32 lexicographic key of (N, 3) int32 coords.

    ``dims = (dx, dy, dz)`` strict per-axis bounds (+margin) of the
    NON-NEGATIVE valid coords; negative query coords (conv offsets off the
    low edge) wrap to the top of the uint32 range, above every valid key,
    so they can never false-hit (see module docstring for the bound).
    """
    base = ((coords[:, 0] * dims[1] + coords[:, 1]) * dims[2]
            + coords[:, 2]).astype(jnp.uint32)
    k = base + scene.astype(jnp.uint32) * (dims[0] * dims[1]
                                           * dims[2]).astype(jnp.uint32)
    return jnp.where(valid, k, _PAD)


def _nbr_map(coords: jnp.ndarray, scene: jnp.ndarray, keys: jnp.ndarray,
             valid: jnp.ndarray, total: jnp.ndarray, offsets: np.ndarray,
             dims: jnp.ndarray) -> jnp.ndarray:
    """(N, K) flat neighbor indices, -1 missing; pad rows all -1.

    Probes only the FIRST half of a symmetric stencil: the hit relation is
    a bijection per offset (keys unique), and ``offsets[K-1-t] ==
    -offsets[t]`` (kernel_offsets odd-size order), so every hit ``i -> j``
    at offset t IS the hit ``j -> i`` at offset K-1-t — one cheap scatter
    replaces each of the other half's searchsorted probes (the measured
    chip cost of the in-jit build, PERF.md round-5).
    """
    n = keys.shape[0]
    k = len(offsets)
    sym = k % 2 == 1 and bool(
        (np.asarray(offsets) == -np.asarray(offsets)[::-1]).all())
    rows = jnp.arange(n, dtype=jnp.int32)
    cols: list = [None] * k
    for t, off in enumerate(offsets):
        if sym and t > k // 2:
            break
        if sym and t == k // 2:           # center offset: identity
            cols[t] = jnp.where(valid, rows, -1)
            continue
        q = _aug_key(coords + jnp.asarray(off, jnp.int32)[None, :], scene,
                     valid, dims)
        idx = jnp.searchsorted(keys, q, method="sort").astype(jnp.int32)
        idx_c = jnp.minimum(idx, n - 1)
        hit = (keys[idx_c] == q) & (idx_c < total) & valid
        cols[t] = jnp.where(hit, idx_c, -1)
        if sym:
            cols[k - 1 - t] = jnp.full((n + 1,), -1, jnp.int32).at[
                jnp.where(hit, idx_c, n)].set(rows, mode="drop")[:n]
    return jnp.stack(cols, axis=1)


def _group_by_key(keys: jnp.ndarray, scene: jnp.ndarray, n_scenes: int):
    """Argsort-dedup of scene-augmented ``keys`` (pads = _PAD sort last).

    Returns ``(order, first_s, rank, counts, total)`` where ``rank`` is
    the global group id per ROW (original order, -1 for pads), ``counts``
    the per-scene group counts, and ``total`` the overall group count.
    Global rank == host's per-scene rank + scene group-start because the
    sort is scene-major.
    """
    n = keys.shape[0]
    order = jnp.argsort(keys)
    sk = keys[order]
    valid_s = sk != _PAD
    first_s = valid_s & jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    rank_s = (jnp.cumsum(first_s) - 1).astype(jnp.int32)
    total = jnp.sum(first_s).astype(jnp.int32)
    rank = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.where(valid_s, rank_s, -1))
    scene_s = jnp.where(valid_s, scene[order], n_scenes)
    counts = jax.ops.segment_sum(first_s.astype(jnp.int32), scene_s,
                                 num_segments=n_scenes + 1)[:n_scenes]
    return order, first_s, rank_s, rank, counts, total


def _rect_gather(starts: jnp.ndarray, counts: jnp.ndarray, cap: int
                 ) -> jnp.ndarray:
    """(B, cap) flat row of each scene-local rank, -1 past the count."""
    r = jnp.arange(cap, dtype=jnp.int32)[None, :]
    return jnp.where(r < counts[:, None],
                     starts[:, None].astype(jnp.int32) + r, -1)


def _excl_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(x)[:-1]])


def _window_pack(coords: jnp.ndarray, scene: jnp.ndarray,
                 valid: jnp.ndarray, n_scenes: int, window: int,
                 shift: int, nw_cap: int, rows: jnp.ndarray
                 ) -> Dict[str, jnp.ndarray]:
    """Flat twin of window_maps.build_window_pack + collate_flat's
    concatenation: windows globally numbered scene-major ascending-key.

    Returns ``c2v (nw_cap*w3,)``, ``slot (N,)`` (-1 pads/overflow) plus
    the compacted window coords/scene/count for the stem halo map.
    """
    assert window & (window - 1) == 0, window
    lw = window.bit_length() - 1
    w3 = window ** 3
    sh = coords + jnp.int32(shift)
    wc = sh >> lw
    wmax = jnp.max(jnp.where(valid[:, None], wc, 0), axis=0)
    dims = wmax + 3
    keys = _aug_key(wc, scene, valid, dims)
    order, first_s, rank_s, rank, counts, total = _group_by_key(
        keys, scene, n_scenes)
    local = sh & (window - 1)
    cell = ((local[:, 0] * window + local[:, 1]) * window
            + local[:, 2]).astype(jnp.int32)
    ok = valid & (rank >= 0) & (rank < nw_cap)
    slot = jnp.where(ok, rank * w3 + cell, -1)
    c2v = jnp.full((nw_cap * w3 + 1,), -1, jnp.int32).at[
        jnp.where(ok, slot, nw_cap * w3)].set(rows, mode="drop")[:nw_cap * w3]
    # compacted window coords/scene (ascending key) for the halo map
    tgt = jnp.where(first_s & (rank_s < nw_cap), rank_s, nw_cap)
    win_c = jnp.zeros((nw_cap + 1, 3), jnp.int32).at[tgt].set(
        wc[order], mode="drop")[:nw_cap]
    win_scene = jnp.full((nw_cap + 1,), n_scenes, jnp.int32).at[tgt].set(
        scene[order], mode="drop")[:nw_cap]
    return {"c2v": c2v, "slot": slot, "win_coords": win_c,
            "win_scene": win_scene, "n_win": jnp.minimum(total, nw_cap),
            "win_dims": dims}


def build_flat_maps(coords0: jnp.ndarray, counts0: jnp.ndarray,
                    caps: Mapping[str, int],
                    swin_window: int = 0,
                    swin_levels: Sequence[int] = (1, 2, 3, 4),
                    stem_mode: str = "none",
                    stem_block: int = 8,
                    voxel_feats: Optional[jnp.ndarray] = None,
                    ztriple: bool = False,
                    num_levels: int = kernel_maps.NUM_LEVELS
                    ) -> Dict[str, jnp.ndarray]:
    """Device twin of ``collate_flat``'s maps section — jit-safe.

    Args:
      coords0: (caps['tot_0'], 3) int32 — per-scene biased
        (device_maps.bias_coords_16), ravel-sorted coords, scene-major
        concatenated; pad rows past the true total are ignored.
      counts0: (B,) int32 true per-scene voxel counts.
      caps: static flat dims (the serving shape lock): ``tot_l`` and
        ``rect_l`` for every level, ``win{l}s{j}_nw`` when
        ``swin_window``, ``stem_nb`` when ``stem_mode='dense_block'``.
      voxel_feats: (tot_0, C) — required for the dense-block stem pack.

    Returns the flat maps dict (``valid_l (tot_l,)``, ``nbr3_l``,
    ``child_l``, ``parent_l``, ``parent_off_l``, ``ancestor``,
    ``anc_local``, ``voxel_scene``, ``rect_l``, swin/stem packs),
    matching collate_flat bit-for-bit (tests/test_device_flat_maps.py).
    """
    tot0 = coords0.shape[0]
    assert tot0 == int(caps["tot_0"]), (tot0, dict(caps))
    b = counts0.shape[0]
    off3 = kernel_maps.kernel_offsets(3)
    out: Dict[str, jnp.ndarray] = {}

    counts = counts0.astype(jnp.int32)
    starts = _excl_cumsum(counts)
    total = jnp.sum(counts)
    rows0 = jnp.arange(tot0, dtype=jnp.int32)
    # scene of each flat row: how many scene starts are <= row (minus 1)
    scene0 = (jnp.searchsorted(starts, rows0, side="right").astype(jnp.int32)
              - 1)
    valid = rows0 < total
    scene = jnp.where(valid, scene0, b)
    coords = coords0.astype(jnp.int32)
    cmax = jnp.max(jnp.where(valid[:, None], coords, 0), axis=0)
    dims = cmax + 3          # level-0 bounds serve every (coarser) level

    anc = [rows0]
    parent_list = []         # global parent ranks per level (extended below)
    level_coords = []        # (coords, scene, valid, total, rows) per level
    for lvl in range(num_levels):
        tot_l = int(caps[f"tot_{lvl}"])
        rows = jnp.arange(tot_l, dtype=jnp.int32)
        keys = _aug_key(coords, scene, valid, dims)
        out[f"valid_{lvl}"] = valid
        out[f"nbr3_{lvl}"] = _nbr_map(coords, scene, keys, valid, total,
                                      off3, dims)
        out[f"rect_{lvl}"] = _rect_gather(starts, counts,
                                          int(caps[f"rect_{lvl}"]))
        level_coords.append((coords, scene, valid, total, rows, starts))
        if lvl == num_levels - 1:
            break
        tot_next = int(caps[f"tot_{lvl + 1}"])
        coarse_all = coords >> 1
        pk = _aug_key(coarse_all, scene, valid, dims)
        order, first_s, rank_s, parent, counts_n, total_n = _group_by_key(
            pk, scene, b)
        lsb = coords & 1
        poff = (lsb[:, 0] * 4 + lsb[:, 1] * 2 + lsb[:, 2]).astype(jnp.int32)
        out[f"parent_{lvl}"] = parent
        parent_list.append(parent)
        out[f"parent_off_{lvl}"] = jnp.where(valid, poff, 0)
        tgt = jnp.where(first_s & (rank_s < tot_next), rank_s, tot_next)
        coarse = jnp.zeros((tot_next + 1, 3), jnp.int32).at[tgt].set(
            coarse_all[order], mode="drop")[:tot_next]
        child = jnp.full((tot_next * 8,), -1, jnp.int32).at[
            jnp.where(valid & (parent >= 0) & (parent < tot_next),
                      parent * 8 + poff, tot_next * 8)].set(
            rows, mode="drop").reshape(tot_next, 8)
        out[f"child_{lvl}"] = child
        anc.append(jnp.where(anc[-1] >= 0,
                             parent[jnp.maximum(anc[-1], 0)], -1))
        coords = coarse
        counts = jnp.minimum(counts_n, tot_next)   # safety clamp
        starts = _excl_cumsum(counts)
        total = jnp.minimum(total_n, tot_next)
        rows_next = jnp.arange(tot_next, dtype=jnp.int32)
        valid = rows_next < total
        scene = (jnp.searchsorted(starts, rows_next,
                                  side="right").astype(jnp.int32) - 1)
        scene = jnp.where(valid, scene, b)

    valid0 = rows0 < jnp.sum(counts0)
    out["ancestor"] = jnp.where(valid0[None, :],
                                jnp.maximum(jnp.stack(anc), 0), 0)
    # scene-local ancestors: global flat row minus the scene's level start
    anc_local = []
    for lvl in range(num_levels):
        l_starts = level_coords[lvl][5]
        a = out["ancestor"][lvl]
        anc_local.append(a - l_starts[jnp.minimum(scene0, b - 1)].astype(
            jnp.int32))
    out["anc_local"] = jnp.where(valid0[None, :], jnp.stack(anc_local), 0)
    out["voxel_scene"] = jnp.where(valid0, scene0, 0)

    if swin_window:
        w3 = swin_window ** 3
        # shift-0 packs for window 4 come FREE from the hierarchy chain:
        # grouping by c >> 2 IS the level l+2 coordinate set, numbered in
        # the same scene-major ascending order — window rank = the two-step
        # parent composition.  Extend the chain 2 virtual levels (tiny
        # argsorts at the coarsest sizes) so levels 3 and 4 have ancestors.
        if swin_window == 4:
            vcap = level_coords[-1][0].shape[0]
            vc, vs, vv, vt = (coords, scene, valid, total)
            for _extra in range(max(swin_levels) + 2 - num_levels + 1):
                pk = _aug_key(vc >> 1, vs, vv, dims)
                order, first_s, rank_s, parent, counts_n, total_n = \
                    _group_by_key(pk, vs, b)
                parent_list.append(parent)
                tgt = jnp.where(first_s & (rank_s < vcap), rank_s, vcap)
                vc = jnp.zeros((vcap + 1, 3), jnp.int32).at[tgt].set(
                    (vc >> 1)[order], mode="drop")[:vcap]
                vt = jnp.minimum(total_n, vcap)
                vv = jnp.arange(vcap, dtype=jnp.int32) < vt
                starts_v = _excl_cumsum(jnp.minimum(counts_n, vcap))
                vs = (jnp.searchsorted(
                    starts_v, jnp.arange(vcap, dtype=jnp.int32),
                    side="right").astype(jnp.int32) - 1)
                vs = jnp.where(vv, vs, b)
        for lvl in swin_levels:
            lc, ls, lvalid, ltotal, lrows, _st = level_coords[lvl]
            for j, shift in enumerate((0, swin_window // 2)):
                key = f"win{lvl}s{j}"
                nw_cap = int(caps[f"{key}_nw"])
                if j == 0 and swin_window == 4 and \
                        lvl + 1 < len(parent_list):
                    # rank via the chain: level l -> l+1 -> l+2
                    p1 = parent_list[lvl]
                    p2 = parent_list[lvl + 1]
                    # clamp: a cap-overflowing parent rank must not read
                    # out of bounds (the host check guards real overflow)
                    p1c = jnp.clip(p1, 0, p2.shape[0] - 1)
                    rank = jnp.where((p1 >= 0) & (p1 < p2.shape[0]),
                                     p2[p1c], -1)
                    local = lc & 3
                    cell = ((local[:, 0] * 4 + local[:, 1]) * 4
                            + local[:, 2]).astype(jnp.int32)
                    ok = lvalid & (rank >= 0) & (rank < nw_cap)
                    slot = jnp.where(ok, rank * w3 + cell, -1)
                    c2v = jnp.full((nw_cap * w3 + 1,), -1, jnp.int32).at[
                        jnp.where(ok, slot, nw_cap * w3)].set(
                        lrows, mode="drop")[:nw_cap * w3]
                    out[f"{key}_c2v"] = c2v
                    out[f"{key}_slot"] = slot
                    continue
                p = _window_pack(lc, ls, lvalid, b, swin_window, shift,
                                 nw_cap, lrows)
                out[f"{key}_c2v"] = p["c2v"]
                out[f"{key}_slot"] = p["slot"]

    if stem_mode == "dense_block":
        if voxel_feats is None:
            raise ValueError("dense_block stem pack needs voxel_feats")
        lc, ls, lvalid, ltotal, lrows, _st = level_coords[0]
        nb = int(caps["stem_nb"])
        b3 = stem_block ** 3
        p = _window_pack(lc, ls, lvalid, b, stem_block, 0, nb, lrows)
        out["stem_c2v"] = p["c2v"]
        out["stem_slot"] = p["slot"]
        wvalid = jnp.arange(nb, dtype=jnp.int32) < p["n_win"]
        wkeys = _aug_key(p["win_coords"], p["win_scene"], wvalid,
                         p["win_dims"])
        out["stem_nbrblk"] = _nbr_map(p["win_coords"], p["win_scene"],
                                      wkeys, wvalid, p["n_win"], off3,
                                      p["win_dims"])
        cin = voxel_feats.shape[1]
        tgtd = jnp.where(out["stem_slot"] >= 0, out["stem_slot"], nb * b3)
        dense = jnp.zeros((nb * b3 + 1, cin), voxel_feats.dtype).at[
            tgtd].set(voxel_feats, mode="drop")[:nb * b3]
        out["stem_dense"] = dense.reshape(nb, b3 * cin)
    elif stem_mode not in ("none", "gather"):
        raise NotImplementedError(stem_mode)
    if stem_mode == "gather":
        raise NotImplementedError(
            "flat device maps + 125-tap gather stem: use "
            "stem_mode='dense_block' or 'none' (swin3d backbone)")

    if ztriple:
        from pq3d_tpu.ops import pallas_zt
        for lvl in (1, 2, 3):         # instseg_pipeline.ZTRIPLE_LEVELS
            zb, zc = pallas_zt.device_zrun_plan(out[f"nbr3_{lvl}"])
            out[f"zt{lvl}_base"] = zb
            out[f"zt{lvl}_code"] = zc
    return out


def flat_caps_complete(caps: Mapping[str, int], swin_window: int,
                       swin_levels: Sequence[int], stem_mode: str,
                       num_levels: int = kernel_maps.NUM_LEVELS) -> list:
    """Names missing from ``caps`` for this configuration (host helper —
    used by collate/model guards to fail loudly before tracing)."""
    need = [f"tot_{l}" for l in range(num_levels)]
    need += [f"rect_{l}" for l in range(num_levels)]
    if swin_window:
        need += [f"win{l}s{j}_nw" for l in swin_levels for j in (0, 1)]
    if stem_mode == "dense_block":
        need.append("stem_nb")
    return [n for n in need if n not in caps]
