"""Point sampling / grouping ops (PointNet++ substrate).

TPU-native replacements for the reference's CUDA kernels
(reference: modules/third_party/pointnet2/_ext_src/src/{sampling,ball_query,
group_points,interpolate}_gpu.cu; Python wrappers pointnet2_utils.py:48-419).

Device functions are single-cloud; callers ``jax.vmap`` over batch/object
dims.  All shapes static; ragged neighborhoods are handled by first-hit
filling exactly like the CUDA ball-query kernel.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Ball-query implementation switch
# ---------------------------------------------------------------------------
# Four algebraically-equivalent first-k-hits formulations (the CUDA kernel's
# semantics, ref ball_query_gpu.cu:9-53) with very different TPU lowerings;
# tools/bench_ballquery.py measures them, this switch ships the winner.
# Select via PQ3D_BALLQUERY env var or set_ball_query_impl().

def set_ball_query_impl(name: str) -> None:
    """'topk' | 'sort' | 'onehot' | 'scatter' (affects future traces)."""
    global _BQ_IMPL
    if name not in ("topk", "sort", "onehot", "scatter"):
        raise ValueError(f"unknown ball_query impl {name!r}")
    _BQ_IMPL = name


set_ball_query_impl(os.environ.get("PQ3D_BALLQUERY", "topk"))


def _first_k_hits(ok: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """(..., M, N) hit mask -> (..., M, nsample) indices of the first
    ``nsample`` True columns per row, in index order; misses hold N."""
    lead = ok.shape[:-1]
    n = ok.shape[-1]
    ok2 = ok.reshape(-1, n)
    m = ok2.shape[0]
    impl = _BQ_IMPL
    if impl in ("topk", "sort"):
        key = jnp.where(ok2, jax.lax.broadcasted_iota(jnp.int32, ok2.shape, 1),
                        n)
        if impl == "topk":
            # smallest nsample keys per row == first hits in index order
            idx = -jax.lax.top_k(-key, nsample)[0]
        else:
            idx = jnp.sort(key, axis=1)[:, :nsample]
    else:
        # rank each hit among its row's hits with a cumsum, then place
        # index n at slot rank-1 — either via a one-slot scatter-min
        # (ranks are unique per row) or a one-hot MXU matmul
        rank = jnp.cumsum(ok2.astype(jnp.int32), axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, ok2.shape, 1)
        if impl == "scatter":
            slot = jnp.where(ok2 & (rank <= nsample), rank - 1, nsample)
            base = jnp.full((m, nsample + 1), n, jnp.int32)
            rows = jax.lax.broadcasted_iota(jnp.int32, ok2.shape, 0)
            idx = base.at[rows.reshape(-1), slot.reshape(-1)].min(
                iota.reshape(-1))[:, :nsample]
        else:  # onehot
            slot = jnp.where(ok2, rank - 1, nsample)
            oh = jax.nn.one_hot(slot, nsample, dtype=jnp.float32)  # (M,N,S)
            got = jnp.einsum("mn,mns->ms", iota.astype(jnp.float32), oh,
                             preferred_element_type=jnp.float32)
            filled = jnp.max(oh, axis=1) > 0
            idx = jnp.where(filled, got.astype(jnp.int32), n)
    return idx.reshape(*lead, nsample)


def _fill_first(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Replace misses (== n) with the row's first hit; 0 when none."""
    hit = idx < n
    first = idx[..., :1]
    idx = jnp.where(hit, idx, first)
    return jnp.where(first < n, idx, 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Furthest point sampling
# ---------------------------------------------------------------------------

def furthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Iterative FPS on one cloud.  (N, 3) -> (npoint,) int32 indices.

    Matches the CUDA kernel's semantics (start at index 0, greedy farthest;
    ref sampling_gpu.cu:69-173).  ``valid`` masks padded points out of the
    selection.  The min-distance array stays in registers/VMEM across the
    sequential scan — the op is bandwidth-trivial (N floats per step).
    """
    n = xyz.shape[0]
    big = jnp.asarray(jnp.inf, xyz.dtype)
    mind = jnp.full((n,), big, xyz.dtype)
    if valid is not None:
        mind = jnp.where(valid, mind, -big)

    def body(carry, _):
        mind, last = carry
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        if valid is not None:
            d = jnp.where(valid, d, -big)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind).astype(jnp.int32)
        return (mind, nxt), last

    first = jnp.asarray(0, jnp.int32)
    if valid is not None:
        # start from the first valid point
        first = jnp.argmax(valid).astype(jnp.int32)
    (_, _), picks = jax.lax.scan(body, (mind, first), None, length=npoint)
    return picks


def _flat_gather(x2d: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Fast (PROMISE_IN_BOUNDS) row gather; idx already flat + in-bounds."""
    from pq3d_tpu.ops.sparse import fast_row_gather
    return fast_row_gather(x2d, idx)


def furthest_point_sample_batched(xyz: jnp.ndarray, npoint: int
                                  ) -> jnp.ndarray:
    """Batched iterative FPS: (B, N, 3) -> (B, npoint) int32.

    Same greedy semantics as :func:`furthest_point_sample`, but the
    per-step ``xyz[last]`` lookup runs as ONE flat PROMISE_IN_BOUNDS gather
    over (B*N, 3) instead of a vmapped dynamic-slice (clip-mode batched
    gather — the slow path on TPU, see PERF.md).
    """
    b, n, _ = xyz.shape
    flat = xyz.reshape(b * n, 3)
    base = jnp.arange(b, dtype=jnp.int32) * n
    big = jnp.asarray(jnp.inf, xyz.dtype)
    mind0 = jnp.full((b, n), big, xyz.dtype)

    def body(carry, _):
        mind, last = carry                     # (B, N), (B,)
        sel = _flat_gather(flat, base + last)  # (B, 3)
        d = jnp.sum((xyz - sel[:, None, :]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind, axis=-1).astype(jnp.int32)
        return (mind, nxt), last

    first = jnp.zeros((b,), jnp.int32)
    (_, _), picks = jax.lax.scan(body, (mind0, first), None, length=npoint)
    return picks.T                             # (B, npoint)


def ball_query_batched(xyz: jnp.ndarray, centers: jnp.ndarray,
                       radius: float, nsample: int) -> jnp.ndarray:
    """Batched first-hit ball query: (B, N, 3), (B, M, 3) -> (B, M, S)."""
    n = xyz.shape[1]
    d2 = jnp.sum((centers[:, :, None, :] - xyz[:, None, :, :]) ** 2, -1)
    ok = d2 < radius * radius                  # (B, M, N)
    return _fill_first(_first_k_hits(ok, nsample), n)


def query_and_group_batched(xyz: jnp.ndarray, centers: jnp.ndarray,
                            feats: jnp.ndarray | None, radius: float,
                            nsample: int, use_xyz: bool = True
                            ) -> jnp.ndarray:
    """Batched fused ball query + grouping: flat fast gathers instead of
    vmapped ``jnp.take`` (ref pointnet2_utils.py QueryAndGroup :291-373)."""
    b, n, _ = xyz.shape
    m = centers.shape[1]
    idx = ball_query_batched(xyz, centers, radius, nsample)  # (B, M, S)
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    fi = (idx + off).reshape(-1)
    gx = _flat_gather(xyz.reshape(b * n, 3), fi).reshape(b, m, nsample, 3)
    grouped_xyz = gx - centers[:, :, None, :]
    if feats is None:
        return grouped_xyz
    c = feats.shape[-1]
    gf = _flat_gather(feats.reshape(b * n, c), fi).reshape(b, m, nsample, c)
    if use_xyz:
        gf = jnp.concatenate([grouped_xyz, gf], axis=-1)
    return gf


def gather_centers_batched(xyz: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C), (B, M) -> (B, M, C) via one flat fast gather."""
    b, n, c = xyz.shape
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    return _flat_gather(xyz.reshape(b * n, c),
                        (idx + base).reshape(-1)).reshape(b, idx.shape[1], c)


def fps_numpy(points: np.ndarray, npoint: int, start: int = 0,
              subsample: int = 0,
              rng: np.random.Generator | None = None) -> np.ndarray:
    """Host-side FPS for query initialization in the input pipeline
    (replaces the reference's fpsample Rust dep — itself an approximate
    bucket-kd FPS; ref data/datasets/sceneverse_instseg.py:122).

    ``subsample`` > 0 runs FPS on a random candidate subset (indices still
    refer to the full array) — the same accuracy/speed trade the reference's
    bucket FPS makes, ~n/subsample times faster on big clouds."""
    n = len(points)
    if n == 0:
        return np.zeros(npoint, dtype=np.int64)
    if subsample and n > subsample >= npoint:
        rng = rng or np.random.default_rng(0)
        cand = rng.choice(n, size=subsample, replace=False)
        return cand[fps_numpy(points[cand], npoint, start)]
    # both paths compute in f32 so picks are identical whether or not the
    # native lib compiled (f64 input could break near-ties between them)
    points = np.asarray(points, np.float32)
    if points.ndim == 2 and points.shape[1] == 3:
        from pq3d_tpu.ops._native import lib
        L = lib()
        if L is not None:
            pts = np.ascontiguousarray(points)
            picks = np.empty(npoint, dtype=np.int64)
            L.pq3d_fps(pts.ctypes.data, n, npoint, start % n,
                       picks.ctypes.data)
            return picks
    picks = np.empty(npoint, dtype=np.int64)
    mind = np.full(n, np.inf, np.float32)
    last = start % n
    for i in range(npoint):
        picks[i] = last
        d = np.sum((points - points[last]) ** 2, axis=-1)
        np.minimum(mind, d, out=mind)
        last = int(np.argmax(mind))
    return picks


# ---------------------------------------------------------------------------
# Ball query + grouping
# ---------------------------------------------------------------------------

def ball_query(xyz: jnp.ndarray, centers: jnp.ndarray, radius: float,
               nsample: int) -> jnp.ndarray:
    """First ``nsample`` points within ``radius`` of each center.

    (N, 3), (M, 3) -> (M, nsample) int32.  Semantics match the CUDA kernel
    (ref ball_query_gpu.cu:9-53): candidates in index order, remaining slots
    filled with the first hit; 0 if no hit.
    """
    n = xyz.shape[0]
    d2 = jnp.sum((centers[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    ok = d2 < radius * radius
    return _fill_first(_first_k_hits(ok, nsample), n)


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (N, C) features by (M, S) indices -> (M, S, C)
    (ref group_points_gpu.cu:8-75; backward is XLA's native gather VJP)."""
    return jnp.take(feats, idx, axis=0)


def query_and_group(xyz: jnp.ndarray, centers: jnp.ndarray,
                    feats: jnp.ndarray | None, radius: float, nsample: int,
                    use_xyz: bool = True) -> jnp.ndarray:
    """Fused ball query + grouping + center-relative xyz concat
    (ref pointnet2_utils.py QueryAndGroup :291-373). -> (M, nsample, C')"""
    idx = ball_query(xyz, centers, radius, nsample)
    grouped_xyz = jnp.take(xyz, idx, axis=0) - centers[:, None, :]
    if feats is None:
        return grouped_xyz
    grouped = jnp.take(feats, idx, axis=0)
    if use_xyz:
        grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
    return grouped


# ---------------------------------------------------------------------------
# Three-NN interpolation
# ---------------------------------------------------------------------------

def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """3 nearest neighbors of each unknown point among known points.

    (n, 3), (m, 3) -> (dist (n, 3), idx (n, 3)); brute force via top_k
    (ref interpolate_gpu.cu:9-154).
    """
    d2 = jnp.sum((unknown[:, None, :] - known[None, :, :]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 1e-10)), idx.astype(jnp.int32)


def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted sum of 3-NN features: (m, C), (n, 3), (n, 3) -> (n, C)."""
    gathered = jnp.take(feats, idx, axis=0)  # (n, 3, C)
    return jnp.einsum("nk,nkc->nc", weight, gathered)


def three_interpolate_weights(unknown: jnp.ndarray, known: jnp.ndarray):
    """Inverse-distance weights over the 3 NN (ref pointnet2_modules.py:356-416)."""
    dist, idx = three_nn(unknown, known)
    inv = 1.0 / jnp.maximum(dist, 1e-8)
    w = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return idx, w
