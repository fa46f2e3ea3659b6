"""Host-side sparse-convolution kernel maps (numpy).

This module replaces the MinkowskiEngine coordinate manager (external C++/CUDA
dep of the reference; used via ``ME.SparseTensor`` at
reference model/query3d_unified.py:152 and the sparse convs of
modules/third_party/mask3d/res16unet.py).  TPU-native design:

* All maps are built **on the host inside the input pipeline**, per scene,
  and padded to static sizes -> jitted device graphs never recompile.
* Convolutions become gather->GEMM on device: for output voxel ``j`` and
  kernel offset ``k``, ``nbr[j, k]`` is the index of the contributing input
  voxel (or ``-1``).  ``out[j] = sum_k x[nbr[j,k]] @ W[k]``.
* Stride-2 down-convs use per-coarse-voxel child maps (K=8, exact, no waste);
  transpose convs / pooling-transposes use parent index + offset-id gathers.

The full U-Net needs one :class:`SparseHierarchy` per scene, holding the
coordinate pyramid (stride 1, 2, 4, 8, 16) and every map the network uses.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

NUM_LEVELS = 5  # stride 1, 2, 4, 8, 16 (ref: res16unet.py forward ladder)


def _keys_for(coords: np.ndarray, base: np.ndarray, dims: np.ndarray) -> np.ndarray:
    """Injective int64 key for integer coords within [base, base+dims)."""
    shifted = (coords - base).astype(np.int64)
    key = shifted[:, 0]
    for d in range(1, coords.shape[1]):
        key = key * np.int64(dims[d]) + shifted[:, d]
    return key


class CoordTable:
    """Coord -> index lookup reusable across all kernel offsets.

    Uses a dense int32 grid when the bounding volume is small (O(1) fancy-
    indexed lookups; scan scenes at 0.02 m are ~300^3 cells), falling back
    to one shared sorted-key table otherwise."""

    DENSE_LIMIT = 80_000_000  # cells (~320 MB int32)

    def __init__(self, coords: np.ndarray, margin: int = 3):
        self._margin = margin
        self.n = len(coords)
        if self.n == 0:
            self.lo = np.zeros(3, np.int64)
            self.dims = np.ones(3, np.int64)
            self.grid = None
            self.sorted_keys = np.zeros(0, np.int64)
            self.order = np.zeros(0, np.int64)
            return
        self.lo = coords.min(0).astype(np.int64) - margin
        self.dims = (coords.max(0).astype(np.int64) - self.lo + 1 + margin)
        volume = int(np.prod(self.dims))
        if volume <= self.DENSE_LIMIT:
            self.grid = np.full(volume, -1, np.int32)
            self.grid[_keys_for(coords, self.lo, self.dims)] = \
                np.arange(self.n, dtype=np.int32)
        else:
            self.grid = None
            keys = _keys_for(coords, self.lo, self.dims)
            self.order = np.argsort(keys, kind="stable")
            self.sorted_keys = keys[self.order]

    def lookup(self, query_coords: np.ndarray) -> np.ndarray:
        if self.n == 0 or len(query_coords) == 0:
            return np.full(len(query_coords), -1, dtype=np.int32)
        shifted = query_coords.astype(np.int64) - self.lo
        inside = ((shifted >= 0) & (shifted < self.dims)).all(1)
        key = (shifted[:, 0] * self.dims[1] + shifted[:, 1]) * self.dims[2] \
            + shifted[:, 2]
        key = np.where(inside, key, 0)
        if self.grid is not None:
            return np.where(inside, self.grid[key], -1).astype(np.int32)
        pos = np.searchsorted(self.sorted_keys, key)
        pos_c = np.minimum(pos, self.n - 1)
        hit = (self.sorted_keys[pos_c] == key) & inside
        return np.where(hit, self.order[pos_c], -1).astype(np.int32)

    def lookup_offsets(self, coords: np.ndarray, offsets: np.ndarray
                       ) -> np.ndarray:
        """(N, 3) coords x (K, 3) offsets -> (N, K) neighbor indices.

        Uses key(coords + off) = key(coords) + const(off): one base-key pass
        then K scalar-shifted fancy-index lookups — the host pipeline's hot
        loop.  Requires the dense grid with margin >= max|offset| so shifted
        keys never leave the (border = -1) grid."""
        max_off = int(np.abs(offsets).max())
        if self.grid is None or max_off > self._margin:
            out = np.empty((len(coords), len(offsets)), np.int32)
            for k, off in enumerate(offsets):
                out[:, k] = self.lookup(coords + off[None, :])
            return out
        shifted = coords.astype(np.int64) - self.lo
        base = (shifted[:, 0] * self.dims[1] + shifted[:, 1]) * self.dims[2] \
            + shifted[:, 2]
        deltas = (offsets[:, 0].astype(np.int64) * self.dims[1]
                  + offsets[:, 1]) * self.dims[2] + offsets[:, 2]
        out = np.empty((len(coords), len(offsets)), np.int32)
        for k in range(len(offsets)):
            out[:, k] = self.grid[base + deltas[k]]
        return out


def _lookup(query_coords: np.ndarray, table_coords: np.ndarray) -> np.ndarray:
    """For each query coord, index into table_coords (or -1). Vectorized."""
    return CoordTable(table_coords).lookup(query_coords)


def morton_order(coords: np.ndarray, bits: int = 10) -> np.ndarray:
    """Permutation sorting integer coords by Morton (z-order) code.

    Spatially-near voxels become index-near, which concentrates sparse-conv
    neighbor indices around the diagonal — the key enabler for windowed
    (VMEM-resident) gather kernels and for fast XLA gathers.
    """
    c = (coords - coords.min(0)).astype(np.uint64)
    c = np.minimum(c, (1 << bits) - 1)
    code = np.zeros(len(c), dtype=np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= ((c[:, d] >> np.uint64(b)) & np.uint64(1)) << \
                np.uint64(3 * b + d)
    return np.argsort(code, kind="stable")


def build_block_pack(coords: np.ndarray, block: int = 8
                     ) -> Dict[str, np.ndarray]:
    """Pack sparse voxels into dense ``block^3`` spatial blocks.

    TPU-first alternative to per-voxel gather convolution: inside occupied
    blocks the conv becomes a *dense* 3D convolution (pure MXU work, no
    random gathers); blocks exchange halos via 26 whole-block gathers
    (large contiguous reads).  Occupancy on scan surfaces is ~10-30%, a
    FLOP overhead the MXU efficiency more than repays (cf. PointAcc /
    TorchSparse literature on dense-tile dispatch).

    Returns dict:
      vox_slot   (N,)  flat dense-cell index (block_id * block^3 + cell)
      nbr_blocks (n_blocks, 3, 3, 3) neighbor block ids (-1 outside)
      n_blocks   scalar int
    """
    bcoord = np.floor_divide(coords, block)
    lo = bcoord.min(0) if len(bcoord) else np.zeros(3, np.int64)
    bshift = bcoord - lo
    dims = bshift.max(0) + 1 if len(bshift) else np.ones(3, np.int64)
    key = (bshift[:, 0].astype(np.int64) * dims[1] + bshift[:, 1]) * dims[2] \
        + bshift[:, 2]
    ukeys, binv = np.unique(key, return_inverse=True)
    n_blocks = len(ukeys)
    local = coords - bcoord * block
    cell = (local[:, 0] * block + local[:, 1]) * block + local[:, 2]
    vox_slot = (binv * block ** 3 + cell).astype(np.int32)

    ub = np.stack([ukeys // (dims[1] * dims[2]),
                   (ukeys // dims[2]) % dims[1],
                   ukeys % dims[2]], axis=1)
    sorted_keys = ukeys  # already sorted by np.unique
    nbr_blocks = np.full((n_blocks, 3, 3, 3), -1, np.int32)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                q = ub + np.array([dx - 1, dy - 1, dz - 1])
                inside = ((q >= 0) & (q < dims)).all(1)
                qk = (q[:, 0] * dims[1] + q[:, 1]) * dims[2] + q[:, 2]
                pos = np.searchsorted(sorted_keys, qk)
                pos_c = np.minimum(pos, n_blocks - 1)
                hit = (sorted_keys[pos_c] == qk) & inside
                nbr_blocks[:, dx, dy, dz] = np.where(hit, pos_c, -1)
    return {"vox_slot": vox_slot, "nbr_blocks": nbr_blocks,
            "n_blocks": n_blocks}


def kernel_offsets(kernel_size: int, ndim: int = 3) -> np.ndarray:
    """Integer offsets of a hypercubic kernel, ME ordering convention
    (range centered at 0 for odd sizes, [0, k) for even sizes)."""
    if kernel_size % 2 == 1:
        r = np.arange(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = np.arange(kernel_size)
    grids = np.meshgrid(*([r] * ndim), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=1).astype(np.int32)  # (k^ndim, ndim)


def build_neighbor_map(coords: np.ndarray, kernel_size: int,
                       table: Optional["CoordTable"] = None,
                       n_pad: Optional[int] = None,
                       out: Optional[np.ndarray] = None) -> np.ndarray:
    """Stride-1 conv map on one coordinate set: (N, K) indices, -1 = missing.

    Uses the native C++ open-addressing hash when available (the numpy
    dense-grid path allocates O(volume) per level — the measured host-
    pipeline bottleneck); ``n_pad`` writes directly into a padded output
    (rows >= N are -1) and ``out`` can be a preallocated contiguous buffer
    (e.g. a batch-array row view) to skip the stack copy entirely.
    """
    offs = kernel_offsets(kernel_size)
    from pq3d_tpu.ops._native import lib
    L = lib()
    if L is not None and table is None:
        c = np.ascontiguousarray(coords, np.int32)
        o = np.ascontiguousarray(offs, np.int32)
        n = len(c)
        if n and int(np.abs(c).max()) >= (1 << 20) - 4:
            # the native key packs biased coords into 21-bit fields; field
            # arithmetic (and the hash key itself) silently corrupts beyond
            # +-2^20 — at 2 cm voxels that is a ~21 km scene, so reject
            # loudly rather than return wrong neighbor maps
            raise ValueError(
                f"voxel coords exceed the native packer's +-2^20 range "
                f"(max abs {int(np.abs(c).max())}); re-origin the scene")
        rows = int(n_pad) if n_pad else n
        if out is None:
            out = np.empty((rows, len(o)), np.int32)
        else:
            assert out.shape == (rows, len(o)) and out.dtype == np.int32 \
                and out.flags.c_contiguous
        L.pq3d_neighbor_map(c.ctypes.data, n, o.ctypes.data, len(o),
                            rows, out.ctypes.data)
        return out
    if table is None:
        table = CoordTable(coords, margin=max(3, kernel_size // 2 + 1))
    nbr = table.lookup_offsets(coords, offs)
    if n_pad:
        nbr = pad_rows(nbr, int(n_pad), -1)
    if out is not None:
        out[:] = nbr
        return out
    return nbr


def downsample_coords(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stride-2 coordinate downsampling.

    Returns ``(coarse_coords, parent_idx, offset_id)`` where
    ``coarse_coords[parent_idx[i]] * 2 + offset(offset_id[i]) == coords[i]``.
    Coarse coords use floor division (matches ME stride-2 pooling of
    non-negative quantized coords; floor keeps it correct for negatives too).
    Native C++ path produces the identical ascending-key coarse ordering.
    """
    from pq3d_tpu.ops._native import lib
    L = lib()
    if L is not None and coords.shape[1] == 3 and len(coords) \
            and int(np.abs(coords).max()) < (1 << 20) - 4:
        # beyond +-2^20 the native 21-bit key packer corrupts; the numpy
        # dense-grid fallback below has no such bound
        c = np.ascontiguousarray(coords, np.int32)
        n = len(c)
        coarse = np.empty((n, 3), np.int32)
        parent = np.empty(n, np.int32)
        off = np.empty(n, np.int32)
        m = L.pq3d_downsample(c.ctypes.data, n, coarse.ctypes.data,
                              parent.ctypes.data, off.ctypes.data)
        return coarse[:m].copy(), parent, off
    coarse_all = np.floor_divide(coords, 2)
    # unique rows
    lo = coarse_all.min(0) if len(coarse_all) else np.zeros(coords.shape[1], np.int32)
    hi = coarse_all.max(0) if len(coarse_all) else np.zeros(coords.shape[1], np.int32)
    dims = (hi - lo + 1).astype(np.int64)
    keys = _keys_for(coarse_all, lo, dims)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    first = np.ones(len(keys), dtype=bool)
    if len(keys):
        first[1:] = sk[1:] != sk[:-1]
    coarse = coarse_all[order[first]]
    group = np.cumsum(first) - 1
    parent = np.empty(len(keys), dtype=np.int32)
    parent[order] = group.astype(np.int32)
    rem = coords - coarse_all * 2  # in {0,1}^3 per spatial dim (batch dim rem=0)
    # offset id over the spatial dims only (last 3 columns)
    off_id = (rem[:, -3] * 4 + rem[:, -2] * 2 + rem[:, -1]).astype(np.int32)
    return coarse.astype(np.int32), parent, off_id


def build_child_map(parent_idx: np.ndarray, offset_id: np.ndarray,
                    num_coarse: int) -> np.ndarray:
    """Invert (parent, offset) -> (num_coarse, 8) fine indices, -1 = missing."""
    child = np.full((num_coarse, 8), -1, dtype=np.int32)
    child[parent_idx, offset_id] = np.arange(len(parent_idx), dtype=np.int32)
    return child


def pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    """Pad (or verify) leading dim of ``a`` to exactly ``n`` rows."""
    if len(a) > n:
        raise ValueError(f"cannot pad {len(a)} rows into {n}")
    if len(a) == n:
        return a
    pad_shape = (n - len(a),) + a.shape[1:]
    return np.concatenate([a, np.full(pad_shape, fill, dtype=a.dtype)], axis=0)


@dataclass
class SparseHierarchy:
    """Per-scene static-shape sparse-conv plan (host-built, device-consumed).

    All index arrays use -1 for "missing"; device code clips to 0 for the
    gather and masks the contribution out.
    """
    # per level: padded voxel counts and validity
    num_voxels: List[int]                 # true counts
    pad_sizes: List[int]                  # static padded sizes
    coords: List[np.ndarray]              # (P_l, 3) int32, padded (spatial only)
    valid: List[np.ndarray]               # (P_l,) bool
    # stride-1 conv maps
    nbr3: List[np.ndarray]                # level l: (P_l, 27) int32
    nbr5_l0: Optional[np.ndarray]         # (P_0, 125) int32 (conv0 5x5x5)
    # stride-2 down / up plumbing between level l and l+1
    child: List[np.ndarray]               # l -> (P_{l+1}, 8) fine idx
    parent: List[np.ndarray]              # l -> (P_l,) coarse idx (-1 pad)
    parent_off: List[np.ndarray]          # l -> (P_l,) offset id in [0,8)
    # ancestor of each level-0 voxel at every level (for FPN upsampling,
    # replaces chained MinkowskiPoolingTranspose; ref pcd_mask3d_encoder.py:131-137)
    ancestor: np.ndarray = field(default=None)  # (NUM_LEVELS, P_0) int32

    def device_arrays(self) -> Dict[str, np.ndarray]:
        """Flatten into a dict of arrays to ship to the device."""
        out: Dict[str, np.ndarray] = {}
        for l in range(NUM_LEVELS):
            out[f"valid_{l}"] = self.valid[l]
            out[f"nbr3_{l}"] = self.nbr3[l]
        if self.nbr5_l0 is not None:
            out["nbr5_0"] = self.nbr5_l0
        for l in range(NUM_LEVELS - 1):
            out[f"child_{l}"] = self.child[l]
            out[f"parent_{l}"] = self.parent[l]
            out[f"parent_off_{l}"] = self.parent_off[l]
        out["ancestor"] = self.ancestor
        return out


def bucket_pad_sizes(counts: List[int], bucket: int = 4096,
                     caps: Optional[List[int]] = None) -> List[int]:
    """Static pad size per level: round each actual count up to a bucket
    multiple (recompile only when a level crosses a bucket boundary)."""
    sizes = [max(bucket, int(np.ceil(n / bucket)) * bucket) for n in counts]
    if caps:
        sizes = [min(s, c) if c else s for s, c in zip(sizes, caps)]
    return sizes


def build_hierarchy(coords0: np.ndarray, pad_sizes: Optional[List[int]] = None,
                    conv0_kernel: int = 5, bucket: int = 4096,
                    build_nbr5: bool = True) -> SparseHierarchy:
    """Build the full coordinate pyramid + all kernel maps for one scene.

    ``coords0``: (N, 3) int32 quantized voxel coords (single scene, no batch
    column — batching is an outer array dimension on device).
    """
    levels = [coords0.astype(np.int32)]
    parents, offs = [], []
    for l in range(NUM_LEVELS - 1):
        coarse, parent, off = downsample_coords(levels[-1])
        levels.append(coarse)
        parents.append(parent)
        offs.append(off)

    num_voxels = [len(c) for c in levels]
    if pad_sizes is None:
        pad_sizes = bucket_pad_sizes(num_voxels, bucket=bucket)
    else:
        # a scene can legitimately exceed a configured level cap (real scans
        # vary; deep levels especially).  Fall back to a bucketed pad for
        # the overflowing level — ONE recompile for that shape, never a
        # crash (same policy as the dense-stem stem_block_cap fallback).
        pad_sizes = list(pad_sizes)
        for l in range(NUM_LEVELS):
            if num_voxels[l] > pad_sizes[l]:
                grown = bucket_pad_sizes(num_voxels, bucket=bucket)[l]
                import warnings
                warnings.warn(
                    f"level {l} has {num_voxels[l]} voxels > configured cap "
                    f"{pad_sizes[l]}; padding to {grown} for this scene "
                    f"(recompile, not a crash — raise level_caps[{l}] to "
                    f"avoid)")
                pad_sizes[l] = grown

    from pq3d_tpu.ops._native import lib
    if lib() is not None:
        # native hash path: no dense-grid CoordTable allocation, padded
        # outputs written directly (skips the pad_rows copies below)
        nbr3 = [build_neighbor_map(levels[l], 3, n_pad=pad_sizes[l])
                for l in range(NUM_LEVELS)]
        nbr5 = (build_neighbor_map(levels[0], conv0_kernel,
                                   n_pad=pad_sizes[0])
                if build_nbr5 else None)
    else:
        tables = [CoordTable(levels[l]) for l in range(NUM_LEVELS)]
        nbr3 = [build_neighbor_map(levels[l], 3, tables[l])
                for l in range(NUM_LEVELS)]
        nbr5 = (build_neighbor_map(levels[0], conv0_kernel, tables[0])
                if build_nbr5 else None)
    child = [build_child_map(parents[l], offs[l], num_voxels[l + 1])
             for l in range(NUM_LEVELS - 1)]

    # ancestors of every level-0 voxel at each level
    anc = np.zeros((NUM_LEVELS, pad_sizes[0]), dtype=np.int32)
    cur = np.arange(num_voxels[0], dtype=np.int32)
    anc[0, :num_voxels[0]] = cur
    for l in range(NUM_LEVELS - 1):
        cur = parents[l][cur]
        anc[l + 1, :num_voxels[0]] = cur

    return SparseHierarchy(
        num_voxels=num_voxels,
        pad_sizes=list(pad_sizes),
        coords=[pad_rows(levels[l], pad_sizes[l]) for l in range(NUM_LEVELS)],
        valid=[pad_rows(np.ones(num_voxels[l], dtype=bool), pad_sizes[l], False)
               for l in range(NUM_LEVELS)],
        nbr3=[pad_rows(nbr3[l], pad_sizes[l], -1) for l in range(NUM_LEVELS)],
        nbr5_l0=pad_rows(nbr5, pad_sizes[0], -1) if nbr5 is not None else None,
        child=[pad_rows(child[l], pad_sizes[l + 1], -1)
               for l in range(NUM_LEVELS - 1)],
        parent=[pad_rows(parents[l].astype(np.int32), pad_sizes[l], -1)
                for l in range(NUM_LEVELS - 1)],
        parent_off=[pad_rows(offs[l], pad_sizes[l], 0)
                    for l in range(NUM_LEVELS - 1)],
        ancestor=anc,
    )


def build_ztriple_plan(nbr: np.ndarray, n_pad: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """z-run fetch plan from a (N, 27) stride-1 neighbor map.

    Voxel rows are ravel-key sorted with z fastest (ops/voxelize), so the
    up-to-3 z-neighbors of each (dy, dx) kernel column occupy consecutive
    rows.  Returns ``(base (N, 9) int32, codes (N, 9, 3) int8)``:
    ``base[o, c]`` is the first row of output o / column c's z-run (clamped
    to [0, n_pad-3] so a 3-row fetch stays in bounds); ``codes[o, c, p]`` is
    the kernel z-offset (-1/0/+1) carried by fetched slot p, or -2 if that
    slot is not a neighbor.  Consumed by ops/sparse.sparse_conv_ztriple.

    The tap axis must be ordered z-fastest (kernel_offsets), i.e. tap
    index = c*3 + (dz+1) — true for every map this module builds.
    """
    if n_pad is None:
        n_pad = nbr.shape[0]
    big = np.iinfo(np.int64).max
    nbrr = nbr.reshape(-1, 9, 3).astype(np.int64)
    base = np.where(nbrr >= 0, nbrr, big).min(2)
    has = base != big
    base = np.where(has, np.minimum(base, n_pad - 3), 0)
    codes = np.full((len(nbr), 9, 3), -2, np.int8)
    for p in range(3):
        for d in range(3):
            m = has & (nbrr[:, :, d] == base + p)
            codes[:, :, p] = np.where(m, d - 1, codes[:, :, p])
    return base.astype(np.int32), codes


def build_compact_conv(nbr: np.ndarray, m_bucket: int = 1024,
                       light_slots: int = 8, row_bucket: int = 512
                       ) -> Dict[str, np.ndarray]:
    """Tap-compacted (CSR) conv plan from a (N, K) neighbor map.

    The padded gather conv fetches K x N rows although only ~18-48% of taps
    are valid (PERF.md valid-tap table).  This plan gathers ONLY the valid
    (output, tap) pairs and lets each output row collect its contributions
    from per-tap partial products by static addresses — no scatter anywhere:

      in_idx  (K, M)      input row per valid pair of tap k (pad -1);
                          the pair's flat partial address is k*M + j.
      slots_a (Na, light) partial addresses for outputs with <= light
                          valid taps (pad -1), in compact-row order.
      slots_b (Nb, K)     addresses for the remaining heavy outputs.

    Total random fetches ~ (valid_frac*K + light + heavy_frac*K + 1) * N
    vs K*N for the padded conv (~1.8x fewer at 3^3 surface occupancy).

    Runs per collate batch, so built with two flat nonzero passes (one
    tap-major for the pair lists, one row-major for the slot tables)
    instead of K per-tap column scans + a per-row argsort — the same
    host-hot-loop treatment the unified collate got.
    """
    n, k = nbr.shape
    valid = nbr >= 0
    cnt = valid.sum(1)

    cnt_t = valid.sum(0)
    m = int(cnt_t.max()) if n else 0
    m = max(m_bucket, int(np.ceil(m / m_bucket)) * m_bucket)
    in_idx = np.full((k, m), -1, np.int32)
    out_idx = np.full((k, m), -1, np.int32)   # pair's OUTPUT row (for dW)
    # flat partial address per (row, tap) pair; one tap-major nonzero pass
    # (rows ascending within each tap, matching the old per-tap scans)
    addr = np.full((n, k), -1, np.int64)
    t_idx, rows = np.nonzero(valid.T)
    starts = np.zeros(k, np.int64)
    np.cumsum(cnt_t[:-1], out=starts[1:])
    pos = np.arange(len(rows), dtype=np.int64) - starts[t_idx]
    in_idx[t_idx, pos] = nbr[rows, t_idx]
    out_idx[t_idx, pos] = rows
    addr[rows, t_idx] = t_idx * m + pos

    light = (cnt <= light_slots) & (cnt > 0)
    heavy = cnt > light_slots
    la = np.nonzero(light)[0]
    hb = np.nonzero(heavy)[0]

    def bucket_rows(x):
        return max(row_bucket, int(np.ceil(max(len(x), 1) / row_bucket))
                   * row_bucket)

    na, nb = bucket_rows(la), bucket_rows(hb)

    def compacted(rows, width):
        out = np.full((len(rows), width), -1, np.int32)
        if len(rows):
            a = addr[rows]                       # (R, K), -1 for invalid
            # row-major nonzero keeps each row's valid addresses in tap
            # order (same order the stable argsort produced)
            r_idx, t2 = np.nonzero(a >= 0)
            rc = (a >= 0).sum(1)
            rs = np.zeros(len(rows), np.int64)
            np.cumsum(rc[:-1], out=rs[1:])
            p = np.arange(len(r_idx), dtype=np.int64) - rs[r_idx]
            keep = p < width
            out[r_idx[keep], p[keep]] = a[r_idx[keep], t2[keep]]
        return out

    slots_a = np.full((na, light_slots), -1, np.int32)
    slots_a[:len(la)] = compacted(la, light_slots)
    slots_b = np.full((nb, k), -1, np.int32)
    slots_b[:len(hb)] = compacted(hb, k)
    # inverse map: output row -> its compact position (A first, then B;
    # zero-tap rows -> the trailing zero row na+nb)
    src = np.full(n, na + nb, np.int32)
    src[la] = np.arange(len(la), dtype=np.int32)
    src[hb] = na + np.arange(len(hb), dtype=np.int32)
    return {"in_idx": in_idx, "out_idx": out_idx, "slots_a": slots_a,
            "slots_b": slots_b, "src": src, "n_out": n}
