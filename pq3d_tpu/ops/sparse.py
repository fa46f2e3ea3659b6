"""Device-side sparse convolution: gather -> GEMM -> accumulate.

TPU-native replacement for MinkowskiEngine's kernel-map gather-GEMM-scatter
convolutions (reference external dep; used by
modules/third_party/mask3d/res16unet.py via common.py:128-198).

Formulation: every conv is a **gather** over a host-built neighbor map
(:mod:`pq3d_tpu.ops.kernel_maps`).  For output voxel ``j`` and kernel offset
``k``, ``nbr[j, k]`` indexes the contributing input voxel (-1 = missing):

    out[j] = sum_k  valid(nbr[j,k]) * x[nbr[j,k]] @ W[k]

Performance notes (measured on v5e):
* Row gathers MUST use ``lax.gather`` with ``PROMISE_IN_BOUNDS`` — the
  default jnp.take clip/fill mode falls off the fast path and is ~10x
  slower (~60 GB/s vs ~500 GB/s).  Indices are pre-clamped to [0, N).
* Matmuls run in bf16 on the MXU with f32 accumulation.
* No scatter in the backward pass: the VJP of gather is a scatter-add XLA
  handles natively.

Functions are single-scene; callers ``jax.vmap`` over the batch dimension.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))


def fast_row_gather(x: jnp.ndarray, idx: jnp.ndarray,
                    indices_are_sorted: bool = False) -> jnp.ndarray:
    """Gather rows of (N, C) by pre-clamped in-bounds indices on the TPU
    fast path (PROMISE_IN_BOUNDS)."""
    return jax.lax.gather(
        x, idx[:, None].astype(jnp.int32), _GATHER_DNUMS,
        slice_sizes=(1, x.shape[1]),
        indices_are_sorted=indices_are_sorted, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def sorted_conv_maps(nbr: jnp.ndarray) -> tuple:
    """(N, K) neighbor map -> (idx, valid) with per-tap MONOTONE indices.

    Voxel coords are ravel-key sorted (ops/voxelize.quantize, ascending at
    every hierarchy level), so each tap's valid neighbor indices are already
    monotone in the output row; missing rows (-1) carry the previous index
    via a running max, making the whole column sorted so the gather can use
    ``indices_are_sorted=True`` (the TPU fast-path hint).  Flat-batch maps
    stay monotone: per-scene offsets are non-decreasing and every scene-0
    index < the scene-1 offset.
    """
    valid = nbr >= 0
    idx = jax.lax.cummax(jnp.where(valid, nbr, -1), axis=0)
    return jnp.maximum(idx, 0), valid


def quantize_rows(x: jnp.ndarray, eps: float = 1e-6):
    """Per-channel symmetric int8 quantization of an (N, C) activation.

    Returns ``(q, s)`` with ``x ~= q * s`` (q int8, s (C,) f32).  Used by
    the ``int8_gather`` conv mode: the K per-tap row gathers read int8 rows
    (half the bf16 HBM traffic of the gather-bound convs, PERF.md lever 2)
    and the scale folds into the kernel weights, so the only extra work is
    one quantization pass per conv input.
    """
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=0), eps) / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def tap_unroll(n_rows: int, cin: int, cout: int) -> int:
    """Chip-tuned tap-loop unroll factor for the gather conv.

    The ``lax.scan`` over kernel taps serializes the 27 gathers; fully
    unrolling lets XLA software-pipeline independent gathers against the
    GEMMs.  Measured on v5e (chip_runs/0819b): unroll is 3.6-4.5x faster at
    C=256 (N<=16k), a wash at C<=128 mid-size, and ~20% SLOWER at the
    L0 shape (N~246k, C=96) where the loop is purely fetch-rate-bound and
    the unrolled HLO scheduling adds overhead.  Heuristic: unroll only
    where the win is proven — wide channels (>=256 on either side).

    TPU-only: the 27x-unrolled loop body makes XLA:CPU compiles explode
    (minutes-long, and observed to segfault the CPU backend compiler on
    this image), and the fetch-pipelining rationale is TPU-specific.
    """
    if jax.default_backend() != "tpu":
        return 1
    return 27 if max(cin, cout) >= 256 else 1


def sparse_conv(x: jnp.ndarray, nbr: jnp.ndarray, w: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_valid: Optional[jnp.ndarray] = None,
                compute_dtype=jnp.bfloat16,
                accum_dtype=jnp.float32,
                sorted_maps: bool = False,
                int8_gather: bool = False,
                unroll: Optional[int] = None) -> jnp.ndarray:
    """Sparse convolution via gather->GEMM.

    Args:
      x:    (N_in, Cin) or (B, N_in, Cin) voxel features (padded rows zero).
      nbr:  (N_out, K) / (B, N_out, K) int32 neighbor map, -1 for missing.
      w:    (K, Cin, Cout) kernel weights.
      bias: optional (Cout,).
      out_valid: optional (N_out,) / (B, N_out) bool mask.
      int8_gather: quantize the input per-channel to int8 before the K tap
        gathers and fold the scale into ``w`` (inference lever — the custom
        training VJPs re-gather from the unquantized input; quantization
        error is ~0.4% of the per-channel max, absorbed by the following BN).
    Returns: same leading shape as nbr, trailing Cout, in x.dtype.

    Batched inputs run as a ``lax.scan`` over scenes: per-scene gathers from
    a small (N_in, C) source run ~1.5x faster than one flat-batch gather and
    ~3x faster than vmapped batched-gather HLO (measured on v5e).
    """
    if x.ndim == 3:
        def per_scene(carry, inp):
            xs, ns = inp
            return carry, sparse_conv(xs, ns, w, bias, None,
                                      compute_dtype, accum_dtype,
                                      sorted_maps, int8_gather, unroll)
        _, out = jax.lax.scan(per_scene, 0, (x, nbr))
        if out_valid is not None:
            out = jnp.where(out_valid[..., None], out, 0)
        return out

    k_total = nbr.shape[1]
    if unroll is None:
        unroll = tap_unroll(nbr.shape[0], w.shape[1], w.shape[2])
    if int8_gather:
        xb, scale = quantize_rows(x)
        wb = w.astype(jnp.float32) * scale[None, :, None]
        wb = wb.astype(compute_dtype)
    else:
        xb = x.astype(compute_dtype)
        wb = w.astype(compute_dtype)
    if sorted_maps:
        mono_idx, mono_valid = sorted_conv_maps(nbr)

    def body(acc, inputs):
        idx, m, wk = inputs  # idx: (N_out,), wk: (Cin, Cout)
        xi = fast_row_gather(xb, idx, indices_are_sorted=sorted_maps)
        xi = jnp.where(m[:, None], xi, 0).astype(compute_dtype)
        # named for the 'gather_only' remat policy: these (N, Cin)-per-tap
        # residuals dominate training memory (~K x N x Cin); the policy
        # recomputes them in the backward instead of saving them
        xi = jax.ad_checkpoint.checkpoint_name(xi, "conv_gather")
        acc = acc + jnp.dot(xi, wk, preferred_element_type=accum_dtype)
        return acc, None

    init = jnp.zeros((nbr.shape[0], w.shape[-1]), dtype=accum_dtype)
    if sorted_maps:
        scan_in = (mono_idx.T, mono_valid.T, wb)
    else:
        scan_in = (jnp.maximum(nbr, 0).T, (nbr >= 0).T, wb)
    acc, _ = jax.lax.scan(body, init, scan_in, length=k_total,
                          unroll=min(unroll, k_total))
    if bias is not None:
        acc = acc + bias
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def sparse_conv_transpose(x: jnp.ndarray, parent: jnp.ndarray,
                          parent_off: jnp.ndarray, w: jnp.ndarray,
                          out_valid: Optional[jnp.ndarray] = None,
                          compute_dtype=jnp.bfloat16,
                          accum_dtype=jnp.float32,
                          int8_gather: bool = False) -> jnp.ndarray:
    """Stride-2 transposed (upsampling) convolution, kernel 2^3.

    Each fine voxel has exactly one coarse parent and a kernel offset id, so
    the transpose conv is: precompute the 8 GEMMs on the (small) coarse level,
    then one gather per fine voxel — FLOPs equal to the matching down-conv
    (ref conv_tr in res16unet.py:138-219).

    Args:
      x:          (N_coarse, Cin) or (B, N_coarse, Cin) coarse features.
      parent:     (N_fine,) / (B, N_fine) int32 parent index, -1 for pads.
      parent_off: (N_fine,) / (B, N_fine) int32 kernel offset id in [0, 8).
      w:          (8, Cin, Cout).
      int8_gather: quantize the 8 per-offset GEMM OUTPUTS to int8 before
        the per-fine-voxel gather (halves the gather traffic; dequantized
        per-channel after — inference lever like sparse_conv's).
    Returns: (..., N_fine, Cout).
    """
    if x.ndim == 3:
        def per_scene(carry, inp):
            xs, ps, po = inp
            return carry, sparse_conv_transpose(xs, ps, po, w, None,
                                                compute_dtype, accum_dtype,
                                                int8_gather)
        _, out = jax.lax.scan(per_scene, 0, (x, parent, parent_off))
        if out_valid is not None:
            out = jnp.where(out_valid[..., None], out, 0)
        return out

    n_coarse = x.shape[0]
    y = jnp.einsum("nc,kcd->knd", x.astype(compute_dtype),
                   w.astype(compute_dtype),
                   preferred_element_type=accum_dtype)  # (8, Nc, Cout)
    y = y.reshape(8 * n_coarse, -1)
    flat = parent_off * n_coarse + jnp.maximum(parent, 0)
    if int8_gather:
        q, scale = quantize_rows(y)
        out = fast_row_gather(q, flat).astype(compute_dtype) * scale
    else:
        out = fast_row_gather(y, flat)
    out = jnp.where((parent >= 0)[:, None], out, 0)
    if out_valid is not None:
        out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(x.dtype)


def pool_transpose(x_coarse: jnp.ndarray, ancestor: jnp.ndarray,
                   valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Broadcast coarse features to fine voxels by ancestor index.

    Replaces chained ``MinkowskiPoolingTranspose`` upsampling
    (ref: modules/vision/pcd_mask3d_encoder.py:131-137): each level-0 voxel
    takes the feature of its ancestor at the coarse level.
    """
    out = fast_row_gather(x_coarse, jnp.maximum(ancestor, 0))
    if valid is not None:
        out = jnp.where(valid[:, None], out, 0)
    return out


def avg_pool_stride2(x: jnp.ndarray, child: jnp.ndarray) -> jnp.ndarray:
    """Average-pool fine features into coarse voxels via the child map."""
    m = child >= 0
    n_coarse, k = child.shape
    flat = fast_row_gather(x, jnp.maximum(child, 0).reshape(-1))
    xi = flat.reshape(n_coarse, k, -1)
    xi = jnp.where(m[..., None], xi, 0)
    cnt = jnp.maximum(m.sum(axis=1, keepdims=True), 1)
    return xi.sum(axis=1) / cnt


def _unpack_cells(y_cells: jnp.ndarray, slot: jnp.ndarray,
                  c2v: jnp.ndarray) -> jnp.ndarray:
    """Gather per-cell rows back to per-voxel rows with a scatter-free VJP.

    ``slot[i]`` is voxel i's flat cell index (-1 = padded voxel); ``c2v[s]``
    is the voxel occupying cell s (-1 = empty).  The backward runs the dual
    gather through ``c2v`` instead of XLA's scatter-add.
    """

    # maps ride the custom_vjp as residuals, never bwd closures (a closed-
    # over map tracer leaks out of an enclosing remat trace — see
    # sparse_conv_sym)
    @jax.custom_vjp
    def f(y, slot, c2v):
        out = fast_row_gather(y, jnp.maximum(slot, 0))
        return jnp.where((slot >= 0)[:, None], out, 0)

    def fwd(y, slot, c2v):
        return f(y, slot, c2v), c2v

    def bwd(c2v, dy):
        dyc = fast_row_gather(dy, jnp.maximum(c2v, 0))
        return jnp.where((c2v >= 0)[:, None], dyc, 0), None, None

    f.defvjp(fwd, bwd)
    return f(y_cells, slot, c2v)


def conv0_dense_block(dense_in: jnp.ndarray, nbr_win: jnp.ndarray,
                      slot: jnp.ndarray, c2v: jnp.ndarray, w: jnp.ndarray,
                      out_valid: Optional[jnp.ndarray] = None,
                      block: int = 8, kernel: int = 5,
                      compute_dtype=jnp.bfloat16,
                      accum_dtype=jnp.float32) -> jnp.ndarray:
    """Stem convolution as a dense block conv (MXU path, no per-row gathers).

    The 125-tap gathered stem (``sparse_conv`` on the 5^3 map) is
    row-fetch-bound: 125 x N tiny-row gathers dominate the U-Net forward
    (PERF.md "conv0 5^3 stem").  Here the host packs level-0 voxels into
    dense ``block^3`` cells (ops/window_maps.py with_neighbors=True); on
    device each block DMAs whole-block halos from its 26 neighbors (27
    LARGE-row gathers of ``block^3 * Cin`` each) and the 5^3 conv runs as a
    dense ``lax.conv_general_dilated`` — pure MXU work whose FLOP waste at
    surface occupancy is trivially repaid at Cin=3.

    Args:
      dense_in: (NB, block^3 * Cin) packed blocks, empty cells zero.
      nbr_win:  (NB, 27) neighbor block ids (kernel_offsets(3) order, -1
                missing; center tap = the block itself).
      slot:     (N,) flat cell index per voxel (-1 padded voxel).
      c2v:      (NB * block^3,) voxel id per cell (-1 empty) — backward map.
      w:        (kernel^3, Cin, Cout) in kernel_offsets(kernel) order.
    Returns: (N, Cout).
    """
    p = kernel // 2
    nb = dense_in.shape[0]
    cin = dense_in.shape[1] // block ** 3
    cout = w.shape[-1]
    h = block + 2 * p
    xb = dense_in.astype(compute_dtype)

    halo = jnp.zeros((nb, h, h, h, cin), compute_dtype)
    # src/dst slice per axis offset: o=-1 -> src [block-p, block) dst [0, p)
    ax = {-1: (block - p, p, 0), 0: (0, block, p), 1: (0, p, p + block)}
    t = 0
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                idx = nbr_win[:, t]
                src = fast_row_gather(xb, jnp.maximum(idx, 0))
                src = jnp.where((idx >= 0)[:, None], src, 0)
                src = src.reshape(nb, block, block, block, cin)
                (sx, lx, dx), (sy, ly, dy), (sz, lz, dz) = ax[ox], ax[oy], ax[oz]
                halo = halo.at[:, dx:dx + lx, dy:dy + ly, dz:dz + lz, :].set(
                    src[:, sx:sx + lx, sy:sy + ly, sz:sz + lz, :])
                t += 1
    w5 = w.reshape(kernel, kernel, kernel, cin, cout).astype(compute_dtype)
    dn = ("NDHWC", "DHWIO", "NDHWC")

    # honor the configured accumulation dtype like the gathered stem does
    # (A/B comparisons must compare equal numerics).  conv's transpose rule
    # rejects the mixed dtypes that preferred_element_type=accum creates
    # (f32 cotangent vs bf16 operands), so the backward runs through a
    # same-dtype conv — the MXU accumulates f32 internally regardless.
    @jax.custom_vjp
    def halo_conv(h, wk):
        y = jax.lax.conv_general_dilated(
            h, wk, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=dn, preferred_element_type=accum_dtype)
        return y.astype(compute_dtype)

    def halo_fwd(h, wk):
        return halo_conv(h, wk), (h, wk)

    def halo_bwd(res, g):
        h, wk = res
        _, vjp = jax.vjp(lambda a, b: jax.lax.conv_general_dilated(
            a, b, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=dn), h, wk)
        return vjp(g.astype(compute_dtype))

    halo_conv.defvjp(halo_fwd, halo_bwd)
    y = halo_conv(halo, w5).reshape(nb * block ** 3, cout)
    out = _unpack_cells(y, slot, c2v)
    if out_valid is not None:
        out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(dense_in.dtype)


# ---------------------------------------------------------------------------
# scatter-free training convs (custom VJPs)
#
# The VJP XLA derives for gather is scatter-add — measured ~6 GB/s on v5e,
# the dominant backward cost.  But every kernel map here has an exact
# transpose map: a symmetric stencil (odd kernel, lexicographic offsets)
# satisfies nbr[i, k] = j  <=>  nbr[j, K-1-k] = i, and the stride-2
# child/parent/parent_off maps are duals by construction
# (ops/kernel_maps.py build_child_map).  So dx is ANOTHER gather-GEMM conv
# with flipped+transposed weights, and dW re-gathers its inputs instead of
# storing them — the backward runs entirely on the gather fast path and the
# K x N x C gathered activations are never materialized as residuals.
# ---------------------------------------------------------------------------


# (fetched slot p, kernel z-offset dz) pairs that can occur in a z-run
# fetch: voxel keys are row-major ravel-sorted with z fastest
# (ops/voxelize.ravel_hash), so the up-to-3 z-neighbors of a column occupy
# consecutive rows starting at the run base; slot 0 is the first existing
# neighbor (dz -1/0/+1), slot 1 can only be dz 0/+1, slot 2 only dz +1.
_ZT_COMBOS = ((0, -1), (0, 0), (0, 1), (1, 0), (1, 1), (2, 1))


def ztriple_applicable(n_rows: int, cin: int, cout: int) -> bool:
    """Chip-tuned predicate: does the z-run conv beat the 27-tap gather?

    Measured on v5e (chip_runs/0819b): wins 1.9-2.4x at C<=64 (3C-lane rows
    stay within one fetch granule) and at (16k rows, C=128); loses at
    (41k, 128), (131k, 96) and (245k, 96) where the 3x-materialized source
    and mask-select overhead outweigh the 27->9 fetch reduction.  C>=256
    shapes route to the unrolled tap loop instead (tap_unroll)."""
    c = max(cin, cout)
    if c >= 256:
        return False
    if c <= 64:
        return True
    return n_rows * c <= 5_000_000


def sparse_conv_ztriple(x: jnp.ndarray, zbase: jnp.ndarray,
                        zcode: jnp.ndarray, w: jnp.ndarray,
                        out_valid: Optional[jnp.ndarray] = None,
                        compute_dtype=jnp.bfloat16,
                        accum_dtype=jnp.float32) -> jnp.ndarray:
    """3^3 sparse conv via z-run fetches: 9 wide gathers instead of 27.

    Voxel rows are ravel-key sorted with z fastest, so for each output row
    and each of the 9 (dy, dx) kernel columns the up-to-3 z-neighbors sit in
    consecutive input rows.  We materialize ``x3[i] = [x[i-1], x[i], x[i+1]]``
    (two rolls + concat, contiguous) and fetch ONE (3*Cin)-lane row per
    column at ``zbase+1``; host-built ``zcode`` says which fetched slot
    carries which kernel z-offset (-2 = none), and 6 masked adds re-align
    the slots before the per-offset GEMMs.  FLOPs match the baseline conv;
    HBM fetch count drops 3x (PERF.md round-3 ladder).

    Args:
      x:     (N, Cin) flat voxel features (padded rows zero).
      zbase: (N_out, 9) int32 run base rows (host: kernel_maps.build_ztriple_plan).
      zcode: (N_out, 9, 3) int8 kernel z-offset per fetched slot, -2 = none.
      w:     (27, Cin, Cout), tap order z-fastest (kernel_maps.kernel_offsets).
    """
    cin, cout = w.shape[1], w.shape[2]
    n = x.shape[0]
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    x3 = jnp.concatenate([jnp.roll(xb, 1, 0), xb, jnp.roll(xb, -1, 0)],
                         axis=1)
    acc = jnp.zeros((zbase.shape[0], cout), accum_dtype)
    for c in range(9):
        trip = fast_row_gather(x3, jnp.minimum(zbase[:, c] + 1, n - 1))
        trip = jax.ad_checkpoint.checkpoint_name(trip, "conv_gather")
        trip = trip.reshape(-1, 3, cin)
        for dz in (-1, 0, 1):
            xi = jnp.zeros((zbase.shape[0], cin), compute_dtype)
            for p in range(3):
                if (p, dz) not in _ZT_COMBOS:
                    continue
                m = zcode[:, c, p] == dz
                xi = xi + jnp.where(m[:, None], trip[:, p], 0)
            acc = acc + jnp.dot(xi, wb[c * 3 + dz + 1],
                                preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def _ztriple_weight_grad(x: jnp.ndarray, zbase: jnp.ndarray,
                         zcode: jnp.ndarray, dy: jnp.ndarray,
                         compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """dW[c*3+dz+1] = select(x via z-run fetch)^T @ dy — re-gathers through
    the same plan instead of storing the 27 x N x Cin activations."""
    cin = x.shape[1]
    n = x.shape[0]
    xb = x.astype(compute_dtype)
    dyb = dy.astype(compute_dtype)
    x3 = jnp.concatenate([jnp.roll(xb, 1, 0), xb, jnp.roll(xb, -1, 0)],
                         axis=1)
    dws = []
    for c in range(9):
        trip = fast_row_gather(x3, jnp.minimum(zbase[:, c] + 1, n - 1))
        trip = trip.reshape(-1, 3, cin)
        for dz in (-1, 0, 1):
            xi = jnp.zeros((zbase.shape[0], cin), compute_dtype)
            for p in range(3):
                if (p, dz) not in _ZT_COMBOS:
                    continue
                m = zcode[:, c, p] == dz
                xi = xi + jnp.where(m[:, None], trip[:, p], 0)
            dws.append(jnp.dot(xi.T, dyb,
                               preferred_element_type=jnp.float32))
    return jnp.stack(dws)


def sparse_conv_ztriple_sym(x: jnp.ndarray, zbase: jnp.ndarray,
                            zcode: jnp.ndarray, w: jnp.ndarray,
                            out_valid: Optional[jnp.ndarray] = None,
                            compute_dtype=jnp.bfloat16,
                            accum_dtype=jnp.float32) -> jnp.ndarray:
    """z-run conv with the scatter-free symmetric-stencil backward.

    Same duality as :func:`sparse_conv_sym`: the 3^3 stencil is symmetric,
    so dx = conv(dy, nbr, flip_k(W)^T); and since the z-run conv computes
    exactly conv(., nbr, .) for any weights, the SAME plan evaluates dx.
    Maps ride the custom_vjp as residuals (see sparse_conv_sym).
    """

    @jax.custom_vjp
    def f(x, w, maps):
        return sparse_conv_ztriple(x, maps[0], maps[1], w, maps[2],
                                   compute_dtype, accum_dtype)

    def fwd(x, w, maps):
        return f(x, w, maps), (x, w, maps)

    def bwd(res, dy):
        x, w, (zbase, zcode, o_valid) = res
        dy = _mask_rows(dy, o_valid)
        w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)
        dx = sparse_conv_ztriple(dy, zbase, zcode, w_t, None,
                                 compute_dtype, accum_dtype).astype(x.dtype)
        dw = _ztriple_weight_grad(x, zbase, zcode, dy,
                                  compute_dtype).astype(w.dtype)
        return dx, dw, None

    f.defvjp(fwd, bwd)
    return f(x, w, (zbase, zcode, out_valid))


def _mask_rows(dy: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    return dy if valid is None else jnp.where(valid[:, None], dy, 0)


def _conv_weight_grad(x: jnp.ndarray, nbr: jnp.ndarray, dy: jnp.ndarray,
                      compute_dtype=jnp.bfloat16,
                      sorted_maps: bool = False) -> jnp.ndarray:
    """dW[k] = gather(x, nbr[:, k])^T @ dy, one (Cin, N)@(N, Cout) GEMM per
    tap (re-gathers instead of using stored activations)."""
    xb = x.astype(compute_dtype)
    dyb = dy.astype(compute_dtype)
    if sorted_maps:
        idx_all, valid_all = sorted_conv_maps(nbr)
    else:
        idx_all, valid_all = jnp.maximum(nbr, 0), nbr >= 0

    def body(_, inp):
        idx, m = inp
        xi = fast_row_gather(xb, idx, indices_are_sorted=sorted_maps)
        xi = jnp.where(m[:, None], xi, 0)
        return _, jnp.dot(xi.T, dyb, preferred_element_type=jnp.float32)

    _, dw = jax.lax.scan(body, 0, (idx_all.T, valid_all.T),
                         unroll=tap_unroll(nbr.shape[0], x.shape[1],
                                           dy.shape[1]))
    return dw


def sparse_conv_sym(x: jnp.ndarray, nbr: jnp.ndarray, w: jnp.ndarray,
                    out_valid: Optional[jnp.ndarray] = None,
                    compute_dtype=jnp.bfloat16,
                    accum_dtype=jnp.float32,
                    sorted_maps: bool = False) -> jnp.ndarray:
    """Same-level symmetric-stencil conv with a scatter-free backward.

    dx = conv(dy, nbr, flip_k(W)^T): valid because for lexicographic odd
    offsets, tap K-1-k is the negated offset of tap k.

    The maps travel through the custom_vjp as ARGUMENTS/residuals, never as
    closures: a bwd closure over a map tracer leaks it out of any enclosing
    remat trace (UnexpectedTracerError under nn.remat + grad — the maps are
    remat-boundary arguments there).  Same pattern in every custom-VJP conv
    below.
    """

    @jax.custom_vjp
    def f(x, w, nbr, out_valid):
        return sparse_conv(x, nbr, w, None, out_valid,
                           compute_dtype, accum_dtype, sorted_maps)

    def fwd(x, w, nbr, out_valid):
        return f(x, w, nbr, out_valid), (x, w, nbr, out_valid)

    def bwd(res, dy):
        # two passes (dx conv, then dW re-gather) measured FASTER than a
        # fused single scan sharing the dy gathers (2.29 vs 2.52 s/step at
        # bench scale — the fused body's transposed x^T@g GEMM pipelines
        # poorly against the loop-carried dx accumulator)
        x, w, nbr, out_valid = res
        dy = _mask_rows(dy, out_valid)
        w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)
        dx = sparse_conv(dy, nbr, w_t, None, None,
                         compute_dtype, accum_dtype, sorted_maps).astype(x.dtype)
        dw = _conv_weight_grad(x, nbr, dy, compute_dtype,
                               sorted_maps).astype(w.dtype)
        return dx, dw, None, None

    f.defvjp(fwd, bwd)
    return f(x, w, nbr, out_valid)


def sparse_conv_down(x: jnp.ndarray, child: jnp.ndarray, w: jnp.ndarray,
                     parent: jnp.ndarray, parent_off: jnp.ndarray,
                     out_valid: Optional[jnp.ndarray] = None,
                     in_valid: Optional[jnp.ndarray] = None,
                     compute_dtype=jnp.bfloat16,
                     accum_dtype=jnp.float32,
                     sorted_maps: bool = False) -> jnp.ndarray:
    """Stride-2 down conv over the child map (N_coarse, 8) with the
    transpose realized through the dual parent/parent_off maps.
    Maps ride the custom_vjp as residuals (see sparse_conv_sym)."""

    @jax.custom_vjp
    def f(x, w, maps):
        return sparse_conv(x, maps[0], w, None, maps[3],
                           compute_dtype, accum_dtype, sorted_maps)

    def fwd(x, w, maps):
        return f(x, w, maps), (x, w, maps)

    def bwd(res, dy):
        x, w, (child, parent, parent_off, o_valid, i_valid) = res
        dy = _mask_rows(dy, o_valid)
        dx = sparse_conv_transpose(
            dy, parent, parent_off, w.transpose(0, 2, 1), i_valid,
            compute_dtype, accum_dtype).astype(x.dtype)
        # dW[k] = sum_{fine: off==k} x[fine]^T dy[parent(fine)]: one gather
        # of dy through the parent map, then 8 masked GEMMs (instead of 8
        # gathers of x through the child map)
        dyg = fast_row_gather(dy.astype(compute_dtype),
                              jnp.maximum(parent, 0))
        dyg = jnp.where((parent >= 0)[:, None], dyg, 0)
        xb = x.astype(compute_dtype)

        def body(_, k):
            sel = jnp.where((parent_off == k)[:, None], xb, 0)
            return _, jnp.dot(sel.T, dyg, preferred_element_type=jnp.float32)

        _, dw = jax.lax.scan(body, 0, jnp.arange(w.shape[0]))
        return dx, dw.astype(w.dtype), None

    f.defvjp(fwd, bwd)
    return f(x, w, (child, parent, parent_off, out_valid, in_valid))


def sparse_conv_transpose_gf(x: jnp.ndarray, parent: jnp.ndarray,
                             parent_off: jnp.ndarray, w: jnp.ndarray,
                             child: jnp.ndarray,
                             out_valid: Optional[jnp.ndarray] = None,
                             in_valid: Optional[jnp.ndarray] = None,
                             compute_dtype=jnp.bfloat16,
                             accum_dtype=jnp.float32,
                             sorted_maps: bool = False) -> jnp.ndarray:
    """Stride-2 transpose (up) conv with gather-only backward via the dual
    child map: dx[c] = sum_k dy[child[c, k]] @ W[k]^T.
    Maps ride the custom_vjp as residuals (see sparse_conv_sym)."""

    @jax.custom_vjp
    def f(x, w, maps):
        return sparse_conv_transpose(x, maps[0], maps[1], w, maps[3],
                                     compute_dtype, accum_dtype)

    def fwd(x, w, maps):
        return f(x, w, maps), (x, w, maps)

    def bwd(res, dy):
        x, w, (parent, parent_off, child, o_valid, i_valid) = res
        dy = _mask_rows(dy, o_valid)
        dx = sparse_conv(dy, child, w.transpose(0, 2, 1), None, i_valid,
                         compute_dtype, accum_dtype, sorted_maps).astype(x.dtype)
        # dW[k] = sum_{fine: off==k} x[parent(fine)]^T dy[fine]
        xg = fast_row_gather(x.astype(compute_dtype),
                             jnp.maximum(parent, 0))
        xg = jnp.where((parent >= 0)[:, None], xg, 0)
        dyb = dy.astype(compute_dtype)

        def body(_, k):
            sel = jnp.where((parent_off == k)[:, None], xg, 0)
            return _, jnp.dot(sel.T, dyb, preferred_element_type=jnp.float32)

        _, dw = jax.lax.scan(body, 0, jnp.arange(w.shape[0]))
        return dx, dw.astype(w.dtype), None

    f.defvjp(fwd, bwd)
    return f(x, w, (parent, parent_off, child, out_valid, in_valid))


def sparse_conv_compact(x: jnp.ndarray, plan: dict, w: jnp.ndarray,
                        out_valid: Optional[jnp.ndarray] = None,
                        compute_dtype=jnp.bfloat16,
                        accum_dtype=jnp.float32,
                        int8_gather: bool = False) -> jnp.ndarray:
    """Tap-compacted conv (ops/kernel_maps.build_compact_conv plan).

    Gathers ONLY valid (output, tap) pairs (~valid_frac*K*N rows instead of
    K*N), runs one GEMM per tap on the compacted rows, and each output row
    collects its <=K partial products by static addresses — light rows
    (<=8 taps) and heavy rows are separate fixed-width groups, then one
    inverse-permutation gather re-orders to the output layout.  No scatter
    anywhere.  Inference-oriented: the backward is native autodiff (gather
    VJPs -> scatter-add); use the padded scatter-free convs for training.
    """
    k, m = plan["in_idx"].shape
    cout = w.shape[-1]
    if int8_gather:
        # composes with the compaction: the ~valid_frac*K*N gathered rows
        # shrink 2x again (see sparse_conv's int8_gather; inference only)
        xb, scale = quantize_rows(x)
        wb = (w.astype(jnp.float32)
              * scale[None, :, None]).astype(compute_dtype)
    else:
        xb = x.astype(compute_dtype)
        wb = w.astype(compute_dtype)

    def tap(_, inp):
        idx, wk = inp
        ok = idx >= 0
        xi = fast_row_gather(xb, jnp.maximum(idx, 0))
        xi = jnp.where(ok[:, None], xi, 0).astype(compute_dtype)
        return _, jnp.dot(xi, wk, preferred_element_type=compute_dtype)

    _, z = jax.lax.scan(tap, 0, (plan["in_idx"], wb))      # (K, M, Cout)
    z = jnp.concatenate([z.reshape(k * m, cout),
                         jnp.zeros((1, cout), compute_dtype)])

    def collect(slots):
        acc = jnp.zeros((slots.shape[0], cout), accum_dtype)
        for s in range(slots.shape[1]):                     # static unroll
            a = slots[:, s]
            zi = fast_row_gather(z, jnp.where(a >= 0, a, k * m))
            acc = acc + zi.astype(accum_dtype)
        return acc

    acc_a = collect(plan["slots_a"])
    acc_b = collect(plan["slots_b"])
    allacc = jnp.concatenate(
        [acc_a, acc_b, jnp.zeros((1, cout), accum_dtype)])
    out = fast_row_gather(allacc, plan["src"])
    if out_valid is not None:
        out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(x.dtype)


def sparse_conv_compact_sym(x: jnp.ndarray, plan: dict, w: jnp.ndarray,
                            out_valid: Optional[jnp.ndarray] = None,
                            compute_dtype=jnp.bfloat16,
                            accum_dtype=jnp.float32) -> jnp.ndarray:
    """Tap-compacted conv with a scatter-free SYMMETRIC-stencil backward.

    For an odd lexicographic stencil the pair relation is self-dual
    (``nbr[i,k]=j <=> nbr[j,K-1-k]=i``), so the SAME compact plan computes
    dx with flipped+transposed weights, and dW re-gathers only the valid
    pairs: ``dW[k] = gather(x, in_idx[k])^T @ gather(dy, out_idx[k])``.
    The backward's random fetches shrink by the same ~2x as the forward's.
    Plan arrays ride the custom_vjp as residuals (see sparse_conv_sym).
    """

    @jax.custom_vjp
    def f(x, w, plan, out_valid):
        return sparse_conv_compact(x, plan, w, out_valid,
                                   compute_dtype, accum_dtype)

    def fwd(x, w, plan, out_valid):
        return f(x, w, plan, out_valid), (x, w, plan, out_valid)

    def bwd(res, dy):
        x, w, plan, o_valid = res
        dy = _mask_rows(dy, o_valid)
        w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)
        dx = sparse_conv_compact(dy, plan, w_t, None,
                                 compute_dtype, accum_dtype).astype(x.dtype)
        xb = x.astype(compute_dtype)
        dyb = dy.astype(compute_dtype)

        def tap(_, inp):
            iidx, oidx = inp
            ok = iidx >= 0
            xi = fast_row_gather(xb, jnp.maximum(iidx, 0))
            xi = jnp.where(ok[:, None], xi, 0)
            gi = fast_row_gather(dyb, jnp.maximum(oidx, 0))
            gi = jnp.where(ok[:, None], gi, 0)
            return _, jnp.dot(xi.T, gi, preferred_element_type=jnp.float32)

        _, dw = jax.lax.scan(tap, 0, (plan["in_idx"], plan["out_idx"]))
        return dx, dw.astype(w.dtype), None, None

    f.defvjp(fwd, bwd)
    return f(x, w, plan, out_valid)
