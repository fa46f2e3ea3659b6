"""Pallas windowed z-run sparse convolution (the fetch-floor breaker).

The 27-tap gather conv is bound by the TPU gather unit's effective random-row
bandwidth (~70 GB/s measured on v5e — PERF.md round-3 profile), 10x under the
HBM streaming rate.  This kernel replaces the random gathers with streaming
DMA + an in-VMEM gather realized on the MXU:

  * taps are grouped into the 9 (dy, dx) kernel columns of the z-run plan
    (ops/kernel_maps.build_ztriple_plan): voxel rows are ravel-sorted with z
    fastest, so each column's up-to-3 z-neighbors are CONSECUTIVE rows;
  * per (output tile, column) the host computes a contiguous source window
    [win_lo, win_lo+W) that contains the column's run bases for ~99% of rows
    (rest go to a tiny XLA exception pass);
  * the kernel DMAs the 9 windows per tile HBM->VMEM (double-buffered across
    grid steps, full streaming bandwidth) and gathers each z-slot with a
    one-hot matmul  trip_p = (lanes == base_local + p) @ window  — the MXU
    does the redistribution instead of the gather unit;
  * host-precomputed bf16 selection masks (which fetched slot carries which
    kernel z-offset) combine the slots per z-offset, then 27 small GEMMs
    against the tap weights accumulate the convolution.

Semantics match ops/sparse.sparse_conv(x, nbr, w) for stride-1 3^3 maps
(reference: MinkowskiConvolution, mask3d/common.py:128-198).  Flat-pack
layouts only (single flat (N, C) source; rows ravel-sorted per scene).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pq3d_tpu.ops import kernel_maps
from pq3d_tpu.ops.sparse import fast_row_gather

# (fetched slot p, kernel z-offset dz) combinations that can occur when the
# run base is the column's first valid row (same table as ops/sparse).
_COMBOS = ((0, -1), (0, 0), (0, 1), (1, 0), (1, 1), (2, 1))
_BIG = np.int32(1 << 24)  # base_local sentinel: never matches a window lane


def build_pallas_zt_plan(nbr: np.ndarray, tile: int = 128,
                         window: int = 384,
                         exc_bucket: int = 512) -> Dict[str, np.ndarray]:
    """Host plan for :func:`pallas_zt_conv` from a (N, 27) stride-1 map.

    N must be a multiple of ``tile`` (flat-pack caps are power-of-two
    bucketed, so this holds).  Returns a dict of device-ready arrays:

      win_lo     (T*9,) int32   8-aligned window start per (tile, column)
      base_local (N, 16) int32  run base relative to the window (cols 9..15
                                pad); out-of-window/invalid -> big sentinel
      msel       (N, 64) f32    per-(column, slot, dz) selection mask in
                                _COMBOS order (6 lanes per column, pad to 64)
      exc_base/exc_out (9, E)   exception z-run bases / output rows (pad -1)
      exc_msel   (9, E, 6)      exception selection masks
    """
    n, k = nbr.shape
    assert k == 27 and n % tile == 0, (n, k, tile)
    zbase, zcode = kernel_maps.build_ztriple_plan(nbr, n)
    has = (zcode != -2).any(2)                              # (N, 9)
    t = n // tile
    bt = zbase.reshape(t, tile, 9)
    ht = has.reshape(t, tile, 9)
    lo = np.where(ht, bt, np.int64(1 << 62)).min(1)          # (T, 9)
    lo = np.where(lo == 1 << 62, 0, lo)
    lo = np.clip(lo, 0, max(n - window, 0)) & ~np.int64(7)
    rel = zbase.astype(np.int64) - np.repeat(lo, tile, axis=0)
    inw = has & (rel >= 0) & (rel <= window - 3)
    base_local = np.where(inw, rel, _BIG).astype(np.int32)
    base_local = np.pad(base_local, ((0, 0), (0, 7)),
                        constant_values=_BIG)               # (N, 16)

    msel = np.stack([zcode[:, :, p] == dz for p, dz in _COMBOS], 2)
    msel = msel & inw[:, :, None]                           # (N, 9, 6)
    msel = np.pad(msel.reshape(n, 54).astype(np.float32),
                  ((0, 0), (0, 10)))                        # (N, 64)

    ej, ec = np.nonzero(has & ~inw)
    counts = np.bincount(ec, minlength=9)
    e_pad = max(exc_bucket, int(np.ceil(max(counts.max(), 1)
                                        / exc_bucket) * exc_bucket))
    exc_base = np.zeros((9, e_pad), np.int32)
    exc_out = np.full((9, e_pad), -1, np.int32)
    exc_msel = np.zeros((9, e_pad, 6), np.float32)
    if len(ej):
        order = np.argsort(ec, kind="stable")
        slot = np.arange(len(ej)) - np.concatenate(
            [[0], np.cumsum(counts)])[ec[order]]
        exc_base[ec[order], slot] = zbase[ej[order], ec[order]]
        exc_out[ec[order], slot] = ej[order]
        exc_msel[ec[order], slot] = np.stack(
            [zcode[ej[order], ec[order], p] == dz for p, dz in _COMBOS],
            1).astype(np.float32)
    return {"win_lo": lo.reshape(-1).astype(np.int32),
            "base_local": base_local, "msel": msel,
            "exc_base": exc_base, "exc_out": exc_out, "exc_msel": exc_msel,
            # the raw z-run plan: pallas_zt_conv_sym's weight-grad re-gather
            # needs it (device_zt_plan ships it too)
            "zbase": zbase, "zcode": zcode,
            "tile": tile, "window": window, "n_exceptions": int(len(ej))}


def _kernel(win_lo_ref, base_ref, msel_ref, w_ref, x_hbm, o_ref,
            xwin, sem, *, tile, window, cin_p, cout_p):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def start(slot, tt):
        for c in range(9):
            lo = pl.multiple_of(win_lo_ref[tt * 9 + c], 8)
            pltpu.make_async_copy(x_hbm.at[pl.ds(lo, window), :],
                                  xwin.at[slot, c], sem.at[slot, c]).start()

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _first():
        start(0, 0)

    @pl.when(t + 1 < n_tiles)
    def _prefetch():
        start(jax.lax.rem(t + 1, 2), t + 1)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
    acc = jnp.zeros((tile, cout_p), jnp.float32)
    for c in range(9):
        lo = pl.multiple_of(win_lo_ref[t * 9 + c], 8)
        pltpu.make_async_copy(x_hbm.at[pl.ds(lo, window), :],
                              xwin.at[slot, c], sem.at[slot, c]).wait()
        xw = xwin[slot, c]                                   # (W, Cin_p)
        base = base_ref[:, c][:, None]                       # (tile, 1)
        trips = []
        for p in range(3):
            oh = (lanes == base + p).astype(jnp.bfloat16)
            trips.append(jnp.dot(oh, xw,
                                 preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16))
        # combine fetched slots per kernel z-offset via host masks
        for dzi, dz in enumerate((-1, 0, 1)):
            xi = jnp.zeros((tile, cin_p), jnp.bfloat16)
            for ci, (p, cdz) in enumerate(_COMBOS):
                if cdz != dz:
                    continue
                m = msel_ref[:, c * 6 + ci][:, None].astype(jnp.bfloat16)
                xi = xi + m * trips[p]
            acc = acc + jnp.dot(xi, w_ref[c * 3 + dzi],
                                preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _exception_add(out: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray,
                   exc_base: jnp.ndarray, exc_out: jnp.ndarray,
                   exc_msel: jnp.ndarray,
                   compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Out-of-window (column, row) pairs via plain XLA gathers + scatter."""
    n = x.shape[0]
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    for c in range(9):
        b = exc_base[c]
        ok = exc_out[c] >= 0
        trips = [fast_row_gather(xb, jnp.minimum(b + p, n - 1))
                 for p in range(3)]
        contrib = jnp.zeros((b.shape[0], w.shape[2]), jnp.float32)
        for dzi, dz in enumerate((-1, 0, 1)):
            xi = jnp.zeros_like(trips[0])
            for ci, (p, cdz) in enumerate(_COMBOS):
                if cdz != dz:
                    continue
                xi = xi + exc_msel[c, :, ci, None].astype(compute_dtype) \
                    * trips[p]
            contrib = contrib + jnp.dot(
                xi, wb[c * 3 + dzi], preferred_element_type=jnp.float32)
        contrib = jnp.where(ok[:, None], contrib, 0).astype(out.dtype)
        out = out.at[jnp.maximum(exc_out[c], 0)].add(
            contrib, mode="promise_in_bounds")
    return out


def pallas_zt_applicable(n_rows: int, cin: int, cout: int) -> bool:
    """Chip-tuned predicate: route to the windowed pallas conv.

    Measured on v5e (chip_runs/0819d): wins 1.4-5.7x exactly where neither
    the z-run gather (ztriple_applicable) nor the tap unroll could move the
    gather conv — the mid/wide-channel large-N shapes at the random-fetch
    floor: (245k, 96) 1.51x, (131k, 96) 1.39x, (41k, 128) 5.7x.  At C<=64
    or small N the z-run gather stays ahead; C>=256 routes to tap_unroll.
    """
    import os

    from pq3d_tpu.ops import sparse as _sparse
    min_rows = 40960
    if os.environ.get("PQ3D_PALLAS_INTERPRET"):
        # CPU equivalence testing: force-enable (interpret mode) down to the
        # smallest shape the window DMA supports (one full window)
        min_rows = 384
    elif jax.default_backend() != "tpu":
        return False
    c = max(cin, cout)
    if not (96 <= c < 256):
        return False
    if _sparse.ztriple_applicable(n_rows, cin, cout):
        return False
    return n_rows % 128 == 0 and n_rows >= min_rows


def device_zrun_plan(nbr: jnp.ndarray
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device twin of :func:`kernel_maps.build_ztriple_plan` — pure jnp.

    Returns ``(zbase (N, 9) int32, zcode (N, 9, 3) int8)`` bit-matching the
    host builder for the same (N, 27) map (pinned by
    tests/test_device_maps.py).  Used by :func:`device_zt_plan` and by the
    device-built-maps path (ops/device_maps.build_batch_maps) so the
    ztriple convs need no host plan either.
    """
    n = nbr.shape[0]
    big = jnp.int32(1 << 24)
    nbrr = nbr.reshape(n, 9, 3)
    zbase = jnp.min(jnp.where(nbrr >= 0, nbrr, big), axis=2)
    has = zbase != big
    zbase = jnp.where(has, jnp.minimum(zbase, n - 3), 0).astype(jnp.int32)
    zcode = jnp.full((n, 9, 3), -2, jnp.int8)
    for p in range(3):
        for d in range(3):
            m = has & (nbrr[:, :, d] == zbase + p)
            zcode = zcode.at[:, :, p].set(
                jnp.where(m, jnp.int8(d - 1), zcode[:, :, p]))
    return zbase, zcode


def device_zt_plan(nbr: jnp.ndarray, tile: int = 128, window: int = 384,
                   exc_cap: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """Device twin of :func:`build_pallas_zt_plan` — pure jnp, jit-safe.

    Runs INSIDE the model's jit from the already-shipped (N, 27) neighbor
    map, so enabling the pallas conv costs no extra host work or transfer.
    Also returns the raw (zbase, zcode) pair for the weight-grad re-gather.
    """
    n = nbr.shape[0]
    assert n % tile == 0 and n >= window, (n, tile, window)
    if exc_cap is None:
        exc_cap = max(1024, n // 64)
    big = jnp.int32(1 << 24)
    zbase, zcode = device_zrun_plan(nbr)
    has = (zcode != -2).any(2)

    t = n // tile
    bt = zbase.reshape(t, tile, 9)
    ht = has.reshape(t, tile, 9)
    lo = jnp.min(jnp.where(ht, bt, big), axis=1)
    lo = jnp.where(lo == big, 0, lo)
    lo = jnp.clip(lo, 0, max(n - window, 0)) & ~jnp.int32(7)
    rel = zbase - jnp.repeat(lo, tile, axis=0)
    inw = has & (rel >= 0) & (rel <= window - 3)
    base_local = jnp.where(inw, rel, jnp.int32(_BIG))
    base_local = jnp.pad(base_local, ((0, 0), (0, 7)),
                         constant_values=int(_BIG))
    msel_c = jnp.stack([(zcode[:, :, p] == dz) & inw
                        for p, dz in _COMBOS], 2)           # (N, 9, 6)
    msel = jnp.pad(msel_c.reshape(n, 54).astype(jnp.float32),
                   ((0, 0), (0, 10)))

    flags = has & ~inw                                      # (N, 9)
    # one vectorized compaction for all 9 columns: per-column cumsum + a
    # single scatter-drop.  The earlier per-column jnp.nonzero(size=)
    # lowered to 9 sorts and dominated the whole plan build (chip: 21.3 ->
    # 16.4 ms at the flat L0 size with this form; zrun+msel alone is 4.5).
    pos = jnp.cumsum(flags, axis=0, dtype=jnp.int32) - 1    # (N, 9)
    cols = jnp.arange(9, dtype=jnp.int32)
    okx = flags & (pos < exc_cap)
    tgt = jnp.where(okx, cols[None, :] * exc_cap + pos, 9 * exc_cap)
    rows = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, 9))
    exc_out = jnp.full((9 * exc_cap + 1,), -1, jnp.int32).at[
        tgt.ravel()].set(rows.ravel(), mode="drop")[:9 * exc_cap].reshape(
        9, exc_cap)
    valid_e = exc_out >= 0
    idx_c = jnp.maximum(exc_out, 0)                         # (9, E)
    exc_base = jnp.where(valid_e, zbase[idx_c, cols[:, None]], 0)
    exc_msel = jnp.stack(
        [(zcode[idx_c, cols[:, None], p] == dz) & valid_e
         for p, dz in _COMBOS], -1).astype(jnp.float32)
    # overflow is PER COLUMN (each column compacts into its own exc_cap
    # slots): a single column past exc_cap drops contributions even when
    # the total is far under 9*exc_cap
    col_counts = jnp.sum(flags, axis=0, dtype=jnp.int32)        # (9,)
    return {"win_lo": lo.reshape(-1), "base_local": base_local,
            "msel": msel, "exc_base": exc_base,
            "exc_out": exc_out, "exc_msel": exc_msel,
            "zbase": zbase, "zcode": zcode,
            "exc_dropped": jnp.sum(jnp.maximum(col_counts - exc_cap, 0))}


def pallas_zt_conv_plan(x: jnp.ndarray, w: jnp.ndarray, plan: Dict,
                        out_valid: Optional[jnp.ndarray] = None,
                        tile: int = 128, window: int = 384,
                        interpret: bool = False) -> jnp.ndarray:
    """Dict-plan convenience wrapper around :func:`pallas_zt_conv`."""
    return pallas_zt_conv(x, w, plan["win_lo"], plan["base_local"],
                          plan["msel"], plan["exc_base"], plan["exc_out"],
                          plan["exc_msel"], out_valid,
                          tile=tile, window=window, interpret=interpret)


def pallas_zt_conv_sym(x: jnp.ndarray, w: jnp.ndarray, plan: Dict,
                       out_valid: Optional[jnp.ndarray] = None,
                       tile: int = 128, window: int = 384,
                       interpret: bool = False) -> jnp.ndarray:
    """Pallas windowed conv with the scatter-free symmetric-stencil VJP.

    Same duality as sparse_conv_ztriple_sym: the 3^3 stencil is symmetric,
    so dx = the SAME windowed conv applied to dy with flip_k(W)^T; dw
    re-gathers activations through the (zbase, zcode) plan (XLA path,
    ops/sparse._ztriple_weight_grad) instead of storing 27 x N x C
    residuals.
    """
    from pq3d_tpu.ops import sparse as _sparse

    # plan/valid ride the custom_vjp as residuals, never bwd closures (a
    # closed-over tracer leaks out of an enclosing remat trace — see
    # ops/sparse.sparse_conv_sym)
    @jax.custom_vjp
    def f(x, w, plan, out_valid):
        return pallas_zt_conv_plan(x, w, plan, out_valid, tile, window,
                                   interpret)

    def fwd(x, w, plan, out_valid):
        return f(x, w, plan, out_valid), (x, w, plan, out_valid)

    def bwd(res, dy):
        x, w, plan, o_valid = res
        if o_valid is not None:
            dy = jnp.where(o_valid[:, None], dy, 0)
        w_t = jnp.flip(w, axis=0).transpose(0, 2, 1)
        dx = pallas_zt_conv_plan(dy, w_t, plan, None, tile, window,
                                 interpret).astype(x.dtype)
        dw = _sparse._ztriple_weight_grad(
            x, plan["zbase"], plan["zcode"], dy).astype(w.dtype)
        return dx, dw, None, None

    f.defvjp(fwd, bwd)
    return f(x, w, plan, out_valid)


@partial(jax.jit, static_argnames=("tile", "window", "interpret"))
def pallas_zt_conv(x: jnp.ndarray, w: jnp.ndarray, win_lo: jnp.ndarray,
                   base_local: jnp.ndarray, msel: jnp.ndarray,
                   exc_base: jnp.ndarray, exc_out: jnp.ndarray,
                   exc_msel: jnp.ndarray,
                   out_valid: Optional[jnp.ndarray] = None,
                   tile: int = 128, window: int = 384,
                   interpret: bool = False) -> jnp.ndarray:
    """x (N, Cin), w (27, Cin, Cout) -> (N, Cout) in x.dtype."""
    n, cin = x.shape
    _, _, cout = w.shape
    cin_p = -(-cin // 128) * 128
    cout_p = -(-cout // 128) * 128
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, cin_p - cin)))
    wb = jnp.pad(w.astype(jnp.bfloat16),
                 ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    n_tiles = n // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i, lo: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 64), lambda i, lo: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # weights
            pl.BlockSpec(memory_space=pltpu.ANY),           # x in HBM
        ],
        out_specs=pl.BlockSpec((tile, cout_p), lambda i, lo: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 9, window, cin_p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 9)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, tile=tile, window=window,
                cin_p=cin_p, cout_p=cout_p),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, cout_p), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(win_lo, base_local, msel, wb, xb)
    out = out[:, :cout]
    out = _exception_add(out, x, w, exc_base, exc_out, exc_msel)
    if out_valid is not None:
        out = jnp.where(out_valid[:, None], out, 0)
    return out.astype(x.dtype)
