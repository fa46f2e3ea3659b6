"""Pallas windowed sparse convolution (prototype).

Strategy: Morton-ordered voxels concentrate each output tile's neighbor
indices inside a small window (measured: ~95-99% within +/-256 rows).  The
kernel DMAs that contiguous window from HBM into VMEM (fast streaming read,
start taken from a scalar-prefetched per-tile table) and realizes the gather
as a one-hot matmul on the MXU — sidestepping Mosaic's single-vreg
``dynamic_gather`` limit.  Out-of-window references (exception list, built on
the host) are applied by a small XLA gather/scatter pass.

    out[j] = sum_k onehot(nbr_local[j,k]) @ (window @ W[k])  +  exceptions

Status: prototype — correctness-tested against ops.sparse.sparse_conv; not
yet wired into the U-Net (round-2 integration candidate, see PERF.md).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pq3d_tpu.ops.sparse import fast_row_gather


def build_window_map(nbr: np.ndarray, tile: int = 256, window: int = 512,
                     exc_pad_to: int = 1024) -> Dict[str, np.ndarray]:
    """Host side: per-tile window starts + local indices + exception COO.

    nbr: (N, K) int32 global neighbor map (-1 missing), Morton-ordered rows.
    Returns dict with win_lo (n_tiles,), nbr_local (N, K) [-1 = not in
    window], exc_out/exc_k/exc_in (E_pad,) padded with -1.  Fully
    vectorized — no per-tile python loop.
    """
    n, k = nbr.shape
    assert n % tile == 0, "pad N to a multiple of tile"
    n_tiles = n // tile
    centers = np.arange(n_tiles, dtype=np.int64) * tile + tile // 2
    lo = np.clip(centers - window // 2, 0, n - window)
    lo -= lo % 8  # sublane alignment
    win_lo = np.clip(lo, 0, n - window).astype(np.int32)

    valid = nbr >= 0
    lo_rows = np.repeat(win_lo, tile)[:, None]          # (N, 1)
    local = nbr - lo_rows
    inside = valid & (local >= 0) & (local < window)
    nbr_local = np.where(inside, local, -1).astype(np.int32)

    # Exceptions (out-of-window references) are handled with NO scatter:
    #   1. grouped BY TAP: one batched (K, E, Cin)@(K, Cin, Cout) GEMM
    #      computes every exception's contribution (a flat COO would need a
    #      per-entry weight gather — (E, Cin, Cout), measured catastrophic);
    #   2. grouped BY TILE: a host permutation reorders contributions
    #      tile-major, and the KERNEL adds them to its own output rows via
    #      a tiny one-hot matmul (XLA scatter-add measured ~6 GB/s — the
    #      dominant cost of the previous design).
    out_rows, ks = np.nonzero(valid & ~inside)
    e = len(out_rows)
    counts = np.bincount(ks, minlength=k)
    e_max = int(counts.max()) if e else 0
    e_pad = max(exc_pad_to,
                int(np.ceil(max(e_max, 1) / exc_pad_to) * exc_pad_to))
    exc_in_k = np.full((k, e_pad), -1, np.int32)
    kpos = np.zeros(e, np.int64)          # entry -> row in (K*E_pad) layout
    if e:
        order = np.argsort(ks, kind="stable")
        slot = np.arange(e) - np.concatenate(
            [[0], np.cumsum(counts)])[ks[order]]
        exc_in_k[ks[order], slot] = nbr[out_rows[order], ks[order]]
        kpos[order] = ks[order].astype(np.int64) * e_pad + slot

    tile_id = out_rows // tile
    tcounts = np.bincount(tile_id, minlength=n_tiles)
    et_max = int(tcounts.max()) if e else 0
    et_pad = max(128, int(np.ceil(max(et_max, 1) / 128) * 128))
    exc_row_tile = np.full((n_tiles, et_pad), -1, np.int32)
    exc_src_tile = np.zeros((n_tiles, et_pad), np.int32)
    if e:
        torder = np.argsort(tile_id, kind="stable")
        tslot = np.arange(e) - np.concatenate(
            [[0], np.cumsum(tcounts)])[tile_id[torder]]
        exc_row_tile[tile_id[torder], tslot] = (out_rows % tile)[torder]
        exc_src_tile[tile_id[torder], tslot] = kpos[torder]
    return {"win_lo": win_lo, "nbr_local": nbr_local,
            "exc_in_k": exc_in_k, "exc_row_tile": exc_row_tile,
            "exc_src_tile": exc_src_tile, "n_exceptions": e}


def _kernel(win_lo_ref, nbr_ref, w_ref, exc_row_ref, exc_contrib_ref,
            x_hbm, o_ref, xwin, sem, *, tile, window, k_total):
    """Double-buffered windowed gather-conv tile.

    Per grid step: wait this tile's window DMA (started by the previous
    step), immediately start the next tile's, then
      y_all = xwin @ W_flat            (one (window, C)@(C, K*C) GEMM)
      out   = sum_k onehot_k @ y_all_k (the gather, realized on the MXU)
      out  += onehot_exc @ exc_contrib (out-of-window refs, precomputed)
    """
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _first():
        lo0 = pl.multiple_of(win_lo_ref[0], 8)
        pltpu.make_async_copy(x_hbm.at[pl.ds(lo0, window), :],
                              xwin.at[0], sem.at[0]).start()

    @pl.when(t + 1 < n_tiles)
    def _prefetch():
        nxt = jax.lax.rem(t + 1, 2)
        lo1 = pl.multiple_of(win_lo_ref[t + 1], 8)
        pltpu.make_async_copy(x_hbm.at[pl.ds(lo1, window), :],
                              xwin.at[nxt], sem.at[nxt]).start()

    lo = pl.multiple_of(win_lo_ref[t], 8)
    pltpu.make_async_copy(x_hbm.at[pl.ds(lo, window), :],
                          xwin.at[slot], sem.at[slot]).wait()

    cout = o_ref.shape[-1]
    xw = xwin[slot]                                  # (window, Cin)
    # one wide GEMM for all K transforms (Mosaic: f32 accumulators)
    y_all = jnp.dot(xw, w_ref[:],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
    acc = jnp.zeros((tile, cout), jnp.float32)
    for k in range(k_total):
        onehot = (nbr_ref[:, k][:, None] == lanes).astype(jnp.bfloat16)
        acc = acc + jnp.dot(onehot, y_all[:, k * cout:(k + 1) * cout],
                            preferred_element_type=jnp.float32)
    # exception add: rows -1 (padding) match no output row -> contribute 0
    et = exc_row_ref.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, et), 0)
    onehot_e = (exc_row_ref[0, 0][None, :] == rows).astype(jnp.float32)
    acc = acc + jnp.dot(onehot_e, exc_contrib_ref[:],
                        preferred_element_type=jnp.float32)
    o_ref[:] = acc


@partial(jax.jit, static_argnames=("tile", "window"))
def windowed_sparse_conv(x: jnp.ndarray, w: jnp.ndarray,
                         win_lo: jnp.ndarray, nbr_local: jnp.ndarray,
                         exc_in_k: jnp.ndarray, exc_row_tile: jnp.ndarray,
                         exc_src_tile: jnp.ndarray,
                         tile: int = 256, window: int = 512) -> jnp.ndarray:
    """x (N, Cin), w (K, Cin, Cout) -> (N, Cout), f32."""
    n, cin = x.shape
    k_total, _, cout = w.shape
    n_tiles = n // tile
    # Mosaic: HBM->VMEM DMA slices and per-k VMEM column slices must be
    # 128-lane aligned -> pad Cin/Cout up to 128 multiples (zero columns
    # contribute nothing; padded outputs are dropped at the end).
    cin_p = -(-cin // 128) * 128
    cout_p = -(-cout // 128) * 128
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, cin_p - cin)))
    wp = jnp.pad(w.astype(jnp.bfloat16),
                 ((0, 0), (0, cin_p - cin), (0, cout_p - cout)))
    # (K, Cin_p, Cout_p) -> (Cin_p, K*Cout_p): kernel does one wide GEMM
    wb = wp.transpose(1, 0, 2).reshape(cin_p, k_total * cout_p)

    # exception contributions, precomputed scatter-free (see
    # build_window_map): per-tap batched GEMM, then a host-permutation
    # GATHER reorders them tile-major for the kernel's one-hot add
    e_pad = exc_in_k.shape[1]
    ok = exc_in_k >= 0                                        # (K, E)
    xi = fast_row_gather(xb, jnp.maximum(exc_in_k, 0).reshape(-1))
    xi = xi.reshape(k_total, e_pad, cin_p)
    contrib = jnp.einsum("kec,kcd->ked", xi, wp,
                         preferred_element_type=jnp.float32)
    contrib = jnp.where(ok[..., None], contrib, 0)
    contrib_tiled = fast_row_gather(
        contrib.reshape(k_total * e_pad, cout_p),
        exc_src_tile.reshape(-1))                    # (n_tiles*Et, Cout_p)

    et = exc_row_tile.shape[1]
    # Pallas blocks need the last two dims (sublane, lane)-aligned: ship the
    # per-tile exception rows as (n_tiles, 8, et) with a broadcast sublane
    exc_rows8 = jnp.broadcast_to(exc_row_tile[:, None, :],
                                 (n_tiles, 8, et))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, k_total), lambda i, lo_ref: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w whole
            pl.BlockSpec((1, 8, et), lambda i, lo_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # exc local rows
            pl.BlockSpec((et, cout_p), lambda i, lo_ref: (i, 0),
                         memory_space=pltpu.VMEM),   # exc contributions
            pl.BlockSpec(memory_space=pltpu.ANY),    # x stays in HBM
        ],
        out_specs=pl.BlockSpec((tile, cout_p), lambda i, lo_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, window, cin_p), jnp.bfloat16),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, tile=tile, window=window, k_total=k_total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, cout_p), jnp.float32),
    )(win_lo, nbr_local, wb, exc_rows8, contrib_tiled, xb)
    return out[:, :cout]
