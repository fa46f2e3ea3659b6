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
    window], exc_out/exc_k/exc_in (E_pad,) padded with -1.
    """
    n, k = nbr.shape
    assert n % tile == 0, "pad N to a multiple of tile"
    n_tiles = n // tile
    win_lo = np.zeros(n_tiles, np.int32)
    nbr_local = np.full_like(nbr, -1)
    exc = []
    for t in range(n_tiles):
        rows = nbr[t * tile:(t + 1) * tile]
        valid = rows >= 0
        center = t * tile + tile // 2
        lo = int(np.clip(center - window // 2, 0, n - window))
        lo -= lo % 8  # sublane alignment
        lo = int(np.clip(lo, 0, n - window))
        win_lo[t] = lo
        local = rows - lo
        inside = valid & (local >= 0) & (local < window)
        nbr_local[t * tile:(t + 1) * tile] = np.where(inside, local, -1)
        out_rows, ks = np.nonzero(valid & ~inside)
        for r, kk in zip(out_rows, ks):
            exc.append((t * tile + r, kk, rows[r, kk]))
    e = len(exc)
    e_pad = max(exc_pad_to, int(np.ceil(max(e, 1) / exc_pad_to) * exc_pad_to))
    exc_arr = np.full((e_pad, 3), -1, np.int32)
    if e:
        exc_arr[:e] = np.asarray(exc, np.int32)
    return {"win_lo": win_lo, "nbr_local": nbr_local,
            "exc_out": exc_arr[:, 0], "exc_k": exc_arr[:, 1],
            "exc_in": exc_arr[:, 2], "n_exceptions": e}


def _kernel(win_lo_ref, nbr_ref, w_ref, x_hbm, o_ref, xwin, sem, *,
            tile, window, k_total):
    t = pl.program_id(0)
    lo = pl.multiple_of(win_lo_ref[t], 8)  # host aligns window starts to 8
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(lo, window), :], xwin, sem)
    cp.start()
    cp.wait()
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
    acc = jnp.zeros((tile, w_ref.shape[-1]), jnp.float32)
    xw = xwin[:]
    for k in range(k_total):
        # Mosaic requires 32-bit matmul accumulators
        yk = jnp.dot(xw, w_ref[k],
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        onehot = (nbr_ref[:, k][:, None] == lanes).astype(jnp.bfloat16)
        acc = acc + jnp.dot(onehot, yk, preferred_element_type=jnp.float32)
    o_ref[:] = acc


@partial(jax.jit, static_argnames=("tile", "window"))
def windowed_sparse_conv(x: jnp.ndarray, w: jnp.ndarray,
                         win_lo: jnp.ndarray, nbr_local: jnp.ndarray,
                         exc_out: jnp.ndarray, exc_k: jnp.ndarray,
                         exc_in: jnp.ndarray,
                         tile: int = 256, window: int = 512) -> jnp.ndarray:
    """x (N, Cin), w (K, Cin, Cout) -> (N, Cout), f32."""
    n, cin = x.shape
    k_total, _, cout = w.shape
    n_tiles = n // tile
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, k_total), lambda i, lo_ref: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w whole
            pl.BlockSpec(memory_space=pltpu.ANY),    # x stays in HBM
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda i, lo_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, tile=tile, window=window, k_total=k_total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, cout), jnp.float32),
    )(win_lo, nbr_local, wb, xb)

    # exception pass (XLA): tiny COO of out-of-window references
    ok = exc_out >= 0
    xi = fast_row_gather(xb, jnp.maximum(exc_in, 0))          # (E, Cin)
    wk = jnp.take(wb, jnp.maximum(exc_k, 0), axis=0)          # (E, Cin, Cout)
    contrib = jnp.einsum("ec,ecd->ed", xi, wk,
                         preferred_element_type=jnp.float32)
    contrib = jnp.where(ok[:, None], contrib, 0)
    out = out.at[jnp.where(ok, exc_out, n - 1)].add(
        contrib, mode="drop")
    return out
