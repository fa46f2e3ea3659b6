"""Host-side window-map builder for the Pallas windowed conv."""
import numpy as np

from pq3d_tpu.ops import kernel_maps
from pq3d_tpu.ops.pallas_conv import build_window_map


def test_window_map_partition(rng):
    coords = np.unique(rng.integers(0, 16, (300, 3)).astype(np.int32), axis=0)
    order = kernel_maps.morton_order(coords)
    nbr = kernel_maps.build_neighbor_map(coords[order], 3)
    n_pad = 512
    nbr_p = kernel_maps.pad_rows(nbr, n_pad, -1)
    wm = build_window_map(nbr_p, tile=64, window=128)
    assert (wm["win_lo"] % 8 == 0).all()
    # every valid global reference is either local-in-window or an exception;
    # reconstruct the global (row, k) exception pairs from the per-tile
    # layout: exc_src_tile holds kpos = k * e_pad + slot, exc_row_tile the
    # local output row (-1 padding).
    e_pad = wm["exc_in_k"].shape[1]
    n_tiles = n_pad // 64
    exc = {}
    for t in range(n_tiles):
        for r_loc, src in zip(wm["exc_row_tile"][t], wm["exc_src_tile"][t]):
            if r_loc < 0:
                continue
            k_tap, slot = divmod(int(src), e_pad)
            exc[(t * 64 + int(r_loc), k_tap)] = int(wm["exc_in_k"][k_tap, slot])
    assert len(exc) == wm["n_exceptions"]
    for t in range(n_tiles):
        lo = wm["win_lo"][t]
        for r in range(64):
            j = t * 64 + r
            for k in range(27):
                g = nbr_p[j, k]
                loc = wm["nbr_local"][j, k]
                if g < 0:
                    assert loc == -1 and (j, k) not in exc
                elif loc >= 0:
                    assert lo + loc == g
                else:
                    # exception entry must reference the right input row
                    assert exc.get((j, k)) == g
