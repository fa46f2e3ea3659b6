"""Windowed one-hot MXU conv (winconv) prototype — chip A/B vs gather conv.

bench_gather2 (PERF.md round-4 s2) measured the random-fetch floor at
~91 Mfetch/s while the one-hot MXU gather sustains 0.64 ns/row-equivalent
(77-176 TF/s).  winconv restructures the 3^3 sparse conv to exploit that:

  1. pack voxels into ``window^3`` spatial boxes (same partition the Swin
     backbone uses, ops/window_maps.py);
  2. ONE slab gather per window: the window's own voxels + the halo shell
     (~2-2.5N locality-friendly fetches total instead of 27N);
  3. the 27-tap neighbor selection becomes a one-hot matmul on the MXU
     (``G = onehot(sel) @ slab`` — exact selection, no accumulation), and
     the weight contraction is the usual GEMM (``out = G.reshape @ W_cat``).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_winconv.py
  BENCH_SMOKE=1 python tools/bench_winconv.py      # CPU toy equivalence run
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np

SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0")))
if SMOKE:
    os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jaxcache_cpu")
import jax
import jax.numpy as jnp

if SMOKE:
    jax.config.update("jax_platforms", "cpu")

from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)

from pq3d_tpu.ops import sparse  # noqa: E402


def build_winconv_plan(coords, nbr, window=8, pad8=True):
    """Host plan for the windowed one-hot conv on one level.

    coords: (N, 3) int voxel coords (any sign); nbr: (N, 27) int32 neighbor
    map, -1 missing (only the first N valid rows of a padded map).
    Returns dict of numpy arrays + stats:
      members   (Nw, cap)      global voxel id per window slot, -1 pad
      slabmap   (Nw, R)        global ids feeding each window's slab; N = zero row
      sel       (Nw, cap, 27)  local slab index per (slot, tap); R-1 = zero
      out_pos   (N,)           w * cap + slot of each voxel (flat out gather)
    """
    N = len(coords)
    sh = coords.astype(np.int64) - coords.min(0)
    wc = sh // window
    dims = wc.max(0) + 1
    key = (wc[:, 0] * dims[1] + wc[:, 1]) * dims[2] + wc[:, 2]
    order = np.argsort(key, kind="stable")
    ksort = key[order]
    uk, start = np.unique(ksort, return_index=True)
    Nw = len(uk)
    counts = np.diff(np.append(start, N))
    cap = int(counts.max())
    if pad8:
        cap = (cap + 7) // 8 * 8
    wvec = np.searchsorted(uk, ksort)          # window of each sorted row
    winpos = np.arange(N) - start[wvec]        # slot within window
    members = np.full((Nw, cap), -1, np.int32)
    members[wvec, winpos] = order.astype(np.int32)
    out_pos = np.empty(N, np.int64)
    out_pos[order] = wvec * cap + winpos

    # slab per window: dedup of members' valid neighbors (sorted composite
    # key groups by window, then by global id)
    src = nbr[order]                           # (N, 27) window-grouped
    tgt = src.ravel().astype(np.int64)
    wrep = np.repeat(wvec, 27)
    valid = tgt >= 0
    pair = wrep[valid] * (N + 1) + tgt[valid]
    upair = np.unique(pair)
    pw = upair // (N + 1)
    sstart = np.searchsorted(pw, np.arange(Nw))
    scount = np.diff(np.append(sstart, len(upair)))
    R = int(scount.max()) + 1                  # last slot always a zero row
    if pad8:
        R = (R + 7) // 8 * 8
    slabmap = np.full((Nw, R), N, np.int32)
    spos = np.arange(len(upair)) - sstart[pw]
    slabmap[pw, spos] = (upair % (N + 1)).astype(np.int32)

    sel = np.full((Nw, cap, 27), R - 1, np.int32)
    srep = np.repeat(winpos, 27)
    krep = np.tile(np.arange(27), N)
    q = wrep[valid] * (N + 1) + tgt[valid]
    p = np.searchsorted(upair, q)
    sel[wrep[valid], srep[valid], krep[valid]] = (
        p - sstart[wrep[valid]]).astype(np.int32)

    stats = dict(Nw=Nw, cap=cap, R=R, occ_mean=float(counts.mean()),
                 occ_max=int(counts.max()), slab_mean=float(scount.mean()),
                 slab_max=int(scount.max()),
                 pad_frac=float(1 - N / (Nw * cap)),
                 slab_fetch_per_vox=float(Nw * R / N),
                 plan_mb=(members.nbytes + slabmap.nbytes + sel.nbytes
                          + out_pos.nbytes) / 1e6)
    return {"members": members, "slabmap": slabmap, "sel": sel,
            "out_pos": out_pos.astype(np.int32)}, stats


def build_winconv_plan_bucketed(coords, nbr, window=8, n_buckets=4,
                                pad8=True):
    """Occupancy-bucketed variant: windows sorted by occupancy and split
    into ``n_buckets`` equal-count groups, each with its own (cap, R) —
    kills the ~0.80 member-pad fraction the flat plan measured (the
    occupancy distribution is heavily skewed: mean 6.5 / max 31 at w=4)."""
    N = len(coords)
    sh = coords.astype(np.int64) - coords.min(0)
    wc = sh // window
    dims = wc.max(0) + 1
    key = (wc[:, 0] * dims[1] + wc[:, 1]) * dims[2] + wc[:, 2]
    order = np.argsort(key, kind="stable")
    ksort = key[order]
    uk, start = np.unique(ksort, return_index=True)
    Nw = len(uk)
    counts = np.diff(np.append(start, N))
    wvec = np.searchsorted(uk, ksort)
    winpos = np.arange(N) - start[wvec]

    # global member/slab/sel at the global maxima, sliced per bucket below
    cap_g = int(counts.max())
    members = np.full((Nw, cap_g), -1, np.int32)
    members[wvec, winpos] = order.astype(np.int32)

    src = nbr[order]
    tgt = src.ravel().astype(np.int64)
    wrep = np.repeat(wvec, 27)
    valid = tgt >= 0
    pair = wrep[valid] * (N + 1) + tgt[valid]
    upair = np.unique(pair)
    pw = upair // (N + 1)
    sstart = np.searchsorted(pw, np.arange(Nw))
    scount = np.diff(np.append(sstart, len(upair)))
    R_g = int(scount.max()) + 1
    slabmap = np.full((Nw, R_g), N, np.int32)
    spos = np.arange(len(upair)) - sstart[pw]
    slabmap[pw, spos] = (upair % (N + 1)).astype(np.int32)

    sel = np.full((Nw, cap_g, 27), -1, np.int32)   # -1 = zero slot (remapped)
    srep = np.repeat(winpos, 27)
    krep = np.tile(np.arange(27), N)
    p = np.searchsorted(upair, pair)
    sel[wrep[valid], srep[valid], krep[valid]] = (
        p - sstart[wrep[valid]]).astype(np.int32)

    # bucket windows by occupancy (equal window counts per bucket)
    ow = np.argsort(counts, kind="stable")
    bounds = [Nw * i // n_buckets for i in range(n_buckets + 1)]
    buckets = []
    out_pos = np.empty(N, np.int64)
    flat_off = 0
    tot_cells = tot_onehot = 0
    for b in range(n_buckets):
        wsel = ow[bounds[b]:bounds[b + 1]]
        if not len(wsel):
            continue
        cap_b = int(counts[wsel].max())
        R_b = int(scount[wsel].max()) + 1
        if pad8:
            # clamp to the global widths: slicing past them silently
            # shrinks the arrays while out_pos would keep the padded stride
            cap_b = min((cap_b + 7) // 8 * 8, cap_g)
            R_b = min((R_b + 7) // 8 * 8, R_g)
        sel_b = sel[wsel][:, :cap_b, :].copy()
        sel_b[sel_b < 0] = R_b - 1
        buckets.append({
            "slabmap": slabmap[wsel][:, :R_b].copy(),
            "sel": sel_b,
        })
        m_b = members[wsel][:, :cap_b]
        w_idx, s_idx = np.nonzero(m_b >= 0)
        out_pos[m_b[w_idx, s_idx]] = flat_off + w_idx * cap_b + s_idx
        flat_off += len(wsel) * cap_b
        tot_cells += len(wsel) * cap_b
        tot_onehot += len(wsel) * cap_b * R_b
    stats = dict(Nw=Nw, n_buckets=len(buckets),
                 caps=[b["sel"].shape[1] for b in buckets],
                 Rs=[b["slabmap"].shape[1] for b in buckets],
                 pad_frac=float(1 - N / tot_cells),
                 onehot_gf=2 * tot_onehot * 27 / 1e9,
                 plan_mb=sum(b["sel"].nbytes + b["slabmap"].nbytes
                             for b in buckets) / 1e6)
    return {"buckets": buckets, "out_pos": out_pos.astype(np.int32),
            "n_flat": flat_off}, stats


def winconv_bucketed(x, w, plan, compute_dtype=jnp.bfloat16,
                     accum_dtype=jnp.float32, g_budget=2.5e8):
    C = x.shape[1]
    xp = jnp.concatenate([x, jnp.zeros((1, C), x.dtype)], axis=0)
    wcat = w.astype(compute_dtype).reshape(27 * C, -1)
    outs = []
    for bk in plan["buckets"]:
        Nwb, R = bk["slabmap"].shape
        cap = bk["sel"].shape[1]
        chunk = max(1, int(g_budget / (cap * 27 * C * 2)))
        chunk = min(max(64, 1 << (chunk.bit_length() - 1)), Nwb)
        nc = -(-Nwb // chunk)
        smap = jnp.pad(bk["slabmap"], ((0, nc * chunk - Nwb), (0, 0)),
                       constant_values=x.shape[0])
        selb = jnp.pad(bk["sel"].reshape(Nwb, cap * 27),
                       ((0, nc * chunk - Nwb), (0, 0)),
                       constant_values=R - 1)

        def do_chunk(args, R=R, cap=cap, chunk=chunk):
            smap_c, sel_c = args
            slab = sparse.fast_row_gather(
                xp, smap_c.reshape(-1)).reshape(chunk, R, C)
            oh = (sel_c[..., None] == jnp.arange(R, dtype=jnp.int32)
                  ).astype(compute_dtype)
            g = jnp.einsum("wkr,wrc->wkc", oh, slab.astype(compute_dtype),
                           preferred_element_type=compute_dtype)
            return jnp.einsum("wkf,fo->wko",
                              g.reshape(chunk, cap, 27 * C), wcat,
                              preferred_element_type=accum_dtype)

        ow = jax.lax.map(do_chunk, (smap.reshape(nc, chunk, R),
                                    selb.reshape(nc, chunk, cap * 27)))
        outs.append(ow.reshape(nc * chunk * cap, -1)[:Nwb * cap])
    out_flat = jnp.concatenate(outs, axis=0)
    return sparse.fast_row_gather(out_flat, plan["out_pos"]).astype(x.dtype)


def winconv(x, w, plan, compute_dtype=jnp.bfloat16,
            accum_dtype=jnp.float32, g_budget=2.5e8):
    """out[i] = sum_k x[nbr[i,k]] @ W[k] via per-window one-hot matmuls.

    Chunks the window axis with ``lax.map`` so the (chunk, cap*27, C)
    selection tensor G stays within ``g_budget`` bytes (at L0 bench scale
    the unchunked G is ~6 GB)."""
    Nw, R = plan["slabmap"].shape
    cap = plan["sel"].shape[1]
    C = x.shape[1]
    Cout = w.shape[2]
    chunk = max(1, int(g_budget / (cap * 27 * max(C, Cout) * 2)))
    chunk = max(256, 1 << (chunk.bit_length() - 1))
    nc = -(-Nw // chunk)
    xp = jnp.concatenate([x, jnp.zeros((1, C), x.dtype)], axis=0)
    # pad windows to a whole number of chunks (slabmap->zero row,
    # sel->zero slot: the extra outputs are never gathered by out_pos)
    slabmap = jnp.pad(plan["slabmap"], ((0, nc * chunk - Nw), (0, 0)),
                      constant_values=x.shape[0])
    sel = jnp.pad(plan["sel"].reshape(Nw, cap * 27),
                  ((0, nc * chunk - Nw), (0, 0)), constant_values=R - 1)
    wcat = w.astype(compute_dtype).reshape(27 * C, -1)

    def do_chunk(args):
        smap_c, sel_c = args
        slab = sparse.fast_row_gather(
            xp, smap_c.reshape(-1)).reshape(chunk, R, C)
        oh = (sel_c[..., None] == jnp.arange(R, dtype=jnp.int32)
              ).astype(compute_dtype)
        # exact selection: one-hot rows have exactly one 1 -> bf16 exact
        g = jnp.einsum("wkr,wrc->wkc", oh, slab.astype(compute_dtype),
                       preferred_element_type=compute_dtype)
        g = g.reshape(chunk, cap, 27 * C)
        return jnp.einsum("wkf,fo->wko", g, wcat,
                          preferred_element_type=accum_dtype)

    out_w = jax.lax.map(do_chunk, (slabmap.reshape(nc, chunk, R),
                                   sel.reshape(nc, chunk, cap * 27)))
    out = sparse.fast_row_gather(
        out_w.reshape(nc * chunk * cap, -1), plan["out_pos"])
    return out.astype(x.dtype)


def slope_time(fn, *args, r1=2, r2=8):
    """Chained-reps slope timing (see tools/bench_gather2.py)."""
    def chained(r):
        @jax.jit
        def run(*a):
            def body(i, carry):
                out = fn(*a, carry)
                return carry + jnp.sum(out.astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
        _ = float(run(*args))
        t0 = time.time()
        _ = float(run(*args))
        return time.time() - t0

    chained(r1)
    t1, t2 = chained(r1), chained(r2)
    return max((t2 - t1) / (r2 - r1), 1e-9)


def dep(ix, acc):
    return ix + (acc > 1e30).astype(ix.dtype)


def main():
    from tools.profile_instseg_fwd import build
    scenes, batch = build()
    maps = batch["maps"]
    rng = np.random.default_rng(1)
    cases = [(0, 96), (1, 96), (2, 128)]
    windows = (4, 8)
    if SMOKE:
        cases, windows = cases[:2], (4,)
    for lvl, c in cases:
        nbr_pad = np.asarray(maps[f"nbr3_{lvl}"])
        valid = np.asarray(maps[f"valid_{lvl}"])
        n = int(valid.sum())
        # flat pack = contiguous concat of the scenes' valid rows; rebuild
        # flat coords with a large per-scene x offset so the window
        # partition never merges voxels of different scenes
        coords = np.concatenate([
            p["hierarchy"].coords[lvl][:p["hierarchy"].num_voxels[lvl]]
            + np.array([i * 1_000_000, 0, 0], np.int64)
            for i, p in enumerate(scenes)])
        assert len(coords) == n, (len(coords), n)
        nbr = nbr_pad[:n]
        x = jnp.asarray(rng.standard_normal((nbr_pad.shape[0], c)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05, jnp.bfloat16)

        jvalid = jnp.asarray(valid)
        jnbr = jnp.asarray(nbr_pad)
        ref = sparse.sparse_conv(x, jnbr, w, None, jvalid,
                                 accum_dtype=jnp.bfloat16)
        dt_ref = slope_time(
            lambda x, nbr, w, acc: sparse.sparse_conv(
                x, dep(nbr, acc), w, None, jvalid,
                accum_dtype=jnp.bfloat16), x, jnbr, w)
        print(f"L{lvl} C={c} N={n} (pad {nbr_pad.shape[0]}): "
              f"gather conv {dt_ref*1e3:7.2f} ms", flush=True)

        for win in windows:
            t0 = time.time()
            plan, st = build_winconv_plan(coords, nbr, window=win)
            t_plan = time.time() - t0
            print(f"  win={win}: Nw={st['Nw']} cap={st['cap']} R={st['R']} "
                  f"occ {st['occ_mean']:.1f}/{st['occ_max']} "
                  f"slab {st['slab_mean']:.1f}/{st['slab_max']} "
                  f"pad {st['pad_frac']:.2f} "
                  f"fetch/vox {st['slab_fetch_per_vox']:.2f} "
                  f"plan {st['plan_mb']:.1f} MB ({t_plan:.2f}s host)",
                  flush=True)
            jplan = {k: jnp.asarray(v) for k, v in plan.items()}
            got = jax.jit(
                lambda x, w: winconv(x, w, jplan,
                                     accum_dtype=jnp.bfloat16))(x[:n], w)
            r = np.asarray(ref[:n], np.float32)
            g = np.asarray(got, np.float32)
            err = np.abs(r - g).max() / max(np.abs(r).max(), 1e-6)
            assert err < 2e-2, f"winconv mismatch: rel err {err}"
            dt = slope_time(
                lambda x, sel, w, acc: winconv(
                    x, w, {**jplan, "sel": dep(sel, acc)},
                    accum_dtype=jnp.bfloat16), x[:n], jplan["sel"], w)
            print(f"    winconv {dt*1e3:7.2f} ms  ({dt_ref/dt:.2f}x, "
                  f"rel_err {err:.2e})", flush=True)

            plan_b, stb = build_winconv_plan_bucketed(coords, nbr,
                                                      window=win)
            print(f"    bucketed: caps {stb['caps']} Rs {stb['Rs']} "
                  f"pad {stb['pad_frac']:.2f} onehot {stb['onehot_gf']:.0f} "
                  f"GF plan {stb['plan_mb']:.0f} MB", flush=True)
            jplan_b = {"buckets": [{k: jnp.asarray(v) for k, v in b.items()}
                                   for b in plan_b["buckets"]],
                       "out_pos": jnp.asarray(plan_b["out_pos"])}
            got_b = jax.jit(lambda x, w: winconv_bucketed(
                x, w, jplan_b, accum_dtype=jnp.bfloat16))(x[:n], w)
            err_b = (np.abs(r - np.asarray(got_b, np.float32)).max()
                     / max(np.abs(r).max(), 1e-6))
            assert err_b < 2e-2, f"bucketed mismatch: rel err {err_b}"
            dt_b = slope_time(
                lambda x, w, acc: winconv_bucketed(
                    x + (acc > 1e30).astype(x.dtype), w, jplan_b,
                    accum_dtype=jnp.bfloat16), x[:n], w)
            print(f"    winconv_bucketed {dt_b*1e3:7.2f} ms  "
                  f"({dt_ref/dt_b:.2f}x, rel_err {err_b:.2e})", flush=True)


if __name__ == "__main__":
    main()
