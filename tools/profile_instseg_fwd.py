"""Component-level profile of the FLAT instseg forward (the 250 ms serving
path) + microbench of the dense-block 3^3 conv candidate (PERF.md round-3:
extend the dense stem idea to the fat L0/L1 conv stacks).

Usage: python tools/profile_instseg_fwd.py [sections...]
  sections: convs | dense3 | model   (default: all)
Slope timing throughout (tunnel RTT cancels).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

SMOKE = _os.environ.get("BENCH_SMOKE") == "1"
import jax
import jax.numpy as jnp
from jax import lax

if SMOKE:
    jax.config.update("jax_platforms", "cpu")
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.ops import kernel_maps, sparse, window_maps

BATCH = 4


def slope(fn, *args, r1=3, r2=10):
    def run(r):
        t0 = time.time()
        o = None
        for _ in range(r):
            o = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
        return time.time() - t0
    run(1)
    run(r1)
    t1, t2 = run(r1), run(r2)
    return max((t2 - t1) / (r2 - r1), 1e-9)


def build():
    rng = np.random.default_rng(0)
    cfg = InstSegPipelineConfig(
        voxel_size=0.15 if SMOKE else 0.02,
        num_queries=16 if SMOKE else 120,
        max_segments=64 if SMOKE else 512,
        max_instances=16 if SMOKE else 120,
        voxel_bucket=256 if SMOKE else 8192, use_aug=False,
        stem_mode="dense_block", flat_pack=True)
    scenes = [synthetic.make_scene(
        rng, n_points=800 if SMOKE else 80_000,
        n_instances=6 if SMOKE else 24,
        n_segments=24 if SMOKE else 400) for _ in range(BATCH)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 199)
    from pq3d_tpu.data.instseg_pipeline import (collate_processed,
                                                process_scene)
    processed = [process_scene(s, cfg, rng, train=False) for s in scenes]
    batch = collate_processed(processed, cfg)
    return processed, batch


# --------------------------------------------------------------------------
# dense-block 3^3 conv prototype: pack -> slab-halo exchange -> MXU conv ->
# unpack.  Slab gathers fetch only the 1-cell halo shell from the 26
# neighbor blocks (multi-dim lax.gather with constant start columns), so
# the random-row traffic of the 27-tap gathered conv becomes contiguous
# slab reads + dense conv FLOPs (waste = 1/occupancy within blocks).
# --------------------------------------------------------------------------

def build_block_plan(level_coords, block, n_pad=None):
    """Per-scene packs, flat-concatenated (block ids and voxel ids offset)."""
    packs = [window_maps.build_window_pack(c, block, 0, with_neighbors=True)
             for c in level_coords]
    nb = [p["n_win"] for p in packs]
    nvox = [len(c) for c in level_coords]
    nb_tot = sum(nb)
    b3 = block ** 3
    c2v = np.full(nb_tot * b3, -1, np.int64)
    slot = np.full(n_pad or sum(nvox), -1, np.int64)
    nbrw = np.full((nb_tot, 27), -1, np.int64)
    ob = ov = 0
    for p, nv in zip(packs, nvox):
        nw = p["n_win"]
        cv = p["cell_to_vox"]
        c2v[ob * b3:(ob + nw) * b3] = np.where(cv >= 0, cv + ov, -1)
        slot[ov:ov + nv] = p["vox_slot"] + ob * b3
        nbrw[ob:ob + nw] = np.where(p["nbr_win"] >= 0,
                                    p["nbr_win"] + ob, -1)
        ob += nw
        ov += nv
    return {"c2v": c2v.astype(np.int32), "slot": slot.astype(np.int32),
            "nbr_win": nbrw.astype(np.int32), "nb": nb_tot, "block": block}


def _slab_gather(xp, idx, starts, sizes):
    """Gather (len(idx), *sizes, C) slabs from xp (NB, b, b, b, C).

    starts: dict axis(1..3) -> constant start for axes whose size < b.
    """
    cols = [idx]
    sim = [0]
    for ax, st in starts.items():
        cols.append(jnp.full_like(idx, st))
        sim.append(ax)
    indices = jnp.stack(cols, 1).astype(jnp.int32)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(0,),
        start_index_map=tuple(sim))
    return lax.gather(xp, indices, dn,
                      slice_sizes=(1,) + sizes + (xp.shape[-1],),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def conv3_dense_block(x, plan, w, compute_dtype=jnp.bfloat16,
                      accum_dtype=jnp.float32):
    """x: (N, C) flat voxels; w: (27, Cin, Cout) in kernel_offsets order."""
    block = plan["block"]
    nb = plan["nb"]
    b3 = block ** 3
    cin, cout = w.shape[1], w.shape[2]
    c2v, slot, nbrw = plan["c2v"], plan["slot"], plan["nbr_win"]
    xb = x.astype(compute_dtype)
    # pack: one gather of NB*b^3 rows (empty cells read row 0, masked)
    xp = sparse.fast_row_gather(xb, jnp.maximum(c2v, 0))
    xp = jnp.where((c2v >= 0)[:, None], xp, 0)
    xp = xp.reshape(nb, block, block, block, cin)

    h = block + 2
    halo = jnp.zeros((nb, h, h, h, cin), compute_dtype)
    halo = halo.at[:, 1:1 + block, 1:1 + block, 1:1 + block, :].set(xp)
    # src slice & dst slice per axis offset (halo thickness 1)
    ax = {-1: (block - 1, 1, 0), 0: (0, block, 1), 1: (0, 1, 1 + block)}
    t = 0
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                if (ox, oy, oz) == (0, 0, 0):
                    t += 1
                    continue
                idx = nbrw[:, t]
                (sx, lx, dx), (sy, ly, dy), (sz, lz, dz) = \
                    ax[ox], ax[oy], ax[oz]
                starts = {}
                if lx < block:
                    starts[1] = sx
                if ly < block:
                    starts[2] = sy
                if lz < block:
                    starts[3] = sz
                src = _slab_gather(xp, jnp.maximum(idx, 0), starts,
                                   (lx, ly, lz))
                src = jnp.where((idx >= 0)[:, None, None, None, None],
                                src, 0)
                halo = halo.at[:, dx:dx + lx, dy:dy + ly,
                               dz:dz + lz, :].set(src)
                t += 1
    w3 = w.reshape(3, 3, 3, cin, cout).astype(compute_dtype)
    y = lax.conv_general_dilated(
        halo, w3, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype).astype(compute_dtype)
    y = y.reshape(nb * b3, cout)
    out = sparse.fast_row_gather(y, jnp.maximum(slot, 0))
    out = jnp.where((slot >= 0)[:, None], out, 0)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# z-triple conv candidate: voxels are ravel-key sorted, so a (dx,dy)
# column's existing z-neighbors {z-1,z,z+1} occupy CONSECUTIVE rows.  One
# contiguous (3, C) slice gather per column fetches all three z taps (27
# fetches -> 9; the chip profile shows conv cost is per-fetch, not
# per-byte).  A fixed 6-combo masked-GEMM expansion maps fetched slot p to
# kernel z-offset dz (host-precomputed codes).
# --------------------------------------------------------------------------

def build_ztriple_plan(nbr: np.ndarray, n_pad: int):
    """nbr (N, 27) -> (base (N, 9) int32, codes (N, 9, 3) int8).

    base[c] = first row of column c's existing z-run (clamped to
    [0, n_pad-3]); codes[c, p] = kernel z-offset (-1/0/1) that fetched slot
    p carries, or -2 if none.
    """
    big = np.iinfo(np.int32).max
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


_ZT_COMBOS = ((0, -1), (0, 0), (0, 1), (1, 0), (1, 1), (2, 1))


def conv3_ztriple(x, base, codes, w, out_valid=None,
                  compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32):
    """x (N_pad, C); base/codes from build_ztriple_plan; w (27, Cin, Cout)
    in kernel_offsets order (z fastest)."""
    cin, cout = w.shape[1], w.shape[2]
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))
    acc = jnp.zeros((base.shape[0], cout), accum_dtype)
    for c in range(9):
        trip = lax.gather(xb, base[:, c:c + 1], dn, slice_sizes=(3, cin),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        for p, dz in _ZT_COMBOS:
            m = codes[:, c, p] == dz
            xi = jnp.where(m[:, None], trip[:, p], 0)
            acc = acc + jnp.dot(xi, wb[c * 3 + dz + 1],
                                preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def conv3_zx3(x, base, codes, w, out_valid=None,
              compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32,
              int8=False):
    """z-triple conv on the FAST gather path: materialize
    x3[i] = [x[i-1], x[i], x[i+1]] (contiguous rolls, (N, 3C)) and fetch one
    3C-wide row per column (9 fetches instead of 27).  The fetched triple is
    re-aligned to kernel z-offsets with the host codes (6 masked adds that
    fuse into the GEMM feeds), so FLOPs match the baseline conv."""
    cin, cout = w.shape[1], w.shape[2]
    n = x.shape[0]
    xb = x.astype(compute_dtype)
    if int8:
        q, scale = sparse.quantize_rows(x)
        wb = (w.astype(jnp.float32) * scale[None, :, None]).astype(
            compute_dtype)
        xsrc = q
    else:
        wb = w.astype(compute_dtype)
        xsrc = xb
    x3 = jnp.concatenate([jnp.roll(xsrc, 1, 0), xsrc,
                          jnp.roll(xsrc, -1, 0)], axis=1)  # (N, 3C)
    acc = jnp.zeros((base.shape[0], cout), accum_dtype)
    for c in range(9):
        # fetch rows centered at base+1 so slots (p=0,1,2) = rows base+p
        trip = sparse.fast_row_gather(
            x3, jnp.minimum(base[:, c] + 1, n - 1)).reshape(-1, 3, cin)
        trip = trip.astype(compute_dtype)
        for dz in (-1, 0, 1):
            # align: Sum_p m_{p,dz} trip[p]  (masks mutually exclusive)
            xi = jnp.zeros((base.shape[0], cin), compute_dtype)
            for p in range(3):
                if (p, dz) not in _ZT_COMBOS:
                    continue
                m = codes[:, c, p] == dz
                xi = xi + jnp.where(m[:, None], trip[:, p], 0)
            acc = acc + jnp.dot(xi, wb[c * 3 + dz + 1],
                                preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def conv3_zpair(x, base, codes, w, out_valid=None,
                compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32):
    """z-run conv with PAIR fetches: one 2C-wide row (slots 0,1) + one C
    row (slot 2) per column — 27 -> 18 fetches, rows <= 384 B at C=96
    (the chip shows <=384 B rows cost one fetch unit)."""
    cin, cout = w.shape[1], w.shape[2]
    n = x.shape[0]
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    x2 = jnp.concatenate([xb, jnp.roll(xb, -1, 0)], axis=1)  # row i = [x i, x i+1]
    acc = jnp.zeros((base.shape[0], cout), accum_dtype)
    for c in range(9):
        b = base[:, c]
        pair = sparse.fast_row_gather(x2, b).reshape(-1, 2, cin)
        single = sparse.fast_row_gather(xb, jnp.minimum(b + 2, n - 1))
        for dz in (-1, 0, 1):
            xi = jnp.zeros((base.shape[0], cin), compute_dtype)
            for p in range(3):
                if (p, dz) not in _ZT_COMBOS:
                    continue
                m = codes[:, c, p] == dz
                src = single if p == 2 else pair[:, p]
                xi = xi + jnp.where(m[:, None], src, 0)
            acc = acc + jnp.dot(xi, wb[c * 3 + dz + 1],
                                preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def section_zpair(scenes, batch):
    maps = batch["maps"]
    rng = np.random.default_rng(6)
    for lvl, c in [(0, 96), (1, 96), (2, 128), (0, 32)]:
        nbr_np = np.asarray(maps[f"nbr3_{lvl}"])
        n_pad = nbr_np.shape[0]
        base, codes = build_ztriple_plan(nbr_np, n_pad)
        nbr = jnp.asarray(nbr_np)
        valid = jnp.asarray(maps[f"valid_{lvl}"])
        basej, codesj = jnp.asarray(base), jnp.asarray(codes)
        x = jnp.asarray(rng.standard_normal((n_pad, c)), jnp.bfloat16)
        w27 = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05,
                          jnp.bfloat16)
        ref_fn = jax.jit(lambda x, nbr, valid, w: sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16))
        base_t = jax.jit(lambda x, nbr, valid, w: jnp.sum(sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16),
            dtype=jnp.float32))
        f = jax.jit(lambda x, b, cd, v, w: conv3_zpair(
            x, b, cd, w, v, accum_dtype=jnp.bfloat16))
        f_t = jax.jit(lambda x, b, cd, v, w: jnp.sum(conv3_zpair(
            x, b, cd, w, v, accum_dtype=jnp.bfloat16), dtype=jnp.float32))
        ref = np.asarray(ref_fn(x, nbr, valid, w27).astype(jnp.float32))
        got = np.asarray(f(x, basej, codesj, valid, w27)
                         .astype(jnp.float32))
        vm = np.asarray(valid)
        err = np.abs(got[vm] - ref[vm]).max() / (np.abs(ref[vm]).max() + 1e-6)
        dt0 = slope(base_t, x, nbr, valid, w27)
        dt1 = slope(f_t, x, basej, codesj, valid, w27)
        print(f"L{lvl} C={c:3d} N={n_pad:6d}: gather {dt0*1e3:6.2f} ms | "
              f"zpair {dt1*1e3:6.2f} ms ({dt0/dt1:.2f}x, err {err:.1e})",
              flush=True)


def conv3_zx2(x, base, codes, w, out_valid=None,
              compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32):
    """z-run conv, TWO fetches per column from ONE rolled-pair array:
    x2[i] = [x[i], x[i+1]] (N, 2C); fetch x2[base] (slots 0,1) and
    x2[base+2] (slot 2 = its first half) — 18 fetches, 2C-lane rows
    (192 lanes at C=96, under the zx3 288-lane cliff)."""
    cin, cout = w.shape[1], w.shape[2]
    n = x.shape[0]
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    x2 = jnp.concatenate([xb, jnp.roll(xb, -1, 0)], axis=1)
    acc = jnp.zeros((base.shape[0], cout), accum_dtype)
    for c in range(9):
        b = base[:, c]
        lo = sparse.fast_row_gather(x2, b).reshape(-1, 2, cin)
        hi = sparse.fast_row_gather(
            x2, jnp.minimum(b + 2, n - 1)).reshape(-1, 2, cin)
        slotv = (lo[:, 0], lo[:, 1], hi[:, 0])
        for dz in (-1, 0, 1):
            xi = jnp.zeros((base.shape[0], cin), compute_dtype)
            for p in range(3):
                if (p, dz) not in _ZT_COMBOS:
                    continue
                m = codes[:, c, p] == dz
                xi = xi + jnp.where(m[:, None], slotv[p], 0)
            acc = acc + jnp.dot(xi, wb[c * 3 + dz + 1],
                                preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def conv3_zsplit(x, base, codes, w, out_valid=None,
                 compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32):
    """zx3 with the 3C row split into two half-feature arrays — 18 fetches
    of 3*(C/2) lanes (144 at C=96) from two (N, 3C/2) sources."""
    cin, cout = w.shape[1], w.shape[2]
    half = cin // 2
    n = x.shape[0]
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    halves = []
    for sl in (slice(0, half), slice(half, cin)):
        xh = xb[:, sl]
        halves.append(jnp.concatenate(
            [jnp.roll(xh, 1, 0), xh, jnp.roll(xh, -1, 0)], axis=1))
    acc = jnp.zeros((base.shape[0], cout), accum_dtype)
    for c in range(9):
        idx = jnp.minimum(base[:, c] + 1, n - 1)
        tripa = sparse.fast_row_gather(halves[0], idx).reshape(-1, 3, half)
        tripb = sparse.fast_row_gather(halves[1], idx).reshape(-1, 3, half)
        for dz in (-1, 0, 1):
            xia = jnp.zeros((base.shape[0], half), compute_dtype)
            xib = jnp.zeros((base.shape[0], half), compute_dtype)
            for p in range(3):
                if (p, dz) not in _ZT_COMBOS:
                    continue
                m = (codes[:, c, p] == dz)[:, None]
                xia = xia + jnp.where(m, tripa[:, p], 0)
                xib = xib + jnp.where(m, tripb[:, p], 0)
            wk = wb[c * 3 + dz + 1]
            acc = acc + jnp.dot(xia, wk[:half],
                                preferred_element_type=accum_dtype)
            acc = acc + jnp.dot(xib, wk[half:],
                                preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def conv3_csplit(x, nbr, w, out_valid=None, parts=2,
                 compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32):
    """Baseline 27-tap conv with each row gather split into `parts`
    feature-chunks from separate (N, C/parts) sources — tests whether
    narrow-lane gathers beat one wide gather at C>=256."""
    cin, cout = w.shape[1], w.shape[2]
    step = cin // parts
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    srcs = [jnp.asarray(xb[:, i * step:(i + 1) * step]) for i in range(parts)]
    acc = jnp.zeros((nbr.shape[0], cout), accum_dtype)
    for k in range(27):
        idx = jnp.maximum(nbr[:, k], 0)
        m = (nbr[:, k] >= 0)[:, None]
        for i in range(parts):
            xi = jnp.where(m, sparse.fast_row_gather(srcs[i], idx), 0)
            acc = acc + jnp.dot(xi, wb[k, i * step:(i + 1) * step],
                                preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def conv3_unroll(x, nbr, w, out_valid=None,
                 compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32):
    """Baseline gather conv with the 27-tap loop UNROLLED (no lax.scan) —
    lets XLA overlap/pipeline independent gathers."""
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    acc = jnp.zeros((nbr.shape[0], w.shape[2]), accum_dtype)
    for k in range(27):
        idx = jnp.maximum(nbr[:, k], 0)
        xi = jnp.where((nbr[:, k] >= 0)[:, None],
                       sparse.fast_row_gather(xb, idx), 0)
        acc = acc + jnp.dot(xi, wb[k], preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def _run_variant(maps, rng, lvl, c, name, make_fn, needs_plan):
    nbr_np = np.asarray(maps[f"nbr3_{lvl}"])
    n_pad = nbr_np.shape[0]
    nbr = jnp.asarray(nbr_np)
    valid = jnp.asarray(maps[f"valid_{lvl}"])
    x = jnp.asarray(rng.standard_normal((n_pad, c)), jnp.bfloat16)
    w27 = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05, jnp.bfloat16)
    ref_fn = jax.jit(lambda x, nbr, valid, w: sparse.sparse_conv(
        x, nbr, w, None, valid, accum_dtype=jnp.bfloat16))
    base_t = jax.jit(lambda x, nbr, valid, w: jnp.sum(sparse.sparse_conv(
        x, nbr, w, None, valid, accum_dtype=jnp.bfloat16),
        dtype=jnp.float32))
    if needs_plan:
        bs, cd = build_ztriple_plan(nbr_np, n_pad)
        bs, cd = jnp.asarray(bs), jnp.asarray(cd)
        args = (x, bs, cd, valid, w27)
        fn = make_fn()
        f = jax.jit(lambda x, b, c_, v, w: fn(x, b, c_, w, v))
        f_t = jax.jit(lambda x, b, c_, v, w: jnp.sum(
            fn(x, b, c_, w, v), dtype=jnp.float32))
    else:
        args = (x, nbr, valid, w27)
        fn = make_fn()
        f = jax.jit(lambda x, n, v, w: fn(x, n, w, v))
        f_t = jax.jit(lambda x, n, v, w: jnp.sum(
            fn(x, n, w, v), dtype=jnp.float32))
    ref = np.asarray(ref_fn(x, nbr, valid, w27).astype(jnp.float32))
    got = np.asarray(f(*args).astype(jnp.float32))
    vm = np.asarray(valid)
    err = np.abs(got[vm] - ref[vm]).max() / (np.abs(ref[vm]).max() + 1e-6)
    dt0 = slope(base_t, x, nbr, valid, w27)
    dt1 = slope(f_t, *args)
    print(f"L{lvl} C={c:3d} N={n_pad:6d}: gather {dt0*1e3:6.2f} ms | "
          f"{name} {dt1*1e3:6.2f} ms ({dt0/dt1:.2f}x, err {err:.1e})",
          flush=True)


def conv3_zx3_unroll_gemm(x, base, codes, w, out_valid=None,
                          compute_dtype=jnp.bfloat16,
                          accum_dtype=jnp.float32):
    """zx3 with the 27 masked GEMMs collapsed to 9 (one (3C)x(Cout) GEMM per
    column on the aligned triple) — tests GEMM-count overhead at small N."""
    cin, cout = w.shape[1], w.shape[2]
    n = x.shape[0]
    xb = x.astype(compute_dtype)
    wb = w.astype(compute_dtype)
    x3 = jnp.concatenate([jnp.roll(xb, 1, 0), xb, jnp.roll(xb, -1, 0)],
                         axis=1)
    acc = jnp.zeros((base.shape[0], cout), accum_dtype)
    for c in range(9):
        trip = sparse.fast_row_gather(x3, jnp.minimum(base[:, c] + 1, n - 1))
        trip = trip.reshape(-1, 3, cin)
        # re-align slots to z-offsets, then one wide GEMM with the 3 taps
        # stacked: wide[:, p*cin:(p+1)*cin] @ w3[p]
        aligned = []
        for dz in (-1, 0, 1):
            xi = jnp.zeros((base.shape[0], cin), compute_dtype)
            for p in range(3):
                if (p, dz) not in _ZT_COMBOS:
                    continue
                m = codes[:, c, p] == dz
                xi = xi + jnp.where(m[:, None], trip[:, p], 0)
            aligned.append(xi)
        wide = jnp.concatenate(aligned, axis=1)
        w3 = jnp.concatenate([wb[c * 3], wb[c * 3 + 1], wb[c * 3 + 2]],
                             axis=0)
        acc = acc + jnp.dot(wide, w3, preferred_element_type=accum_dtype)
    if out_valid is not None:
        acc = jnp.where(out_valid[:, None], acc, 0)
    return acc.astype(x.dtype)


def section_wave3(scenes, batch):
    maps = batch["maps"]
    rng = np.random.default_rng(8)
    un = lambda: (lambda x, n, w, v: conv3_unroll(
        x, n, w, v, accum_dtype=jnp.bfloat16))
    zg = lambda: (lambda x, b, c_, w, v: conv3_zx3_unroll_gemm(
        x, b, c_, w, v, accum_dtype=jnp.bfloat16))
    z3 = lambda: (lambda x, b, c_, w, v: conv3_zx3(
        x, b, c_, w, v, accum_dtype=jnp.bfloat16))
    specs = [
        ("unroll", 4, 256, un, False),
        ("unroll", 3, 128, un, False),
        ("unroll", 2, 128, un, False),
        ("unroll", 2, 64, un, False),
        ("unroll", 1, 96, un, False),
        ("unroll", 1, 32, un, False),
        ("zx3gemm", 2, 64, zg, True),
        ("zx3gemm", 1, 32, zg, True),
        ("zx3", 3, 128, z3, True),
        ("zx3", 4, 256, z3, True),
    ]
    for name, lvl, c, mk, plan in specs:
        _run_variant(maps, rng, lvl, c, name, mk, plan)


def section_wave2(scenes, batch):
    maps = batch["maps"]
    rng = np.random.default_rng(7)
    specs = [
        ("unroll", 0, 96, lambda: (lambda x, n, w, v: conv3_unroll(
            x, n, w, v, accum_dtype=jnp.bfloat16)), False),
        ("unroll", 3, 256, lambda: (lambda x, n, w, v: conv3_unroll(
            x, n, w, v, accum_dtype=jnp.bfloat16)), False),
        ("csplit2", 3, 256, lambda: (lambda x, n, w, v: conv3_csplit(
            x, n, w, v, parts=2, accum_dtype=jnp.bfloat16)), False),
        ("csplit2", 4, 256, lambda: (lambda x, n, w, v: conv3_csplit(
            x, n, w, v, parts=2, accum_dtype=jnp.bfloat16)), False),
        ("csplit2", 2, 128, lambda: (lambda x, n, w, v: conv3_csplit(
            x, n, w, v, parts=2, accum_dtype=jnp.bfloat16)), False),
        ("zx2", 0, 96, lambda: (lambda x, b, c_, w, v: conv3_zx2(
            x, b, c_, w, v, accum_dtype=jnp.bfloat16)), True),
        ("zx2", 1, 96, lambda: (lambda x, b, c_, w, v: conv3_zx2(
            x, b, c_, w, v, accum_dtype=jnp.bfloat16)), True),
        ("zsplit", 0, 96, lambda: (lambda x, b, c_, w, v: conv3_zsplit(
            x, b, c_, w, v, accum_dtype=jnp.bfloat16)), True),
        ("zsplit", 1, 96, lambda: (lambda x, b, c_, w, v: conv3_zsplit(
            x, b, c_, w, v, accum_dtype=jnp.bfloat16)), True),
        ("zsplit", 3, 256, lambda: (lambda x, b, c_, w, v: conv3_zsplit(
            x, b, c_, w, v, accum_dtype=jnp.bfloat16)), True),
    ]
    for name, lvl, c, mk, plan in specs:
        _run_variant(maps, rng, lvl, c, name, mk, plan)


def section_zx3(scenes, batch):
    maps = batch["maps"]
    rng = np.random.default_rng(5)
    for lvl, c, i8 in [(0, 96, False), (0, 96, True), (1, 96, False),
                       (1, 32, False), (2, 64, False), (2, 128, False)]:
        nbr_np = np.asarray(maps[f"nbr3_{lvl}"])
        n_pad = nbr_np.shape[0]
        base, codes = build_ztriple_plan(nbr_np, n_pad)
        nbr = jnp.asarray(nbr_np)
        valid = jnp.asarray(maps[f"valid_{lvl}"])
        basej, codesj = jnp.asarray(base), jnp.asarray(codes)
        x = jnp.asarray(rng.standard_normal((n_pad, c)), jnp.bfloat16)
        w27 = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05,
                          jnp.bfloat16)
        ref_fn = jax.jit(lambda x, nbr, valid, w: sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16))
        base_t = jax.jit(lambda x, nbr, valid, w: jnp.sum(sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16),
            dtype=jnp.float32))
        f = jax.jit(lambda x, b, cd, v, w: conv3_zx3(
            x, b, cd, w, v, accum_dtype=jnp.bfloat16, int8=i8))
        f_t = jax.jit(lambda x, b, cd, v, w: jnp.sum(conv3_zx3(
            x, b, cd, w, v, accum_dtype=jnp.bfloat16, int8=i8),
            dtype=jnp.float32))
        ref = np.asarray(ref_fn(x, nbr, valid, w27).astype(jnp.float32))
        got = np.asarray(f(x, basej, codesj, valid, w27)
                         .astype(jnp.float32))
        vm = np.asarray(valid)
        err = np.abs(got[vm] - ref[vm]).max() / (np.abs(ref[vm]).max() + 1e-6)
        dt0 = slope(base_t, x, nbr, valid, w27)
        dt1 = slope(f_t, x, basej, codesj, valid, w27)
        tag = " int8" if i8 else ""
        print(f"L{lvl} C={c:3d}{tag} N={n_pad:6d}: gather {dt0*1e3:6.2f} ms"
              f" | zx3 {dt1*1e3:6.2f} ms ({dt0/dt1:.2f}x, err {err:.1e})",
              flush=True)


def section_ztriple(scenes, batch):
    maps = batch["maps"]
    rng = np.random.default_rng(4)
    for lvl, c in [(0, 96), (1, 96), (1, 32), (2, 128), (3, 256)]:
        nbr_np = np.asarray(maps[f"nbr3_{lvl}"])
        n_pad = nbr_np.shape[0]
        base, codes = build_ztriple_plan(nbr_np, n_pad)
        nbr = jnp.asarray(nbr_np)
        valid = jnp.asarray(maps[f"valid_{lvl}"])
        basej, codesj = jnp.asarray(base), jnp.asarray(codes)
        x = jnp.asarray(rng.standard_normal((n_pad, c)), jnp.bfloat16)
        w27 = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05,
                          jnp.bfloat16)
        ref_fn = jax.jit(lambda x, nbr, valid, w: sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16))
        base_t = jax.jit(lambda x, nbr, valid, w: jnp.sum(sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16),
            dtype=jnp.float32))
        f = jax.jit(lambda x, b, cd, v, w: conv3_ztriple(
            x, b, cd, w, v, accum_dtype=jnp.bfloat16))
        f_t = jax.jit(lambda x, b, cd, v, w: jnp.sum(conv3_ztriple(
            x, b, cd, w, v, accum_dtype=jnp.bfloat16), dtype=jnp.float32))
        ref = np.asarray(ref_fn(x, nbr, valid, w27).astype(jnp.float32))
        got = np.asarray(f(x, basej, codesj, valid, w27)
                         .astype(jnp.float32))
        vm = np.asarray(valid)
        err = np.abs(got[vm] - ref[vm]).max() / (np.abs(ref[vm]).max() + 1e-6)
        dt0 = slope(base_t, x, nbr, valid, w27)
        dt1 = slope(f_t, x, basej, codesj, valid, w27)
        print(f"L{lvl} C={c:3d} N={n_pad:6d}: gather {dt0*1e3:6.2f} ms | "
              f"ztriple {dt1*1e3:6.2f} ms ({dt0/dt1:.2f}x, err {err:.1e})",
              flush=True)


def section_convs(scenes, batch):
    maps = batch["maps"]
    rng = np.random.default_rng(1)
    # model channel widths entering each level's 3^3 stages
    stage_specs = [
        # (level, C, n_convs_at_this_width, tag)
        (0, 96, 4, "stage8 dec L0"),
        (1, 32, 4, "stage1 enc L1"),
        (1, 96, 4, "stage7 dec L1"),
        (2, 64, 6, "stage2 enc L2"),
        (2, 128, 4, "stage6 dec L2"),
        (3, 128, 8, "stage3 enc L3"),
        (3, 256, 4, "stage5 dec L3"),
        (4, 256, 12, "stage4 enc L4"),
    ]
    total = 0.0
    for lvl, c, n, tag in stage_specs:
        nbr = jnp.asarray(maps[f"nbr3_{lvl}"])
        valid = jnp.asarray(maps[f"valid_{lvl}"])
        nvox = nbr.shape[0]
        x = jnp.asarray(rng.standard_normal((nvox, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05, jnp.bfloat16)
        f = jax.jit(lambda x, nbr, valid, w: jnp.sum(sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16),
            dtype=jnp.float32))
        dt = slope(f, x, nbr, valid, w)
        total += dt * n
        print(f"conv3 L{lvl} C={c:3d} N={nvox:6d}: {dt*1e3:7.2f} ms "
              f"x{n:2d} = {dt*n*1e3:6.1f} ms  ({tag})", flush=True)
    print(f"# all 3^3 convs (est total): {total*1e3:.1f} ms", flush=True)
    # down / up ladder convs
    for lvl, cin, cout in [(0, 32, 32), (1, 32, 64), (2, 64, 128),
                           (3, 128, 256)]:
        child = jnp.asarray(maps[f"child_{lvl}"])
        parent = jnp.asarray(maps[f"parent_{lvl}"])
        poff = jnp.asarray(maps[f"parent_off_{lvl}"])
        vf = jnp.asarray(maps[f"valid_{lvl}"])
        vc = jnp.asarray(maps[f"valid_{lvl+1}"])
        nf = parent.shape[0]
        x = jnp.asarray(rng.standard_normal((nf, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((8, cin, cout)) * .05,
                        jnp.bfloat16)
        f = jax.jit(lambda x, child, vc, w: jnp.sum(sparse.sparse_conv(
            x, child, w, None, vc, accum_dtype=jnp.bfloat16),
            dtype=jnp.float32))
        dt = slope(f, x, child, vc, w)
        xc = jnp.asarray(rng.standard_normal((child.shape[0], cout)),
                         jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((8, cout, cin)) * .05,
                         jnp.bfloat16)
        g = jax.jit(lambda xc, parent, poff, vf, wt: jnp.sum(
            sparse.sparse_conv_transpose(
                xc, parent, poff, wt, vf, accum_dtype=jnp.bfloat16),
            dtype=jnp.float32))
        dt2 = slope(g, xc, parent, poff, vf, wt)
        print(f"down conv L{lvl}->L{lvl+1} C{cin}->{cout}: {dt*1e3:6.2f} ms; "
              f"up conv: {dt2*1e3:6.2f} ms", flush=True)


def section_dense3(scenes, batch):
    maps = batch["maps"]
    rng = np.random.default_rng(2)
    for lvl, c in [(0, 96), (0, 32), (1, 96), (1, 32)]:
        coords = [s["hierarchy"].coords[lvl][:s["hierarchy"].num_voxels[lvl]]
                  for s in scenes]
        nbr = jnp.asarray(maps[f"nbr3_{lvl}"])
        valid = jnp.asarray(maps[f"valid_{lvl}"])
        nvox = nbr.shape[0]
        x = jnp.asarray(rng.standard_normal((nvox, c)), jnp.bfloat16)
        w27 = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05,
                          jnp.bfloat16)
        base = jax.jit(lambda x, nbr, valid, w: sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16))
        base_t = jax.jit(lambda x, nbr, valid, w: jnp.sum(sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16),
            dtype=jnp.float32))
        dt0 = slope(base_t, x, nbr, valid, w27)
        line = (f"L{lvl} C={c:3d} N={nvox:6d}: gather {dt0*1e3:6.2f} ms")
        for blk in (4, 8):
            plan = build_block_plan(coords, blk, n_pad=nvox)
            occ = (plan["c2v"] >= 0).mean()
            planj = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                     for k, v in plan.items()}
            f = jax.jit(lambda x, w, p=planj: conv3_dense_block(
                x, p, w, accum_dtype=jnp.bfloat16))
            f_t = jax.jit(lambda x, w, p=planj: jnp.sum(conv3_dense_block(
                x, p, w, accum_dtype=jnp.bfloat16), dtype=jnp.float32))
            # numeric check once (bf16 tolerance)
            ref = np.asarray(base(x, nbr, valid, w27).astype(jnp.float32))
            got = np.asarray(f(x, w27).astype(jnp.float32))
            vmask = np.asarray(valid)
            err = np.abs(got[vmask] - ref[vmask]).max()
            scale = np.abs(ref[vmask]).max() + 1e-6
            dt = slope(f_t, x, w27)
            line += (f" | b={blk}: {dt*1e3:6.2f} ms (occ {occ:.2f}, "
                     f"err {err/scale:.1e})")
        print(line, flush=True)


def section_model(scenes, batch):
    from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                         MaskHeadCfg, VoxelEncoderCfg)
    from pq3d_tpu.models.sparse_unet import Res16UNet
    rng = np.random.default_rng(3)
    S = 64 if SMOKE else 512
    b = {**batch}
    b["mv_seg_fts"] = rng.standard_normal((BATCH, S, 768)).astype(np.float32)
    b["mv_seg_pad_masks"] = b["seg_pad_masks"]
    b["pc_seg_fts"] = rng.standard_normal((BATCH, S, 768)).astype(np.float32)
    b["pc_seg_pad_masks"] = b["seg_pad_masks"]
    b = {k: v for k, v in b.items() if not k.startswith("_")}
    b = jax.tree.map(jnp.asarray, b)
    model = Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",),
        hidden_size=96 if SMOKE else 768, dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1 if SMOKE else 4,
                                  num_blocks=1 if SMOKE else 3,
                                  num_attention_heads=12,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1, 2, 3), accum="bfloat16"),
        mask_head_cfg=MaskHeadCfg(num_targets=201,
                                  filter_out_classes=(0, 2)))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        b, train=False)
    fwd = jax.jit(lambda v, bb: sum(
        jnp.sum(x) for x in jax.tree.leaves(model.apply(v, bb, train=False))))
    dt_full = slope(fwd, variables, b)
    print(f"full model fwd: {dt_full*1e3:7.1f} ms", flush=True)

    unet = Res16UNet(out_channels=200, accum="bfloat16",
                     conv1_kernel_size=5)
    uvars = jax.jit(unet.init, static_argnames=("train",))(
        jax.random.key(0), b["voxel_feats"], b["maps"], train=False)
    ufwd = jax.jit(lambda v, x, m: sum(
        jnp.sum(o) for o in jax.tree.leaves(
            unet.apply(v, x, m, train=False))))
    dt_u = slope(ufwd, uvars, b["voxel_feats"], b["maps"])
    print(f"U-Net fwd alone: {dt_u*1e3:7.1f} ms "
          f"(decoder+heads+pool ~= {1e3*(dt_full-dt_u):.1f} ms)", flush=True)


def main():
    sections = sys.argv[1:] or ["convs", "dense3", "model"]

    t0 = time.time()
    scenes, batch = build()
    print(f"host build: {time.time()-t0:.1f}s; "
          f"N0={batch['maps']['valid_0'].shape[0]}", flush=True)
    if "convs" in sections:
        section_convs(scenes, batch)
    if "ztriple" in sections:
        section_ztriple(scenes, batch)
    if "zx3" in sections:
        section_zx3(scenes, batch)
    if "wave2" in sections:
        section_wave2(scenes, batch)
    if "wave3" in sections:
        section_wave3(scenes, batch)
    if "zpair" in sections:
        section_zpair(scenes, batch)
    if "dense3" in sections:
        section_dense3(scenes, batch)
    if "model" in sections:
        section_model(scenes, batch)


if __name__ == "__main__":
    main()
