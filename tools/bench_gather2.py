"""Microbenchmark round 4: what breaks the random-fetch floor?

The L0/L1 96-channel decoder convs sit at ~75 GB/s effective random-row
fetch (PERF.md round-3: every gather variant lost).  Three hypotheses this
measures on the chip:

1. ALIGNMENT: a 96-ch bf16 row is 192 B = 1.5x the 128 B lane granule, so
   every fetch straddles granules.  Storing the SAME features padded to
   C=128 (256 B aligned) may lift useful bandwidth even though 25% of the
   fetched bytes are pad.  -> compare effective-useful GB/s of C=96 vs
   C=128-stored (x0.75) vs C=64.

2. SEGMENT SIZE: fetching s consecutive rows per index (slice_sizes=(s,C))
   amortizes per-fetch overhead.  If s=8..32 segments reach >300 GB/s, a
   box/window conv plan (27 contiguous segment fetches per Morton box
   instead of 27 random rows per voxel) beats the floor structurally.

3. ONE-HOT MXU GATHER: a within-slab gather is a one-hot matmul
   S(K x R) @ slab(R x C).  If the MXU sustains >50 TF/s on these shapes,
   gathers can be moved off the fetch unit entirely at R/C x FLOP cost.

Usage: python tools/bench_gather2.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)


def slope_time(fn, *args, r1=4, r2=16):
    """Chained-reps slope timing.

    Repeated IDENTICAL dispatches are unreliable over the axon relay
    (observed: the same case measured 0.8 GB/s in one session and ~0 ms in
    the next — per-dispatch readback is not a trustworthy fence here).  So:
    chain R reps inside ONE jitted fori_loop with a data dependency from
    each rep's output into the next rep's inputs (XLA cannot hoist or dedup
    the body), read back ONE scalar, and take the slope between two rep
    counts so compile/dispatch constants cancel.
    """
    def chained(r):
        @jax.jit
        def run(*a):
            def body(i, carry):
                acc = carry
                out = fn(*a, acc)
                # reduce over the WHOLE output: consuming one element would
                # let XLA slice the gather down to a single row (DCE)
                v = jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
                return acc + v * 1e-30
            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))
        t = run(*args)
        _ = float(t)  # compile + warm
        t0 = time.time()
        _ = float(run(*args))
        return time.time() - t0

    chained(r1)
    t1, t2 = chained(r1), chained(r2)
    return max((t2 - t1) / (r2 - r1), 1e-9)


def dep(ix, acc):
    """Fold the loop-carried acc into an index array as a no-op (acc stays
    ~1e-30-scale, the predicate is always False) so the conv/gather body is
    data-dependent on the previous rep and cannot be hoisted or deduped."""
    return ix + (acc > 1e30).astype(ix.dtype)


def row_gather(x, idx):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(
        x, idx[:, None], dn, slice_sizes=(1, x.shape[1]),
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def seg_gather(x, idx, s):
    """Gather s consecutive rows starting at each idx -> (W, s, C).

    WARNING — DO NOT USE ON THE AXON TPU: this exact gather shape
    (``slice_sizes=(s, C)``, ``collapsed_slice_dims=()``) deterministically
    crashes the axon TPU worker with a kernel fault (see PERF.md round-4,
    chip_runs/0820a/gather2_run4.log).  Kept only as documentation of the
    crashing pattern; express block fetches as row gathers over an
    (N/s, s*C) reshape instead (what this benchmark now does).
    """
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    return jax.lax.gather(
        x, idx[:, None], dn, slice_sizes=(s, x.shape[1]),
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def main():
    rng = np.random.default_rng(0)
    N = 262144          # bench-scale flat batch (4 x 65536)
    total_rows = N * 27  # rows a 3^3 conv fetches

    print("== 0. calibration: 4096^3 bf16 matmul (expect ~O(100) TF/s) ==",
          flush=True)
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
    dt = slope_time(
        lambda a, b, acc: jnp.dot(a + (acc > 1e30).astype(jnp.bfloat16), b,
                                  preferred_element_type=jnp.bfloat16),
        a, b)
    print(f"matmul 4096^3: {dt*1e3:7.2f} ms  {2*4096**3/dt/1e12:6.1f} TF/s",
          flush=True)

    print("== 1. alignment: random single-row gather, 27N rows ==",
          flush=True)
    idx = rng.integers(0, N, total_rows).astype(np.int32)
    for C_store, C_use in [(64, 64), (96, 96), (128, 128), (128, 96),
                           (192, 192), (256, 256)]:
        x = jnp.asarray(rng.standard_normal((N, C_store)), jnp.bfloat16)
        ix = jnp.asarray(idx)
        dt = slope_time(lambda x, ix, acc: row_gather(x, dep(ix, acc)), x, ix)
        fetched = total_rows * C_store * 2
        useful = total_rows * C_use * 2
        print(f"rows C_store={C_store:3d} (useful {C_use:3d}): "
              f"{dt*1e3:7.2f} ms  fetched {fetched/dt/1e9:6.1f} GB/s  "
              f"useful {useful/dt/1e9:6.1f} GB/s", flush=True)

    print("== 2. block gathers: same useful bytes, s-row blocks ==",
          flush=True)
    # NOTE: a true segment gather (slice_sizes=(s, C), collapsed_slice_dims
    # =()) deterministically CRASHES the axon TPU worker (kernel fault,
    # chip_runs/0820a/gather2_run4.log) — express the s-row block fetch as
    # a plain row gather over the (N/s, s*C) reshape instead (aligned
    # blocks, same bytes per fetch, same hypothesis).
    C = 96
    xb = rng.standard_normal((N, C)).astype(np.float32)
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = jnp.asarray(xb.reshape(N // s, s * C), jnp.bfloat16)
        W = total_rows // s
        ix = jnp.asarray(rng.integers(0, N // s, W).astype(np.int32))
        dt = slope_time(lambda x, ix, acc: row_gather(x, dep(ix, acc)), x, ix)
        bts = W * s * C * 2
        print(f"block s={s:3d} C={C} ({s*C*2:6d} B/fetch): {dt*1e3:7.2f} ms  "
              f"{bts/dt/1e9:6.1f} GB/s  "
              f"({W/dt/1e6:5.1f} Mfetch/s)", flush=True)

    print("== 3. one-hot MXU gather: S(KxR) @ slab(RxC) per window ==",
          flush=True)
    # windows of 256 outputs, 27 taps -> K=6912 selected rows per window
    for R in (256, 512, 1024):
        for C in (96, 128):
            # cap the materialized one-hot at ~2 GB bf16 (XLA materializes
            # dot operands); report per-row numbers so cases stay comparable
            Wn = min(N // 256, int(1e9) // (27 * 256 * R))
            sel = rng.integers(0, R, (Wn, 27 * 256)).astype(np.int32)
            slab = jnp.asarray(rng.standard_normal((Wn, R, C)), jnp.bfloat16)
            sel = jnp.asarray(sel)

            def onehot_gather(sel, slab, acc):
                oh = (dep(sel, acc)[..., None] ==
                      jnp.arange(slab.shape[1], dtype=jnp.int32)
                      ).astype(jnp.bfloat16)
                return jnp.einsum("wkr,wrc->wkc", oh, slab,
                                  preferred_element_type=jnp.bfloat16)

            dt = slope_time(onehot_gather, sel, slab)
            fl = 2 * Wn * 27 * 256 * R * C
            print(f"onehot R={R:5d} C={C}: {dt*1e3:7.2f} ms  "
                  f"{fl/dt/1e12:6.2f} TF/s  "
                  f"({Wn*27*256} rows = {Wn*27*256*C*2/dt/1e9:.0f} GB/s "
                  f"equivalent)", flush=True)

    print("== 4. slab fetch: W aligned R-row windows (as block rows) ==",
          flush=True)
    C = 96
    xb4 = rng.standard_normal((N, C)).astype(np.float32)
    for R in (256, 512, 1024):
        x = jnp.asarray(xb4.reshape(N // R, R * C), jnp.bfloat16)
        Wn = N // 256          # overlap factor R/256
        ix = jnp.asarray(rng.integers(0, N // R, Wn).astype(np.int32))
        dt = slope_time(lambda x, ix, acc: row_gather(x, dep(ix, acc)), x, ix)
        bts = Wn * R * C * 2
        print(f"slab R={R:5d} ({R*C*2} B/fetch): {dt*1e3:7.2f} ms  "
              f"{bts/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
