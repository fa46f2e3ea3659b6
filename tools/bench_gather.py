"""Microbenchmark: TPU row-gather bandwidth vs row size, dtype, index
pattern, and the indices_are_sorted hint; plus block-of-8 gathers.

Informs the sparse-conv optimization ladder (PERF.md "Remaining bottleneck").
Slope timing per PERF.md: chain R reps in one jitted fori_loop, time two rep
counts, take the difference quotient (cancels tunnel RTT).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)

_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))


def gather(x, idx, sorted_hint):
    return jax.lax.gather(
        x, idx[:, None], _DN, slice_sizes=(1, x.shape[1]),
        indices_are_sorted=sorted_hint, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def slope_time(fn, *args, r1=4, r2=16):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

    def run(r):
        t0 = time.time()
        o = f(*args)
        for _ in range(r - 1):
            o = f(*args)
        _ = float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
        return time.time() - t0

    run(r1)
    t1, t2 = run(r1), run(r2)
    return max((t2 - t1) / (r2 - r1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    N = 262144  # = bench-scale flat batch (4 x 65536)
    results = []

    idx_iota = np.arange(N, dtype=np.int32)
    # monotone-local: like a real conv tap on key-sorted coords
    jit = np.sort(rng.integers(0, N, N)).astype(np.int32)
    idx_rand = rng.integers(0, N, N).astype(np.int32)

    for C, dt in [(32, jnp.bfloat16), (96, jnp.bfloat16), (128, jnp.bfloat16),
                  (256, jnp.bfloat16), (96, jnp.float32), (96, jnp.int8),
                  (192, jnp.int8)]:
        x = jnp.asarray(rng.standard_normal((N, C)), dtype=dt) \
            if dt != jnp.int8 else jnp.asarray(
                rng.integers(-127, 127, (N, C)), dtype=jnp.int8)
        bytes_per = C * x.dtype.itemsize
        for name, idx in [("iota", idx_iota), ("mono", jit),
                          ("rand", idx_rand)]:
            for hint in ([False, True] if name != "rand" else [False]):
                ix = jnp.asarray(idx)
                dt_s = slope_time(
                    lambda x, ix: gather(x, ix, hint) if dt != jnp.int8
                    else gather(x, ix, hint), x, ix)
                gbs = N * bytes_per / dt_s / 1e9
                row = (f"C={C:4d} {np.dtype(x.dtype).name:8s} {name}"
                       f" sorted={int(hint)}: {dt_s*1e3:7.3f} ms "
                       f"{gbs:7.1f} GB/s")
                print(row, flush=True)
                results.append(row)

    # block-of-8 gather: (N/8, 8C) rows, random + monotone block ids
    for C in (32, 96):
        nb = N // 8
        x = jnp.asarray(rng.standard_normal((nb, 8 * C)), jnp.bfloat16)
        for name, bi in [("mono", np.sort(rng.integers(0, nb, nb))),
                         ("rand", rng.integers(0, nb, nb))]:
            ix = jnp.asarray(bi.astype(np.int32))
            dt_s = slope_time(lambda x, ix: gather(x, ix, name == "mono"),
                              x, ix)
            gbs = nb * 8 * C * 2 / dt_s / 1e9
            print(f"blk8 C={C:4d} {name}: {dt_s*1e3:7.3f} ms {gbs:7.1f} GB/s"
                  f"  (== {N} logical rows)", flush=True)

    # whole-block gather at conv0-halo scale: n_blocks rows of 512*C
    for C, nb in [(3, 8192), (32, 8192)]:
        x = jnp.asarray(rng.standard_normal((nb, 512 * C)), jnp.bfloat16)
        ix = jnp.asarray(rng.integers(0, nb, nb * 27 // 8).astype(np.int32))
        dt_s = slope_time(lambda x, ix: gather(x, ix, False), x, ix)
        gbs = len(ix) * 512 * C * 2 / dt_s / 1e9
        print(f"block512 C={C} nb={nb} x27/8 gathers: {dt_s*1e3:7.3f} ms "
              f"{gbs:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
