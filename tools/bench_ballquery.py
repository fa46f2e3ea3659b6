"""Ball-query variant microbench (NEXTSTEPS item 4: ~6 ms of the 26.5 ms
unified step sits in PointNet++ grouping).

All variants reproduce the CUDA kernel's semantics exactly (first nsample
hits in index order, first-hit fill, 0 when no hit — ref
ball_query_gpu.cu:9-53); equivalence is asserted before timing.

Usage (real chip):  PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_ballquery.py
CPU smoke:          BENCH_SMOKE=1 python tools/bench_ballquery.py
"""
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE") == "1"
if SMOKE:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pq3d_tpu.ops import sampling  # noqa: E402


def _impl(name):
    """The SHIPPED implementation (ops/sampling._first_k_hits) under the
    given switch — the winner we measure is exactly the code that ships."""
    def fn(xyz, centers, radius, nsample):
        prev = sampling._BQ_IMPL
        sampling.set_ball_query_impl(name)
        try:
            return sampling.ball_query(xyz, centers, radius, nsample)
        finally:
            sampling._BQ_IMPL = prev
    return fn


VARIANTS = {n: _impl(n) for n in ("topk", "sort", "onehot", "scatter")}


def timeit(fn, args, n1=2, n2=10):
    f = jax.jit(fn, static_argnums=(2, 3))

    def run(k):
        t0 = time.time()
        for _ in range(k):
            x = f(*args)
        _ = int(np.asarray(x).ravel()[0])
        return time.time() - t0

    run(1); run(n1)
    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    # unified bench scale: B=8 scenes x 80 objects -> vmapped (handled as
    # one flat axis here), SA stage: 1024 pts -> 512 centers, nsample 32
    n, m, ns = (256, 128, 8) if SMOKE else (1024, 512, 32)
    reps = 2 if SMOKE else 640  # 8 scenes x 80 objects
    xyz = jnp.asarray(rng.random((n, 3)), jnp.float32)
    centers = jnp.asarray(xyz[rng.choice(n, m, replace=False)])
    radius = 0.2

    ref = np.asarray(VARIANTS["topk"](xyz, centers, radius, ns))
    for name, fn in VARIANTS.items():
        got = np.asarray(jax.jit(fn, static_argnums=(2, 3))(
            xyz, centers, radius, ns))
        assert (got == ref).all(), f"{name} mismatch"
    print("# equivalence OK", flush=True)

    bx = jnp.tile(xyz[None], (reps, 1, 1))
    bc = jnp.tile(centers[None], (reps, 1, 1))
    for name, fn in VARIANTS.items():
        vf = jax.vmap(fn, in_axes=(0, 0, None, None))
        dt = timeit(vf, (bx, bc, radius, ns))
        print(f"{name}: {dt*1000:.2f} ms for {reps} groups", flush=True)


if __name__ == "__main__":
    main()
