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


def _finish(idx, n):
    """Shared tail: replace misses with the first hit (0 when none)."""
    hit = idx < n
    first = idx[:, :1]
    idx = jnp.where(hit, idx, first)
    return jnp.where(first < n, idx, 0).astype(jnp.int32)


def bq_topk(xyz, centers, radius, nsample):
    """Current op (top_k of masked iota)."""
    return sampling.ball_query(xyz, centers, radius, nsample)


def bq_sort(xyz, centers, radius, nsample):
    """Full ascending sort, take the first nsample."""
    n = xyz.shape[0]
    d2 = jnp.sum((centers[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    key = jnp.where(d2 < radius * radius,
                    jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1), n)
    return _finish(jnp.sort(key, axis=1)[:, :nsample], n)


def bq_onehot(xyz, centers, radius, nsample):
    """Rank hits with a cumsum, place them with a one-hot MXU matmul:
    idx[m, s] = sum_n n * [rank[m, n] == s+1]."""
    n = xyz.shape[0]
    d2 = jnp.sum((centers[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    ok = d2 < radius * radius
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1)      # 1-based among hits
    slot = jnp.where(ok, rank - 1, nsample)              # nsample = dropped
    oh = jax.nn.one_hot(slot, nsample, dtype=jnp.float32)     # (M, N, S)
    iota = jax.lax.broadcasted_iota(jnp.float32, ok.shape, 1)
    got = jnp.einsum("mn,mns->ms", iota, oh,
                     preferred_element_type=jnp.float32)
    filled = jnp.max(oh, axis=1) > 0
    idx = jnp.where(filled, got.astype(jnp.int32), n)
    return _finish(idx, n)


def bq_scatter(xyz, centers, radius, nsample):
    """Rank hits with a cumsum, place them with one scatter (each (row,
    slot) written by exactly one point — ranks are unique per row)."""
    n = xyz.shape[0]
    m = centers.shape[0]
    d2 = jnp.sum((centers[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    ok = d2 < radius * radius
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1)
    slot = jnp.where(ok & (rank <= nsample), rank - 1, nsample)  # S = dropped
    base = jnp.full((m, nsample + 1), n, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 0)
    iota = jax.lax.broadcasted_iota(jnp.int32, ok.shape, 1)
    out = base.at[rows.reshape(-1), slot.reshape(-1)].min(iota.reshape(-1))
    return _finish(out[:, :nsample], n)


VARIANTS = {"topk": bq_topk, "sort": bq_sort, "onehot": bq_onehot,
            "scatter": bq_scatter}


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

    ref = np.asarray(bq_topk(xyz, centers, radius, ns))
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
