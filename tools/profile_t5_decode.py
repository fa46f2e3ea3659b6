"""Bisect the bf16 T5 greedy-decode regression (PERF.md round-3).

Times T5Decoder.decode standalone (B=8, 80 encoder states, 50 tokens) in
f32 vs bf16 params, plus ablations that strip one per-step component at a
time (logits matmul, argmax feedback) to localize where bf16 loses.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_t5_decode.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from pq3d_tpu.utils.compile_cache import enable_compile_cache
from pq3d_tpu.models.t5 import T5Decoder

enable_compile_cache(jax)


def slope_time(fn, *args, n1=2, n2=12):
    def run(k):
        t0 = time.time()
        for _ in range(k):
            x = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])
        return time.time() - t0
    run(1); run(n1)
    t1 = run(n1); t2 = run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    B, M, T = 8, 80, 50
    dec = T5Decoder()
    rng = np.random.default_rng(0)
    enc32 = jnp.asarray(rng.standard_normal((B, M, 512)), jnp.float32)
    mask = jnp.ones((B, M), bool)
    toks = jnp.zeros((B, T), jnp.int32)
    v = jax.jit(dec.init)(jax.random.key(0), toks, enc32, mask)

    def cast16(tree):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                            if x.dtype == jnp.float32 else x, tree)

    cases = {
        "f32": (v, enc32),
        "bf16": (cast16(v), enc32.astype(jnp.bfloat16)),
    }
    for name, (vv, ee) in cases.items():
        dt = slope_time(jax.jit(lambda v_, e_: dec.apply(
            v_, e_, mask, T, method=T5Decoder.decode)), vv, ee) * 1e3
        print(f"decode {name:18s}: {dt:7.2f} ms", flush=True)

    # teacher-forced forward over the SAME 50 tokens (parallel, no loop):
    # the non-loop baseline shows whether the gap is loop-specific
    for name, (vv, ee) in cases.items():
        dt = slope_time(jax.jit(lambda v_, e_: dec.apply(
            v_, toks, e_, mask)), vv, ee) * 1e3
        print(f"teacher-forced {name:11s}: {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
