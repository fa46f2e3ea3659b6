"""Chip microbench: pallas windowed z-run conv vs the XLA gather conv.

Targets the fetch-floor shapes the round-3 ladder could not improve
(PERF.md: L0/L1 C=96 decoder convs, 107 ms of the 215 ms flat_zt forward).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pallas_zt.py
  BENCH_SMOKE=1 python tools/bench_pallas_zt.py   # CPU toy run (interpret)
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

from tools.profile_instseg_fwd import build, slope  # noqa: E402
from pq3d_tpu.ops import sparse  # noqa: E402
from pq3d_tpu.ops.pallas_zt import build_pallas_zt_plan, pallas_zt_conv  # noqa: E402


def main():
    scenes, batch = build()
    maps = batch["maps"]
    rng = np.random.default_rng(1)
    cases = [(0, 96), (1, 96), (1, 32), (2, 64), (2, 128)]
    if SMOKE:
        cases = cases[:2]
    tile = int(os.environ.get("ZT_TILE", "128"))
    window = int(os.environ.get("ZT_WINDOW", "384"))
    for lvl, c in cases:
        nbr = np.asarray(maps[f"nbr3_{lvl}"])
        valid = jnp.asarray(maps[f"valid_{lvl}"])
        nvox = nbr.shape[0]
        if nvox % tile:
            print(f"L{lvl}: N={nvox} not tile-aligned, skip")
            continue
        t0 = time.time()
        plan = build_pallas_zt_plan(nbr, tile=tile, window=window)
        t_plan = time.time() - t0
        x = jnp.asarray(rng.standard_normal((nvox, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05, jnp.bfloat16)
        dev = {k: jnp.asarray(v) for k, v in plan.items()
               if isinstance(v, np.ndarray)}

        f_ref = jax.jit(lambda x, nbr, valid, w: jnp.sum(sparse.sparse_conv(
            x, nbr, w, None, valid, accum_dtype=jnp.bfloat16),
            dtype=jnp.float32))
        f_zt = jax.jit(lambda x, w, valid: jnp.sum(pallas_zt_conv(
            x, w, dev["win_lo"], dev["base_local"], dev["msel"],
            dev["exc_base"], dev["exc_out"], dev["exc_msel"], valid,
            tile=tile, window=window, interpret=SMOKE),
            dtype=jnp.float32))
        # correctness first (bf16 tolerance)
        ref = sparse.sparse_conv(x, jnp.asarray(nbr), w, None, valid)
        got = pallas_zt_conv(x, w, dev["win_lo"], dev["base_local"],
                             dev["msel"], dev["exc_base"], dev["exc_out"],
                             dev["exc_msel"], valid, tile=tile,
                             window=window, interpret=SMOKE)
        r = np.asarray(ref, np.float32)
        g = np.asarray(got, np.float32)
        err = float(np.abs(r - g).max() / (np.abs(r).max() + 1e-6))
        nbr_j = jnp.asarray(nbr)
        dt_ref = slope(f_ref, x, nbr_j, valid, w)
        dt_zt = slope(f_zt, x, w, valid)
        print(f"L{lvl} C={c:3d} N={nvox:6d}: gather {dt_ref*1e3:7.2f} ms | "
              f"pallas_zt {dt_zt*1e3:7.2f} ms ({dt_ref/dt_zt:.2f}x, "
              f"err {err:.1e}, exc {plan['n_exceptions']}, "
              f"plan {t_plan*1e3:.0f} ms host)", flush=True)


if __name__ == "__main__":
    main()
