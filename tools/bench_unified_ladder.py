"""Unified-inference batch/MFU ladder (VERDICT r04 item 3).

bench.py's headline pins B=8 — a latency-shaped number.  This ladder
measures the chip's CAPACITY throughput: B in {8, 16, 32, 64, 128}
through the two-phase bf16 path (the serving winner), reporting ms/step,
scenes/s, and MFU per rung, plus a forward-vs-decode split at each rung
so the MFU bound has a named cause (decode serialization vs small GEMMs
vs batch).  The reference's own inference batch is 128
(/root/reference/configs/unified_tasks_sceneverse.yaml:83-104).

Usage:  python tools/bench_unified_ladder.py [B ...]   (default ladder)
Env:    BENCH_SMOKE=1 for a CPU pre-flight at toy sizes.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE") == "1"
import bench  # repo-root headline bench: reuse its model/batch builders


def main():
    ladder = [int(a) for a in sys.argv[1:]] or \
        ([2, 4] if SMOKE else [8, 16, 32, 64, 128])
    if SMOKE:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=1"
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    else:
        bench.wait_for_device()
    import jax
    import jax.numpy as jnp
    from pq3d_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(jax)
    os.environ["BENCH_UNIFIED_VARIANTS"] = "two"

    rows = []
    for b in ladder:
        os.environ["BENCH_UNIFIED_BATCH"] = str(b)
        rng = np.random.default_rng(0)
        try:
            sps, dt, host_s, variants, mfu = bench.bench_unified(
                jax, jnp, rng)
        except Exception as e:
            print(f"B={b:4d}: FAILED {type(e).__name__}: {e}", flush=True)
            rows.append((b, None))
            continue
        best = min(variants, key=variants.get)
        rows.append((b, dt))
        print(f"B={b:4d}: {dt * 1000:8.1f} ms/step  {b / dt:7.1f} scenes/s"
              f"  mfu={mfu.get(best, 0):.4f}  best={best}  "
              f"variants={ {k: round(v * 1e3, 1) for k, v in variants.items()} }",
              flush=True)
    good = [(b, dt) for b, dt in rows if dt]
    if good:
        cap_b, cap_dt = max(good, key=lambda r: r[0] / r[1])
        print(f"capacity-optimal: B={cap_b} at {cap_b / cap_dt:.1f} "
              f"scenes/s ({cap_dt * 1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
