"""Chip cost of the in-jit flat map build alone (ops/device_flat_maps):
isolates the device-side price of building maps on the accelerator from
the backbone forward, at the serving lock shapes.

Usage: python tools/bench_flat_maps_build.py   (BENCH_SMOKE=1 for CPU)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE") == "1"
import jax
import jax.numpy as jnp

if SMOKE:
    jax.config.update("jax_platforms", "cpu")
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, process_scene
from pq3d_tpu.ops import device_flat_maps as dfm
from pq3d_tpu.ops import device_maps as dm

# the serving lock from chip_runs/0820b_serve_devflat4.log (margin 1.1)
CAPS = {"tot_0": 270336, "tot_1": 147456, "tot_2": 49152, "tot_3": 24576,
        "tot_4": 16384, "rect_0": 65792, "rect_1": 36096, "rect_2": 10240,
        "rect_3": 2816, "rect_4": 1024,
        "win1s0_nw": 10496, "win1s1_nw": 10496, "win2s0_nw": 2560,
        "win2s1_nw": 2816, "win3s0_nw": 1024, "win3s1_nw": 1024,
        "win4s0_nw": 512, "win4s1_nw": 512}
if SMOKE:
    CAPS = {k: max(v // 128, 64) for k, v in CAPS.items()}


def main():
    rng = np.random.default_rng(0)
    cfg = InstSegPipelineConfig(
        voxel_size=0.15 if SMOKE else 0.02,
        num_queries=16 if SMOKE else 120,
        max_segments=64 if SMOKE else 512,
        max_instances=16 if SMOKE else 120,
        voxel_bucket=512 if SMOKE else 8192, use_aug=False,
        stem_mode="none", flat_pack=True, swin_window=4)
    scenes = [synthetic.make_scene(
        rng, n_points=600 if SMOKE else 75_000,
        n_instances=6 if SMOKE else 24,
        n_segments=24 if SMOKE else 400) for _ in range(4)]
    processed = [process_scene(s, cfg, rng, train=False) for s in scenes]
    counts = np.array([len(p["vox_coords"]) for p in processed], np.int32)
    coords = np.zeros((CAPS["tot_0"], 3), np.int32)
    align = dm.swin_bias_align(4)
    r = 0
    for p in processed:
        bi, _ = dm.bias_coords_16(p["vox_coords"], align=align)
        coords[r:r + len(bi)] = bi
        r += len(bi)
    print(f"# total voxels {counts.sum()} / cap {CAPS['tot_0']}")

    cj, nj = jnp.asarray(coords), jnp.asarray(counts)
    variants = {
        "full": dict(swin_window=4, stem_mode="none"),
        "hier_only": dict(swin_window=0, stem_mode="none"),
    }
    names = os.environ.get("BUILD_VARIANTS", "full,hier_only").split(",")
    for name in names:
        build = jax.jit(lambda c, n, kw=variants[name]:
                        dfm.build_flat_maps(c, n, CAPS, **kw))

        def run(k):
            t0 = time.time()
            for _ in range(k):
                out = build(cj, nj)
            # scalar readback is the only reliable fence on axon
            _ = int(np.asarray(out["nbr3_0"]).ravel()[0])
            return time.time() - t0
        run(1)
        run(2)
        t1, t2 = run(3), run(10)
        dt = max((t2 - t1) / 7, 1e-9)
        print(f"build_flat_maps[{name}]: {dt * 1000:.1f} ms/batch (B=4)")


if __name__ == "__main__":
    main()
