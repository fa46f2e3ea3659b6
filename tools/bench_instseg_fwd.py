"""A/B bench for the instseg forward at bench scale: stem mode x sorted
gathers (the round-2 conv optimization ladder, PERF.md).

Usage: python tools/bench_instseg_fwd.py [variants...]
  variants: base | dense | sorted | dense_sorted | flat | flat_sorted
  (default: all non-flat)
Prints ms/step and scenes/s for each variant using slope timing.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                     MaskHeadCfg, VoxelEncoderCfg)

BATCH = 4


def build_batch(stem_mode, flat=False):
    rng = np.random.default_rng(0)
    cfg = InstSegPipelineConfig(
        voxel_size=0.02, num_queries=120, max_segments=512,
        max_instances=120, voxel_bucket=8192, use_aug=False,
        stem_mode=stem_mode, flat_pack=flat)
    scenes = [synthetic.make_scene(rng, n_points=80_000, n_instances=24,
                                   n_segments=400) for _ in range(BATCH)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 199)
    t0 = time.time()
    batch = make_batch(scenes, cfg, rng, train=False)
    host_s = time.time() - t0
    S = cfg.max_segments
    batch["mv_seg_fts"] = rng.standard_normal((BATCH, S, 768)).astype(
        np.float32)
    batch["mv_seg_pad_masks"] = batch["seg_pad_masks"]
    batch["pc_seg_fts"] = rng.standard_normal((BATCH, S, 768)).astype(
        np.float32)
    batch["pc_seg_pad_masks"] = batch["seg_pad_masks"]
    batch = {k: v for k, v in batch.items() if not k.startswith("_")}
    return jax.tree.map(jnp.asarray, batch), host_s


def build_model(sorted_gather):
    return Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=768,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=4, num_blocks=3,
                                  num_attention_heads=12,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1, 2, 3), accum="bfloat16",
                                  sorted_gather=sorted_gather),
        mask_head_cfg=MaskHeadCfg(num_targets=201,
                                  filter_out_classes=(0, 2)))


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


def main():
    variants = sys.argv[1:] or ["base", "dense", "sorted", "dense_sorted"]
    spec = {"base": ("gather", False, False),
            "dense": ("dense_block", False, False),
            "sorted": ("gather", True, False),
            "dense_sorted": ("dense_block", True, False),
            "flat": ("dense_block", False, True),
            "flat_sorted": ("dense_block", True, True)}
    batches = {}
    for name in variants:
        stem, sg, flat = spec[name]
        if (stem, flat) not in batches:
            batches[(stem, flat)] = build_batch(stem, flat)
        batch, host_s = batches[(stem, flat)]
        model = build_model(sg)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, train=False)
        fwd = jax.jit(lambda v, b: sum(
            jnp.sum(x) for x in jax.tree.leaves(
                model.apply(v, b, train=False))))
        dt = slope(fwd, variables, batch)
        print(f"{name:14s}: {dt*1000:7.1f} ms/step  "
              f"{BATCH/dt:6.2f} scenes/s  (host {host_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
