"""Headline benchmark: unified inference throughput (scenes/sec/chip).

Runs the flagship Query3DUnified forward (stage-1 instseg configuration:
online sparse voxel U-Net + mv/pc memories + iterative mask decoder) on
realistic synthetic ScanNet-scale scenes, on whatever accelerator the
session provides (the driver runs this on one real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}

``vs_baseline`` is measured against the north-star target of 20
scenes/sec/chip (BASELINE.json — the reference publishes no absolute
throughput numbers, SURVEY.md §6).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    # persistent compile cache: repeated bench runs skip the slow first jit
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pq3d_tpu.data import synthetic
    from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig,
                                                make_batch)
    from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                         MaskHeadCfg, VoxelEncoderCfg,
                                         EncoderCfg)

    rng = np.random.default_rng(0)
    batch_size = 4
    # ScanNet-scale scenes: ~80k points -> ~50-70k voxels at 0.02 m
    pipe_cfg = InstSegPipelineConfig(
        voxel_size=0.02, num_queries=120, max_segments=512,
        max_instances=120, voxel_bucket=8192, use_aug=False)
    scenes = [synthetic.make_scene(rng, n_points=80_000, n_instances=24,
                                   n_segments=400) for _ in range(batch_size)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 199)

    t0 = time.time()
    batch = make_batch(scenes, pipe_cfg, rng, train=False)
    host_time = time.time() - t0
    S = pipe_cfg.max_segments
    batch["mv_seg_fts"] = rng.standard_normal(
        (batch_size, S, 768)).astype(np.float32)
    batch["mv_seg_pad_masks"] = batch["seg_pad_masks"]
    batch["pc_seg_fts"] = rng.standard_normal(
        (batch_size, S, 768)).astype(np.float32)
    batch["pc_seg_pad_masks"] = batch["seg_pad_masks"]
    batch = {k: v for k, v in batch.items() if not k.startswith('_')}
    batch = jax.tree.map(jnp.asarray, batch)

    model = Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=768,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=4, num_blocks=3,
                                  num_attention_heads=12,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        # bf16 conv accumulation is the supported inference fast path
        # (27-term sums renormalized by BatchNorm; training keeps f32)
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1, 2, 3), accum="bfloat16"),
        mask_head_cfg=MaskHeadCfg(num_targets=201,
                                  filter_out_classes=(0, 2)))

    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    # reduce outputs to one scalar inside the jit and read it back per
    # iteration: block_until_ready on the axon platform does not reliably
    # block, so a host readback is the only trustworthy fence.
    fwd = jax.jit(lambda v, b: sum(
        jnp.sum(x) for x in jax.tree.leaves(model.apply(v, b, train=False))))
    _ = float(fwd(variables, batch))

    # timed steady-state
    n_iter = 5
    t0 = time.time()
    for _ in range(n_iter):
        _ = float(fwd(variables, batch))
    dt = (time.time() - t0) / n_iter
    scenes_per_sec = batch_size / dt

    result = {
        "metric": "instseg_unified_inference_throughput",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(scenes_per_sec / 20.0, 3),
        "detail": {
            "batch_size": batch_size,
            "voxels_per_scene_pad": int(batch["maps"]["valid_0"].shape[1]),
            "step_ms": round(dt * 1000, 2),
            "host_pipeline_s_per_batch": round(host_time, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    main()
