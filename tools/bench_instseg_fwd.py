"""A/B bench for the instseg forward at bench scale: stem mode x sorted
gathers (the round-2 conv optimization ladder, PERF.md).

Usage: python tools/bench_instseg_fwd.py [variants...]
  variants: base | dense | sorted | dense_sorted | flat | flat_sorted |
            compact | swin | flat_swin | int8 | dense_int8 | compact_int8
  (default: all non-flat conv ladder)
Prints ms/step and scenes/s for each variant using slope timing.
"""
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE") == "1"
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

if SMOKE:
    jax.config.update("jax_platforms", "cpu")
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                     MaskHeadCfg, VoxelEncoderCfg)

BATCH = int(os.environ.get("INSTSEG_BATCH", "4"))


def build_batch(stem_mode, flat=False, compact=False, swin=0, ztriple=False):
    rng = np.random.default_rng(0)
    cfg = InstSegPipelineConfig(
        voxel_size=0.15 if SMOKE else 0.02,
        num_queries=16 if SMOKE else 120,
        max_segments=64 if SMOKE else 512,
        max_instances=16 if SMOKE else 120,
        voxel_bucket=256 if SMOKE else 8192, use_aug=False,
        stem_mode=stem_mode, flat_pack=flat, compact_conv=compact,
        swin_window=swin, ztriple_conv=ztriple)
    scenes = [synthetic.make_scene(
        rng, n_points=800 if SMOKE else 80_000,
        n_instances=6 if SMOKE else 24,
        n_segments=24 if SMOKE else 400) for _ in range(BATCH)]
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


def build_model(sorted_gather, backbone="res16unet", int8=False,
                pallas_conv=False):
    return Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",),
        hidden_size=96 if SMOKE else 768,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1 if SMOKE else 4,
                                  num_blocks=1 if SMOKE else 3,
                                  num_attention_heads=12,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1, 2, 3), accum="bfloat16",
                                  sorted_gather=sorted_gather,
                                  backbone=backbone, int8_gather=int8,
                                  pallas_conv=pallas_conv),
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
    # (stem, sorted_gather, flat, compact, swin_window, backbone[, int8])
    spec = {"base": ("gather", False, False, False, 0, "res16unet"),
            "int8": ("gather", False, False, False, 0, "res16unet", True),
            "dense_int8": ("dense_block", False, False, False, 0,
                           "res16unet", True),
            "dense": ("dense_block", False, False, False, 0, "res16unet"),
            "sorted": ("gather", True, False, False, 0, "res16unet"),
            "dense_sorted": ("dense_block", True, False, False, 0,
                             "res16unet"),
            "flat": ("dense_block", False, True, False, 0, "res16unet"),
            "flat_sorted": ("dense_block", True, True, False, 0,
                            "res16unet"),
            "compact": ("dense_block", False, True, True, 0, "res16unet"),
            "compact_int8": ("dense_block", False, True, True, 0,
                             "res16unet", True),
            "swin": ("none", False, False, False, 4, "swin3d"),
            "flat_swin": ("none", False, True, False, 4, "swin3d"),
            # z-run fetch plans + unrolled C>=256 tap loops (round-3 wave
            # winners; ops/sparse.{sparse_conv_ztriple,tap_unroll})
            "zt": ("dense_block", False, False, False, 0, "res16unet",
                   False, True),
            "flat_zt": ("dense_block", False, True, False, 0, "res16unet",
                        False, True),
            # + windowed pallas conv on the fetch-floor shapes
            # (ops/pallas_zt; routing per pallas_zt_applicable)
            "flat_pzt": ("dense_block", False, True, False, 0, "res16unet",
                         False, True, True)}
    batches = {}
    for name in variants:
        # any variant + '_bf16': whole-model serving cast (weights AND batch
        # floats to bf16, utils/inference) — the decoder/head matmuls then
        # run at the MXU bf16 rate like the unified serving path
        bf16 = name.endswith("_bf16")
        key = name[:-5] if bf16 else name
        stem, sg, flat, compact, swin, backbone = spec[key][:6]
        int8 = len(spec[key]) > 6 and spec[key][6]
        ztriple = len(spec[key]) > 7 and spec[key][7]
        pzt = len(spec[key]) > 8 and spec[key][8]
        bkey = (stem, flat, compact, swin, ztriple)
        if bkey not in batches:
            batches[bkey] = build_batch(stem, flat, compact, swin, ztriple)
        batch, host_s = batches[bkey]
        model = build_model(sg, backbone, int8, pzt)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, train=False)
        if bf16:
            from pq3d_tpu.utils import inference
            variables = inference.cast_params_bf16(variables)
            batch = inference.cast_batch_bf16(batch)
        fwd = jax.jit(lambda v, b: sum(
            jnp.sum(x) for x in jax.tree.leaves(
                model.apply(v, b, train=False))))
        dt = slope(fwd, variables, batch)
        print(f"{name:14s}: {dt*1000:7.1f} ms/step  "
              f"{BATCH/dt:6.2f} scenes/s  (host {host_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
