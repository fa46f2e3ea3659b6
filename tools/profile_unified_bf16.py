"""Root-cause the unified-step bf16 inversion (VERDICT r2 weak item 2).

BENCH_r02 detail: unified step f32 25.24 ms vs bf16 27.77 ms on v5e —
bf16 losing to f32 is a smell (MXU f32 matmuls already run at reduced
precision on this chip, so bf16 should only remove convert/HBM cost, never
add).  This tool isolates the step's components (CLIP text tower,
PointNet++ object encoder, decoder+heads, T5 greedy decode) and slope-times
each in f32 vs the whole-model bf16 cast, printing a per-component A/B so
the regression localizes to one subsystem.

Usage (chip):  PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/profile_unified_bf16.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from pq3d_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache(jax)


def slope_time(fn, *args, n1=2, n2=12):
    def run(k):
        t0 = time.time()
        for _ in range(k):
            x = fn(*args)
        v = jax.tree.leaves(x)[0]
        _ = float(np.asarray(v).ravel()[0])
        return time.time() - t0
    run(1)
    run(n1)
    t1 = run(n1)
    t2 = run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    from pq3d_tpu.config import Config
    from pq3d_tpu.data.unified_datasets import SyntheticRefer
    from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                         EncoderCfg, GroundHeadCfg,
                                         GenerationHeadCfg, TxtEncoderCfg)
    from pq3d_tpu.utils.inference import cast_batch_bf16, cast_params_bf16

    bs = 8
    cfg = Config({"data": {"synthetic": {"num_train": bs, "n_points": 2000,
                                         "n_instances": 32}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=80, num_points=1024,
                                 prompt_len=77, response_len=50)
    loader = UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                               batch_size=bs, train=False,
                               feature_dims={"mv": 768, "voxel": 128})
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader(0))).items()
             if not k.startswith("_")}

    model = Query3DUnified(
        memories=("mv", "pc", "voxel", "prompt"),
        heads=("ground", "generation"),
        hidden_size=768, dim_loc=6, use_offline_voxel_fts=True,
        skip_query_encoder_mask_pred=True, mask_head_cfg=None,
        unified=UnifiedEncoderCfg(num_layers=4, num_blocks=1,
                                  num_attention_heads=12, structure="mixed",
                                  memory_dropout=0.6),
        mv_enc=EncoderCfg(input_feat_size=768),
        pc_enc=EncoderCfg(input_feat_size=768, backbone="pointnet++",
                          freeze_backbone=True),
        voxel_obj_enc=EncoderCfg(input_feat_size=128),
        ground_head_cfg=GroundHeadCfg(),
        generation_head_cfg=GenerationHeadCfg(max_new_tokens=50),
        txt_cfg=TxtEncoderCfg())
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    v16 = cast_params_bf16(variables)
    b16 = cast_batch_bf16(batch)

    # ---- component probes ------------------------------------------------
    def probe(label, fn):
        f32 = slope_time(jax.jit(fn), variables, batch) * 1e3
        bf16 = slope_time(jax.jit(fn), v16, b16) * 1e3
        print(f"{label:26s}: f32 {f32:7.2f} ms | bf16 {bf16:7.2f} ms "
              f"({f32 / bf16:.2f}x)", flush=True)
        return f32, bf16

    def full(v, b):
        out = model.apply(v, b, train=False)
        return jnp.sum(out["ground_logits"]), out["generation_tokens"]

    def no_decode(v, b):
        # everything except the T5 greedy decode: train-mode forward
        out = model.apply(v, b, train=True,
                          rngs={"dropout": jax.random.key(2)})
        return sum(jnp.sum(x) for x in jax.tree.leaves(out)
                   if jnp.issubdtype(x.dtype, jnp.floating))

    probe("full step (decode)", full)
    probe("train fwd (no decode)", no_decode)

    def standalone(label, mod, ev, fn):
        f32 = slope_time(jax.jit(fn), ev, batch) * 1e3
        bf16 = slope_time(jax.jit(fn), cast_params_bf16(ev), b16) * 1e3
        print(f"{label:26s}: f32 {f32:7.2f} ms | bf16 {bf16:7.2f} ms "
              f"({f32 / bf16:.2f}x)", flush=True)

    # CLIP text tower alone
    from pq3d_tpu.models.clip_text import CLIPTextEncoder
    clip = CLIPTextEncoder()
    ids = batch["prompt"].astype(jnp.int32)
    cv = jax.jit(clip.init)(jax.random.key(0), ids,
                            batch["prompt_pad_masks"])
    standalone("CLIP text tower", clip, cv,
               lambda v, b: jnp.sum(clip.apply(
                   v, b["prompt"].astype(jnp.int32),
                   b["prompt_pad_masks"])))

    # PointNet++ object encoder alone
    from pq3d_tpu.models.encoders import ObjectEncoder
    enc = ObjectEncoder(input_feat_size=768, hidden_size=768,
                        backbone="pointnet++", freeze_backbone=True)
    ev = jax.jit(enc.init)(jax.random.key(0), batch["obj_fts"])
    standalone("PointNet++ encoder", enc, ev,
               lambda v, b: jnp.sum(enc.apply(v, b["obj_fts"])))


if __name__ == "__main__":
    main()
