"""Serving-level benchmark: throughput + latency THROUGH the micro-batching
servers (pq3d_tpu/serve.py), not just the raw jitted forward.

This measures what a deployment sees: per-request host pipeline, batching
wait, device step, and full-resolution postprocessing, with p50/p99
latency from ServerStats.  The raw-forward numbers live in bench.py; the
serve/forward gap is the serving overhead to optimize.

Usage:  python tools/bench_serve.py [instseg] [unified]   (default: both)
Env:    BENCH_SMOKE=1 shrinks everything for a CPU pre-flight.
        SERVE_STEM=gather|dense_block (instseg conv0 stem; default
        dense_block), SERVE_BATCH (default 4 instseg / 8 unified),
        SERVE_SCENES (requests per run, default 32).
Prints: ``serve_<which>: X scenes/s p50=Y ms p99=Z ms ...`` per server.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE") == "1"
import jax
import jax.numpy as jnp

if SMOKE:
    jax.config.update("jax_platforms", "cpu")
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)

from pq3d_tpu.config import Config
from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.data.unified_datasets import SyntheticRefer
from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                     EncoderCfg, GroundHeadCfg,
                                     GenerationHeadCfg, TxtEncoderCfg,
                                     MaskHeadCfg, VoxelEncoderCfg)
from pq3d_tpu.serve import InstSegServer, ServerStats, UnifiedServer

N_REQ = int(os.environ.get("SERVE_SCENES", "6" if SMOKE else "32"))


def _warm(srv, request):
    """Two requests through the server (jit compiles), then reset stats so
    the report excludes compile latency.  Two passes because a flat-pack
    server locks its shape envelope from the FIRST batch and the second
    compiles the locked executable every later batch reuses.  The worker
    thread updates stats AFTER resolving the future — the short sleep lets
    that batch's bookkeeping land on the old stats object before the
    swap."""
    srv.submit(request).result(timeout=3600)
    srv.submit(request).result(timeout=3600)
    time.sleep(0.5)
    srv.stats = ServerStats()


def _report(which, srv, wall_s):
    st = srv.stats.summary()
    print(f"serve_{which}: {st['scenes'] / wall_s:.2f} scenes/s "
          f"p50={st['p50_latency_s'] * 1000:.1f} ms "
          f"p99={st['p99_latency_s'] * 1000:.1f} ms "
          f"steps={st['steps']} compiles={srv.jit_cache_size()} "
          f"wall={wall_s:.2f} s", flush=True)
    if st.get("stage_s"):
        tot = ", ".join(f"{k}={v:.2f}s"
                        for k, v in sorted(st["stage_s"].items()))
        print(f"# serve_{which} stages (summed, overlap wall): {tot}",
              flush=True)


def bench_instseg_serve():
    rng = np.random.default_rng(0)
    stem = os.environ.get("SERVE_STEM", "dense_block")
    # SERVE_VARIANT picks the chip-measured round-3 winners (PERF.md):
    #   dense       — rectangular dense_block stem (round-2 winner; meshable)
    #   flat_zt     — flat pack + z-run fetch convs (res16unet parity)
    #   flat_swin   — flat pack + swin3d window-attention backbone
    #   dev_maps    — rectangular + DEVICE-BUILT kernel maps: the host ships
    #                 ~0.8 MB of coords instead of 60-100 MB of int32 maps
    #                 (the measured round-3 serving transfer bottleneck);
    #                 hierarchy/stem/z-run plans build inside the jit
    #                 (ops/device_maps)
    #   dev_flat_swin — flat_swin layout WITH device-built flat maps
    #                 (ops/device_flat_maps): composes the round-4 transfer
    #                 win with the chip-fastest backbone (round-5)
    variant = os.environ.get("SERVE_VARIANT", "dense")
    bs = int(os.environ.get("SERVE_BATCH", "2" if SMOKE else "4"))
    flat = variant in ("flat_zt", "flat_swin", "dev_flat_swin")
    swin = variant in ("flat_swin", "dev_flat_swin")
    dev_maps = variant == "dev_maps"
    dev_flat = variant == "dev_flat_swin"
    level_caps = ((512, 512, 512, 256, 128) if SMOKE
                  else (65536, 40960, 16384, 4096, 2048))
    pipe = InstSegPipelineConfig(
        voxel_size=0.15 if SMOKE else 0.02,
        num_queries=16 if SMOKE else 120,
        max_segments=64 if SMOKE else 512,
        max_instances=16 if SMOKE else 120,
        voxel_bucket=512 if SMOKE else 8192,
        level_caps=level_caps,
        use_aug=False,
        stem_mode="none" if swin else stem,
        flat_pack=flat,
        swin_window=4 if swin else 0,
        device_maps=dev_maps,
        ztriple_conv=variant == "flat_zt")
    scenes = [synthetic.make_scene(
        rng, n_points=(600 + 100 * (i % 3)) if SMOKE
        else (60_000 + 5000 * (i % 5)),
        n_instances=6 if SMOKE else 24,
        n_segments=24 if SMOKE else 400) for i in range(N_REQ)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 199)

    flat_caps = None
    if dev_flat:
        # device flat maps bake the shape lock into the model: derive it
        # once by host-collating the LARGEST scenes through the host flat
        # path (flat_shape_caps_from), then rebuild the pipe around it
        import dataclasses as _dc
        from pq3d_tpu.data.instseg_pipeline import flat_shape_caps_from
        probe = [max(scenes, key=lambda s: len(s["points"]))] * bs
        pb = make_batch([dict(s) for s in probe], pipe,
                        np.random.default_rng(0), train=False)
        # the probe already uses the LARGEST scene x bs, so a thin margin
        # suffices; every locked row is device compute the swin backbone
        # pays whether occupied or not (SERVE_LOCK_MARGIN to A/B)
        flat_caps = flat_shape_caps_from(
            pb["_meta"]["flat_dims"], pipe,
            margin=float(os.environ.get("SERVE_LOCK_MARGIN", "1.3")))
        pipe = _dc.replace(
            pipe, device_maps=True, flat_shape_caps=flat_caps,
            device_flat_check=os.environ.get("SERVE_FLAT_CHECK",
                                             "1") == "1")
        print(f"# dev_flat_swin lock: {flat_caps}", flush=True)

    model = Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",),
        hidden_size=96 if SMOKE else 768, dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1 if SMOKE else 4,
                                  num_blocks=1 if SMOKE else 3,
                                  num_attention_heads=12,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1, 2, 3), accum="bfloat16",
                                  backbone="swin3d" if swin
                                  else "res16unet",
                                  device_maps=(tuple(level_caps)
                                               if dev_maps else None),
                                  device_flat_caps=(
                                      tuple(sorted(flat_caps.items()))
                                      if dev_flat else None),
                                  device_stem=stem if dev_maps
                                  else "dense_block",
                                  device_ztriple=dev_maps),
        mask_head_cfg=MaskHeadCfg(num_targets=201, filter_out_classes=(0, 2)))
    init_batch = make_batch(scenes[:bs], pipe, rng, train=False)
    S = pipe.max_segments
    for name in ("mv", "pc"):
        init_batch[f"{name}_seg_fts"] = np.zeros((bs, S, 768), np.float32)
        init_batch[f"{name}_seg_pad_masks"] = init_batch["seg_pad_masks"]
    init_batch = {k: v for k, v in init_batch.items()
                  if not k.startswith("_")}
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)

    cast = None
    if os.environ.get("SERVE_BF16", "0") == "1":
        # whole-model serving cast — chip round-4: flat_swin fwd 164->109 ms
        # (chip_runs/0820a/bf16_fwd.log); equivalence in tests/test_bf16_modes
        from pq3d_tpu.utils.inference import cast_batch_bf16, cast_params_bf16
        variables = cast_params_bf16(variables)
        cast = cast_batch_bf16
    srv = InstSegServer(model, variables, pipe, batch_size=bs,
                        num_classes=200, topk=100, max_delay_s=0.02,
                        extra_features={"mv": 768, "pc": 768}, cast=cast,
                        num_workers=int(os.environ.get("SERVE_WORKERS",
                                                       "0")))
    try:
        # warm with the LARGEST scene: with flat_pack the server locks its
        # shape envelope (flat_shape_caps) from the first batch, so warming
        # at the top of the size range makes every later batch reuse ONE
        # executable
        _warm(srv, max(scenes, key=lambda s: len(s["points"])))
        t0 = time.time()
        futs = [srv.submit(s) for s in scenes]
        for f in futs:
            f.result(timeout=3600)
        wall = time.time() - t0
        _report("instseg", srv, wall)
    finally:
        srv.close()


def bench_unified_serve():
    bs = int(os.environ.get("SERVE_BATCH", "2" if SMOKE else "8"))
    cfg = Config({"data": {"synthetic": {"num_train": N_REQ,
                                         "n_points": 300 if SMOKE else 2000,
                                         "n_instances": 8 if SMOKE else 32}},
                  "debug": {"flag": False}})
    ds = SyntheticRefer(cfg, "train")
    reqs = [ds.get_item(i) for i in range(N_REQ)]
    pipe = UnifiedPipelineConfig(max_obj_len=8 if SMOKE else 80,
                                 num_points=64 if SMOKE else 1024,
                                 prompt_len=12 if SMOKE else 77,
                                 response_len=4 if SMOKE else 50)
    feature_dims = {"mv": 768, "voxel": 128}

    model = Query3DUnified(
        memories=("mv", "pc", "voxel", "prompt"),
        heads=("ground", "generation"),
        hidden_size=96 if SMOKE else 768, dim_loc=6,
        use_offline_voxel_fts=True,
        skip_query_encoder_mask_pred=True, mask_head_cfg=None,
        unified=UnifiedEncoderCfg(num_layers=1 if SMOKE else 4, num_blocks=1,
                                  num_attention_heads=12, structure="mixed",
                                  memory_dropout=0.6),
        mv_enc=EncoderCfg(input_feat_size=768),
        pc_enc=EncoderCfg(input_feat_size=768, backbone="pointnet++",
                          freeze_backbone=True),
        voxel_obj_enc=EncoderCfg(input_feat_size=128),
        ground_head_cfg=GroundHeadCfg(),
        generation_head_cfg=GenerationHeadCfg(
            max_new_tokens=4 if SMOKE else 50,
            # two-phase decode: the chip-measured bf16 serving winner
            # (PERF.md round-3; 21.8 ms vs 25.2 single-jit f32 at B=8)
            two_phase=os.environ.get("SERVE_BF16", "1") == "1",
            **({"d_model": 64, "d_kv": 16, "d_ff": 128, "num_layers": 1,
                "num_heads": 4} if SMOKE else {})),
        txt_cfg=TxtEncoderCfg(**({"width": 96, "layers": 1, "heads": 12}
                                 if SMOKE else {})))

    from pq3d_tpu.data.unified_pipeline import collate_unified, process_item
    rng = np.random.default_rng(0)
    items = [process_item(s, l, pipe, rng, False, feature_dims)
             for s, l in reqs[:bs]]
    init_batch = collate_unified(
        [{k: v for k, v in it.items() if not k.startswith("meta_")}
         for it in items], pipe, feature_dims, train=False)
    init_batch = {k: v for k, v in init_batch.items()
                  if not k.startswith("_")}
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)

    cast = None
    if os.environ.get("SERVE_BF16", "1") == "1":
        from pq3d_tpu.utils.inference import cast_batch_bf16, cast_params_bf16
        variables = cast_params_bf16(variables)
        cast = cast_batch_bf16
    srv = UnifiedServer(model, variables, pipe, batch_size=bs,
                        feature_dims=feature_dims, max_delay_s=0.02,
                        cast=cast)
    try:
        _warm(srv, reqs[0])
        t0 = time.time()
        futs = [srv.submit(r) for r in reqs]
        for f in futs:
            f.result(timeout=3600)
        wall = time.time() - t0
        _report("unified", srv, wall)
    finally:
        srv.close()


if __name__ == "__main__":
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["instseg", "unified"]
    if "instseg" in which:
        bench_instseg_serve()
    if "unified" in which:
        bench_unified_serve()
