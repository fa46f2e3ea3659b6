"""Headline benchmark: unified-task inference throughput (scenes/sec/chip).

Measures the BASELINE.json north-star metric — stage-2 unified-task
inference (the reference's unified_tasks_sceneverse.yaml configuration:
offline mv/voxel features, PointNet++ point memory, CLIP-large text prompt,
mixed-fusion query decoder, grounding head + 50-token T5 greedy decode) at
full reference scale (hidden 768, 80 objects x 1024 points, 77-token
prompts).  Also reports the harder online-voxel instance-segmentation
forward (stage-1) in the detail block.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}

``vs_baseline`` is against the 20 scenes/sec/chip target (the reference
publishes no absolute throughput numbers, SURVEY.md §6).

Timing notes: the axon tunnel adds ~28 ms RTT per host readback and
block_until_ready does not reliably block, so each iteration forces a
scalar readback and RTT is subtracted via the measured per-call floor.
"""
import json
import os
import sys
import time

import numpy as np

# BENCH_SMOKE=1 shrinks every scale so the whole script executes on CPU in
# minutes — a pre-flight check of the bench itself, not a measurement.
SMOKE = os.environ.get("BENCH_SMOKE") == "1"


def _time_calls(fn, *args, n1=2, n2=12):
    """Slope timing (see PERF.md): dispatch k independent steps, read back
    once; per-step = (T(n2) - T(n1)) / (n2 - n1).  The single readback
    carries the tunnel RTT, which the slope cancels — the old per-call
    readback inflated every step by ~30 ms of RTT."""
    def run(k):
        t0 = time.time()
        for _i in range(k):
            x = fn(*args)
        xs = x if isinstance(x, tuple) else (x,)
        v = xs[0]
        _ = float(v) if getattr(v, "ndim", 1) == 0 else float(
            np.asarray(v).ravel()[0])
        return time.time() - t0

    run(1)                 # compile + warm
    run(n1)                # queue warm-up
    t1 = run(n1)
    t2 = run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


# v5e peak: 197 TFLOP/s bf16 on the MXU (measured 163 TF/s on a 4096^3
# matmul through the tunnel, PERF.md).  MFU here = XLA cost-analysis FLOPs /
# step time / bf16 peak — a lower bound on efficiency for gather-bound
# models (index traffic costs no FLOPs).
PEAK_FLOPS = 197e12


def _flops(jitted, *args, **kwargs):
    """Model FLOPs per step from the compiled executable's cost analysis
    (None when the backend does not expose it)."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _mfu(flops, dt):
    if not flops or not dt:
        return None
    return round(flops / dt / PEAK_FLOPS, 4)


def bench_unified(jax, jnp, rng):
    from pq3d_tpu.config import Config
    from pq3d_tpu.data.unified_datasets import SyntheticRefer
    from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                         EncoderCfg, GroundHeadCfg,
                                         GenerationHeadCfg, TxtEncoderCfg)

    # default 8 = latency-shaped serving batch; the round-5 capacity ladder
    # (tools/bench_unified_ladder.py) measures B=8..128 — override here
    batch_size = int(os.environ.get("BENCH_UNIFIED_BATCH",
                                    "2" if SMOKE else "8"))
    # n_instances ~ a realistic post-filter ScanNet object count, so the
    # flat_obj variant's pad-skip win is representative, not synthetic
    cfg = Config({"data": {"synthetic": {"num_train": batch_size,
                                         "n_points": 300 if SMOKE else 2000,
                                         "n_instances": 8 if SMOKE else 32}},
                  "debug": {"flag": False}})

    def make_batch(flat):
        pipe = UnifiedPipelineConfig(max_obj_len=8 if SMOKE else 80,
                                     num_points=64 if SMOKE else 1024,
                                     prompt_len=12 if SMOKE else 77,
                                     response_len=4 if SMOKE else 50,
                                     flat_obj=flat,
                                     flat_obj_bucket=4 if SMOKE else 64)
        loader = UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                                   batch_size=batch_size, train=False,
                                   feature_dims={"mv": 768, "voxel": 128})
        t0 = time.time()
        b = next(iter(loader(0)))
        host = time.time() - t0
        return {k: jnp.asarray(v) for k, v in b.items()
                if not k.startswith("_")}, host

    batch, host_s = make_batch(False)

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
            **({"d_model": 64, "d_kv": 16, "d_ff": 128, "num_layers": 1,
                "num_heads": 4} if SMOKE else {})),
        txt_cfg=TxtEncoderCfg(**({"width": 96, "layers": 1, "heads": 12}
                                 if SMOKE else {})))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    def _fwd(v, b):
        out = model.apply(v, b, train=False)
        return jnp.sum(out["ground_logits"]), out["generation_tokens"]
    fwd = jax.jit(_fwd)
    variants = {}
    mfu = {}
    variants["f32"] = _time_calls(fwd, variables, batch)
    fl = _flops(fwd, variables, batch)
    mfu["f32"] = _mfu(fl, variants["f32"])

    # bf16 serving cast (utils/inference.py): params + batch follow bf16 so
    # every matmul runs at the MXU bf16 rate; accuracy pinned by
    # tests/test_bf16_modes.py
    from pq3d_tpu.utils.inference import cast_batch_bf16, cast_params_bf16
    v_bf16 = cast_params_bf16(variables)
    b_bf16 = cast_batch_bf16(batch)
    variants["bf16"] = _time_calls(fwd, v_bf16, b_bf16)
    mfu["bf16"] = _mfu(_flops(fwd, v_bf16, b_bf16), variants["bf16"])

    # two-phase decode split (GenerationHeadCfg.two_phase): forward and the
    # 50-token greedy decode as separate jits — fused together, XLA
    # schedules the bf16 decode loop ~2.5x slower (PERF.md round-3 "bf16
    # inversion"); the split makes bf16 the fastest serving config
    # (chip: single f32 25.2 / single bf16 29.9 / two-phase bf16 21.8 ms).
    names = os.environ.get("BENCH_UNIFIED_VARIANTS", "flat,two").split(",")
    if "two" in names:
        try:
            import dataclasses as _dc
            from pq3d_tpu.models.generation import decode_states
            m2 = model.clone(generation_head_cfg=_dc.replace(
                model.generation_head_cfg, two_phase=True))
            fwd2 = jax.jit(lambda v, b: m2.apply(v, b, train=False))
            dec2 = jax.jit(decode_states, static_argnames=("cfg",))

            def _two(v, b):
                out = fwd2(v, b)
                toks = dec2(v, out["generation_enc"],
                            out["generation_enc_mask"],
                            cfg=m2.generation_head_cfg)
                return jnp.sum(out["ground_logits"]), toks
            variants["two_bf16"] = _time_calls(_two, v_bf16, b_bf16)
            out2 = fwd2(v_bf16, b_bf16)
            fl2 = (_flops(fwd2, v_bf16, b_bf16) or 0) + (_flops(
                dec2, v_bf16, out2["generation_enc"],
                out2["generation_enc_mask"],
                cfg=m2.generation_head_cfg) or 0)
            mfu["two_bf16"] = _mfu(fl2, variants["two_bf16"])
        except Exception as e:
            print(f"# unified two-phase variant failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
    if "flat" in names:
        try:
            fbatch, _ = make_batch(True)
            fb_bf16 = cast_batch_bf16(fbatch)
            variants["flat_bf16"] = _time_calls(fwd, v_bf16, fb_bf16)
            mfu["flat_bf16"] = _mfu(_flops(fwd, v_bf16, fb_bf16),
                                    variants["flat_bf16"])
        except Exception as e:
            print(f"# unified flat variant failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    dt = min(variants.values())
    return batch_size / dt, dt, host_s, variants, mfu


def bench_instseg(jax, jnp, rng):
    """Online-voxel instseg forward; A/Bs the conv0 stem (125-tap gathered
    vs dense-block MXU) and the sorted-index gather hint, reporting the
    fastest and the per-variant times."""
    from pq3d_tpu.data import synthetic
    from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig,
                                                make_batch)
    from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                         MaskHeadCfg, VoxelEncoderCfg)

    batch_size = 2 if SMOKE else 4
    scenes = [synthetic.make_scene(
        rng, n_points=800 if SMOKE else 80_000, n_instances=6 if SMOKE else 24,
        n_segments=24 if SMOKE else 400) for _ in range(batch_size)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 199)

    variants = {}
    host_times = {}
    mfu = {}
    # each variant is a separate full-scale compile (~minutes on this 1-CPU
    # box): keep the default ladder short; extend via env for manual runs
    # (stem, sorted_gather, flat_pack, compact_conv, swin_window[, int8])
    spec = {"gather": ("gather", False, False, False, 0),
            "int8": ("gather", False, False, False, 0, True),
            "dense_block+int8": ("dense_block", False, False, False, 0,
                                 True),
            "dense_block": ("dense_block", False, False, False, 0),
            "gather+sorted": ("gather", True, False, False, 0),
            "dense_block+sorted": ("dense_block", True, False, False, 0),
            "flat": ("dense_block", False, True, False, 0),
            "flat+sorted": ("dense_block", True, True, False, 0),
            "compact": ("dense_block", False, True, True, 0),
            "compact+int8": ("dense_block", False, True, True, 0, True),
            # z-run fetch plans for the L1-3 convs (ops/sparse
            # .sparse_conv_ztriple) + auto tap-unroll at C>=256
            "flat_zt": ("dense_block", False, True, False, 0, False, True),
            # + windowed pallas conv on the remaining fetch-floor 96-128ch
            # shapes (ops/pallas_zt; device-built plans)
            "flat_pzt": ("dense_block", False, True, False, 0, False, True,
                         True),
            # window-attention backbone (models/swin3d.py)
            "swin": ("none", False, False, False, 4),
            "flat_swin": ("none", False, True, False, 4)}
    # default ladder = baseline + the chip-measured winners (2026-08-19,
    # PERF.md round-3 ladder): flat_zt 215 ms (18.6/s, res16unet parity
    # topology), flat_swin 168 ms (23.8/s, TPU-native serving backbone) vs
    # gather 425 ms at B=4.  compact measured 4.1x SLOWER, sorted and int8
    # were washes — dropped from the default; the full ladder runs via
    # BENCH_VARIANTS (NEXTSTEPS.md).
    # '_bf16' suffix on any variant = whole-model serving cast (weights AND
    # batch floats to bf16, utils/inference) — chip round-4: flat_swin 164
    # -> 109 ms (chip_runs/0820a/bf16_fwd.log); equivalence pinned by
    # tests/test_bf16_modes.py::test_bf16_param_cast_instseg_swin_close
    names = os.environ.get(
        "BENCH_VARIANTS", "gather,flat_zt_bf16,flat_swin_bf16").split(",")
    for name in names:
      try:                      # a failed variant must not kill the headline
        bf16 = name.strip().endswith("_bf16")
        entry = spec[name.strip()[:-5] if bf16 else name.strip()]
        # inside the try: a typo'd name must not drop results
        stem, sorted_g, flat, compact, swin = entry[:5]
        int8 = len(entry) > 5 and entry[5]
        ztriple = len(entry) > 6 and entry[6]
        pzt = len(entry) > 7 and entry[7]
        pipe_cfg = InstSegPipelineConfig(
            voxel_size=0.15 if SMOKE else 0.02,
            num_queries=16 if SMOKE else 120,
            max_segments=64 if SMOKE else 512,
            max_instances=16 if SMOKE else 120,
            voxel_bucket=256 if SMOKE else 8192, use_aug=False,
            stem_mode=stem, flat_pack=flat, compact_conv=compact,
            swin_window=swin, ztriple_conv=ztriple)
        t0 = time.time()
        batch = make_batch(scenes, pipe_cfg, rng, train=False)
        host_t = time.time() - t0
        S = pipe_cfg.max_segments
        batch["mv_seg_fts"] = rng.standard_normal(
            (batch_size, S, 768)).astype(np.float32)
        batch["mv_seg_pad_masks"] = batch["seg_pad_masks"]
        batch["pc_seg_fts"] = rng.standard_normal(
            (batch_size, S, 768)).astype(np.float32)
        batch["pc_seg_pad_masks"] = batch["seg_pad_masks"]
        batch = {k: v for k, v in batch.items() if not k.startswith("_")}
        batch = {k: (jnp.asarray(v) if not isinstance(v, dict) else
                     {kk: jnp.asarray(vv) for kk, vv in v.items()})
                 for k, v in batch.items()}

        model = Query3DUnified(
            memories=("voxel", "mv", "pc"), heads=("mask",),
            hidden_size=96 if SMOKE else 768,
            dim_loc=3,
            unified=UnifiedEncoderCfg(num_layers=1 if SMOKE else 4,
                                      num_blocks=1 if SMOKE else 3,
                                      num_attention_heads=12,
                                      structure="parallel",
                                      spatial_selfattn=True,
                                      use_self_mask=True),
            voxel_enc=VoxelEncoderCfg(hlevels=(0, 1, 2, 3),
                                      accum="bfloat16",
                                      sorted_gather=sorted_g,
                                      int8_gather=int8,
                                      pallas_conv=pzt,
                                      backbone="swin3d" if swin
                                      else "res16unet"),
            mask_head_cfg=MaskHeadCfg(num_targets=201,
                                      filter_out_classes=(0, 2)))
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            batch, train=False)
        if bf16:
            from pq3d_tpu.utils.inference import (cast_batch_bf16,
                                                  cast_params_bf16)
            variables = cast_params_bf16(variables)
            batch = cast_batch_bf16(batch)
        fwd = jax.jit(lambda v, b: sum(
            jnp.sum(x) for x in jax.tree.leaves(
                model.apply(v, b, train=False))))
        key = name.strip()
        variants[key] = _time_calls(fwd, variables, batch)
        host_times[key] = host_t
        mfu[key] = _mfu(_flops(fwd, variables, batch), variants[key])
        print(f"# instseg {key}: {variants[key]*1000:.1f} ms",
              file=sys.stderr, flush=True)
      except Exception as e:
        print(f"# instseg variant failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    if not variants:
        raise RuntimeError("every instseg variant failed")
    dt = min(variants.values())
    best = min(variants, key=variants.get)
    # host time is reported for the WINNING variant so the JSON's host and
    # device numbers describe the same configuration
    return batch_size / dt, dt, host_times[best], {
        k: round(v * 1000, 2) for k, v in variants.items()}, mfu


def wait_for_device(max_wait_s: int = 1800) -> None:
    """Block until the accelerator answers a subprocess probe.

    The axon tunnel can be transiently unavailable (observed: jax.devices()
    hangs rather than erroring, and a hang poisons the calling process).
    Probing in a clean subprocess with a timeout keeps this process usable
    and retries until the chip grants or ``max_wait_s`` elapses.
    """
    import subprocess
    deadline = time.time() + max_wait_s
    probe = ("import jax, jax.numpy as jnp; jax.devices(); "
             "print(float(jnp.ones((8, 8)).sum()))")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=240)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            raise RuntimeError(
                f"accelerator unreachable after {max_wait_s}s of probing")
        time.sleep(60)


def main():
    degraded = False
    if SMOKE:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") +             " --xla_force_host_platform_device_count=1"
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    else:
        try:
            wait_for_device()
        except RuntimeError:
            # TPU tunnel unreachable for the whole wait window (observed
            # multi-hour axon outages where jax.devices() hangs).  Re-exec
            # in CPU smoke mode so the driver still records a JSON line;
            # the output is clearly labeled NOT a chip measurement.
            env = dict(os.environ)
            env["BENCH_SMOKE"] = "1"
            env["BENCH_DEGRADED"] = "1"
            env["JAX_CACHE_DIR"] = env.get("JAX_CACHE_DIR",
                                           "/tmp/jaxcache") + "_cpu"
            os.execve(sys.executable, [sys.executable, __file__], env)
    degraded = os.environ.get("BENCH_DEGRADED") == "1"
    import jax
    import jax.numpy as jnp
    from pq3d_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(jax)
    rng = np.random.default_rng(0)

    uni_sps, uni_dt, uni_host, uni_variants, uni_mfu = bench_unified(
        jax, jnp, rng)
    try:
        seg_sps, seg_dt, seg_host, seg_variants, seg_mfu = bench_instseg(
            jax, jnp, rng)
    except Exception as e:     # never lose the headline to the detail block
        print(f"# instseg bench failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        seg_sps = seg_dt = seg_host = 0.0
        seg_variants = {"error": str(e)[:200]}
        seg_mfu = {}

    result = {
        "metric": "unified_task_inference_throughput",
        "value": round(uni_sps, 3),
        # any SMOKE output is a shrunken CPU liveness run, never chip perf
        "unit": ("scenes/sec CPU-SMOKE (TPU tunnel unreachable; NOT chip "
                 "perf — last chip numbers in PERF.md)" if degraded
                 else "scenes/sec CPU-SMOKE (pre-flight; NOT a measurement)"
                 if SMOKE else "scenes/sec/chip"),
        "vs_baseline": 0.0 if SMOKE else round(uni_sps / 20.0, 3),
        "detail": {
            "unified_step_ms": round(uni_dt * 1000, 2),
            "unified_variants_ms": {k: round(v * 1000, 2)
                                    for k, v in uni_variants.items()},
            "unified_batch": int(os.environ.get(
                "BENCH_UNIFIED_BATCH", "2" if SMOKE else "8")),
            # MFU = XLA cost-analysis FLOPs / step / 197 TF/s bf16 peak —
            # a lower bound for gather-bound models (VERDICT r03 item 9)
            "unified_mfu": uni_mfu,
            "instseg_mfu": seg_mfu,
            "instseg_scenes_per_sec": round(seg_sps, 3),
            "instseg_step_ms": round(seg_dt * 1000, 2),
            "instseg_variants_ms": seg_variants,
            "instseg_batch": 2 if SMOKE else 4,
            "instseg_voxels_pad": 256 if SMOKE else 65536,
            "host_s_unified": round(uni_host, 2),
            "host_s_instseg": round(seg_host, 2),
            "device": str(jax.devices()[0]),
        },
    }
    if degraded:
        result["detail"]["degraded"] = (
            "axon TPU tunnel unreachable after 30 min of probing; ran the "
            "shrunken CPU smoke config as a liveness check only.  Last real "
            "chip measurements: 301.6 scenes/s unified (BENCH_r01.json), "
            "full ladder in PERF.md.")
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    main()
