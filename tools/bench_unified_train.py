"""Stage-2 (unified multitask) TRAINING-step throughput at reference scale.

The reference's stage-2 recipe trains at batch 128/GPU for 50 epochs
(configs/unified_tasks_sceneverse.yaml:83-104): offline mv/voxel features,
frozen CLIP-large prompt, PointNet++ pc memory, mixed-fusion decoder,
ground CE (weight 10) + T5 teacher-forced generation CE.  bench.py measures
stage-2 *inference*; this tool measures the full jitted train step
(fwd + loss + bwd + clip + AdamW) so the training side of stage 2 has a
number too.

Usage: python tools/bench_unified_train.py [batch_size ...]   (default 32 128)
BENCH_SMOKE=1 shrinks everything for a CPU pre-flight.
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
from pq3d_tpu.data.unified_datasets import SyntheticRefer
from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                     EncoderCfg, GroundHeadCfg,
                                     GenerationHeadCfg, TxtEncoderCfg)
from pq3d_tpu.optim.loss_aggregator import Loss
from pq3d_tpu.optim.optimizers import build_optimizer
from pq3d_tpu.train.state import TrainState, make_train_step

_num = [a for a in sys.argv[1:] if a.isdigit()]
VARIANTS = [a for a in sys.argv[1:] if not a.isdigit()] or ["base"]
BATCHES = [int(a) for a in _num] or ([2] if SMOKE else [32, 128])


def build(batch_size, variant="base"):
    cfg = Config({"data": {"synthetic": {"num_train": batch_size,
                                         "n_points": 300 if SMOKE else 2000,
                                         "n_instances": 8}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=8 if SMOKE else 80,
                                 num_points=64 if SMOKE else 1024,
                                 prompt_len=12 if SMOKE else 77,
                                 response_len=4 if SMOKE else 50,
                                 flat_obj=(variant == "flat"),
                                 flat_obj_bucket=4 if SMOKE else 64)
    loader = UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                               batch_size=batch_size, train=True,
                               feature_dims={"mv": 768, "voxel": 128})
    batch = next(iter(loader(0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not k.startswith("_")}

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
        batch, train=True)

    # the reference's stage-2 loss set: ground CE x10 + generation CE
    # (unified_tasks_sceneverse.yaml loss_list/loss_weights)
    loss_fn = Loss(["ground_loss", "generation_loss"], {"ground_loss": 10.0})
    optimizer, _ = build_optimizer(variables["params"], name="AdamW",
                                   lr=1e-4, total_steps=1000, grad_norm=5.0)
    state = TrainState.create(variables, optimizer, jax.random.key(2))
    step = make_train_step(model, optimizer, loss_fn, donate=True)
    return step, state, batch


def time_steps(step, state, batch, n1=2, n2=10):
    """Slope timing (PERF.md): chained steps, one scalar readback per run."""
    def run(k, st):
        t0 = time.time()
        for _ in range(k):
            st, metrics = step(st, batch)
        _ = float(metrics["loss"])
        return time.time() - t0, st

    _, state = run(1, state)           # compile
    _, state = run(n1, state)          # warm queue
    t1, state = run(n1, state)
    t2, state = run(n2, state)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    for variant in VARIANTS:
        for bs in BATCHES:
            try:
                step, state, batch = build(bs, variant)
                dt = time_steps(step, state, batch)
                print(f"unified_train[{variant}] B={bs}: "
                      f"{dt*1000:.1f} ms/step  {bs/dt:.1f} scenes/s",
                      flush=True)
            except Exception as e:
                print(f"unified_train[{variant}] B={bs}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
