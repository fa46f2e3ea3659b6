"""Realistic-scale multi-device training on the virtual CPU mesh.

VERDICT r03 item 5: the driver dryrun (`__graft_entry__.dryrun_multichip`)
proves the mesh train step compiles and runs, but at hidden=64 toy shapes —
shape-dependent sharding bugs (uneven segment pads across dp ranks,
cap-boundary padding, per-rank FPS divergence) can hide behind tiny shapes.
This runs the SAME dp train step at the shipped instseg recipe's real
shapes (configs/instseg_sceneverse.yaml: hidden 768, 120 queries, 512
segments, level_caps [65536, 32768, 8192, 2048, 512]) over the 8-device
virtual CPU mesh, with deliberately UNEVEN scenes across ranks (different
point/segment/instance counts per scene, so per-rank padding differs),
and checks the sharded loss is finite across N steps.

Counterpart capability in the reference: Accelerate DDP at full scale
(/root/reference/trainer/build.py:123-129) — validated there only by
running real jobs; here it is a standing harness.

Usage: python tools/bench_mesh_train.py [scale] [n_devices] [steps]
  scale: full (default; the shipped level_caps = 65536...)
         half (32768... — for quicker iteration)
         smoke (8192... — CI-speed shape check)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = sys.argv[1] if len(sys.argv) > 1 else "full"
N_DEV = int(sys.argv[2]) if len(sys.argv) > 2 else 8
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

# Platform setup must precede any jax import: the image pins the axon TPU
# platform; the virtual mesh needs the host-device-count flag; and 8
# devices sharing one contended core need the collective rendezvous
# timeouts raised past XLA:CPU's 40-s kill (PERF.md "multichip dryrun
# determinism").
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags += [f"--xla_force_host_platform_device_count={N_DEV}",
           "--xla_cpu_collective_call_terminate_timeout_seconds=1200",
           "--xla_cpu_collective_timeout_seconds=1200",
           # at real shapes the per-device thunk executors pick different
           # collective launch orders and deadlock (observed: 6 threads in
           # all-reduce op A, 2 in op B, both starved past the 1200 s
           # terminate timeout).  Pin a deterministic schedule and keep each
           # device program on its own calling thread so a blocked
           # rendezvous never starves another device's executor.
           "--xla_cpu_enable_concurrency_optimized_scheduler=false",
           "--xla_cpu_multi_thread_eigen=false"]
os.environ["XLA_FLAGS"] = " ".join(_flags)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                     MaskHeadCfg, VoxelEncoderCfg)
from pq3d_tpu.optim.losses import InstSegLossConfig, instseg_set_loss
from pq3d_tpu.optim.optimizers import build_optimizer
from pq3d_tpu.parallel.mesh import (MeshConfig, make_mesh, shard_batch,
                                    shard_params)
from pq3d_tpu.train.state import TrainState, make_train_step

# full = the shipped recipe caps (real 0.02 m scans).  smoke/half decay
# gentler than the shipped 4x-per-level: synthetic random-surface scenes
# at low point counts keep ~2x voxel ratios between hierarchy levels.
CAPS = {"full": [65536, 32768, 8192, 2048, 512],
        "half": [32768, 16384, 8192, 4096, 2048],
        "smoke": [8192, 8192, 4096, 2048, 1024]}[SCALE]
# point counts stay modest (host-side cost only — the caps pin every device
# shape); what matters is that they DIFFER per rank so per-rank pad
# fractions differ
N_POINTS = {"full": 20_000, "half": 12_000, "smoke": 3_000}[SCALE]

rng = np.random.default_rng(0)
pipe_cfg = InstSegPipelineConfig(
    voxel_size=0.02, num_queries=120, max_segments=512, max_instances=120,
    voxel_bucket=8192, use_aug=False, stem_mode="dense_block",
    level_caps=CAPS, fps_subsample=4096,
    # synthetic random-sampled scenes occupy more 8^3 blocks per voxel
    # than dense real scans; the caps[0]//16 default overflows
    stem_block_cap=CAPS[0] // 4)
scenes = []
for i in range(N_DEV):
    # uneven across ranks on purpose
    scenes.append(synthetic.make_scene(
        rng, n_points=N_POINTS - (N_POINTS // 8) * (i % 4),
        n_instances=8 + 3 * (i % 5), n_segments=200 + 40 * (i % 3)))
for s in scenes:
    s["inst_labels"] = np.minimum(s["inst_labels"], 199)
t0 = time.time()
batch = make_batch(scenes, pipe_cfg, rng, train=True)
S = pipe_cfg.max_segments
batch["mv_seg_fts"] = rng.standard_normal((N_DEV, S, 768)).astype(np.float32)
batch["mv_seg_pad_masks"] = batch["seg_pad_masks"]
batch["pc_seg_fts"] = rng.standard_normal((N_DEV, S, 768)).astype(np.float32)
batch["pc_seg_pad_masks"] = batch["seg_pad_masks"]
batch = {k: v for k, v in batch.items() if not k.startswith("_")}
print(f"host collate {time.time()-t0:.1f}s; voxel level shapes: "
      f"{[batch[k].shape for k in batch if k.startswith('voxel_coords')] or 'n/a'}",
      flush=True)

model = Query3DUnified(
    memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=768,
    dim_loc=3,
    unified=UnifiedEncoderCfg(num_layers=4, num_blocks=3,
                              num_attention_heads=12, structure="parallel",
                              spatial_selfattn=True, use_self_mask=True),
    voxel_enc=VoxelEncoderCfg(hlevels=(0, 1, 2, 3), remat_policy="full",
                              grad_mode="scatter_free"),
    mask_head_cfg=MaskHeadCfg(num_targets=201, filter_out_classes=(0, 2)))

mesh_cfg = MeshConfig(data=N_DEV, fsdp=1, tp=1)
mesh = make_mesh(mesh_cfg, devices=jax.devices()[:N_DEV])

batch = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
t0 = time.time()
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0), "dropout": jax.random.key(1)},
    batch, train=False)
print(f"init {time.time()-t0:.1f}s", flush=True)

loss_cfg = InstSegLossConfig()


def loss_fn(out, b):
    return instseg_set_loss(out["predictions_class"],
                            out["predictions_mask"], b, loss_cfg)


optimizer, _ = build_optimizer(variables["params"], lr=1e-4,
                               total_steps=1000, grad_norm=80.0)
state = TrainState.create(variables, optimizer, jax.random.key(2))
state = state.replace(
    params=shard_params(state.params, mesh, mesh_cfg),
    opt_state=shard_params(state.opt_state, mesh, mesh_cfg))
step = make_train_step(model, optimizer, loss_fn, donate=False)

t0 = time.time()
state, metrics = step(state, batch)
loss0 = float(metrics["loss"])
print(f"compile+step0 {time.time()-t0:.1f}s loss={loss0:.4f} "
      f"grad_norm={float(metrics['grad_norm']):.4f}", flush=True)
assert np.isfinite(loss0), f"non-finite loss {loss0}"

times = []
for i in range(STEPS - 1):
    t0 = time.time()
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    times.append(time.time() - t0)
    print(f"step{i+1} {times[-1]:.1f}s loss={loss:.4f}", flush=True)
    assert np.isfinite(loss), f"non-finite loss at step {i+1}"

mean = sum(times) / max(len(times), 1) if times else 0.0
print(f"MESH_TRAIN_OK scale={SCALE} dp={N_DEV} caps={CAPS} "
      f"steps={STEPS} mean_step_s={mean:.1f}", flush=True)
