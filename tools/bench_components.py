"""Component-level timings for the stage-1 training step at bench scale.

Isolates: U-Net fwd, U-Net grad, full-model fwd, set-loss grad (decoder +
Hungarian rounds), to locate the remaining backward cost.
Usage: python tools/bench_components.py [grad_mode]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys, time, numpy as np, jax, jax.numpy as jnp
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)
from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.sparse_unet import Res16UNet
from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                     MaskHeadCfg, VoxelEncoderCfg)
from pq3d_tpu.optim.losses import InstSegLossConfig, instseg_set_loss

GRAD_MODE = sys.argv[1] if len(sys.argv) > 1 else "scatter_free"
POLICY = "none" if GRAD_MODE == "scatter_free" else "full"

rng = np.random.default_rng(0)
pipe_cfg = InstSegPipelineConfig(voxel_size=0.02, num_queries=120,
                                 max_segments=512, max_instances=120,
                                 voxel_bucket=8192, use_aug=False)
scenes = [synthetic.make_scene(rng, n_points=80_000, n_instances=24,
                               n_segments=400) for _ in range(4)]
for s in scenes:
    s["inst_labels"] = np.minimum(s["inst_labels"], 199)
batch = make_batch(scenes, pipe_cfg, rng, train=True)
S = 512
batch["mv_seg_fts"] = rng.standard_normal((4, S, 768)).astype(np.float32)
batch["mv_seg_pad_masks"] = batch["seg_pad_masks"]
batch["pc_seg_fts"] = rng.standard_normal((4, S, 768)).astype(np.float32)
batch["pc_seg_pad_masks"] = batch["seg_pad_masks"]
batch = {k: v for k, v in batch.items() if not k.startswith('_')}
batch = jax.tree.map(jnp.asarray, batch)
print("host done", flush=True)


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # host readback fence (block_until_ready unreliable on axon)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1000:.0f} ms", flush=True)
    return dt


# ---- U-Net alone -----------------------------------------------------------
unet = Res16UNet(out_channels=200, remat_policy=POLICY, grad_mode=GRAD_MODE)
uvars = jax.jit(unet.init, static_argnames=("train",))(
    jax.random.key(0), batch["voxel_feats"], batch["maps"], train=True)


@jax.jit
def unet_fwd(params, feats, maps):
    out, _ = unet.apply(dict(uvars, params=params), feats, maps, train=True,
                        mutable=["batch_stats"])[0]
    return (out ** 2).sum()


@jax.jit
def unet_grad(params, feats, maps):
    def f(p):
        out, _ = unet.apply(dict(uvars, params=p), feats, maps, train=True,
                            mutable=["batch_stats"])[0]
        return (out ** 2).sum()
    return jax.grad(f)(params)


timeit("unet fwd (train)", unet_fwd, uvars["params"], batch["voxel_feats"], batch["maps"])
timeit("unet fwd+bwd", unet_grad, uvars["params"], batch["voxel_feats"], batch["maps"])

# ---- full model ------------------------------------------------------------
model = Query3DUnified(
    memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=768,
    dim_loc=3,
    unified=UnifiedEncoderCfg(num_layers=4, num_blocks=3,
                              num_attention_heads=12, structure="parallel",
                              spatial_selfattn=True, use_self_mask=True),
    voxel_enc=VoxelEncoderCfg(hlevels=(0, 1, 2, 3), remat_policy=POLICY,
                              grad_mode=GRAD_MODE),
    mask_head_cfg=MaskHeadCfg(num_targets=201, filter_out_classes=(0, 2)))
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0), "dropout": jax.random.key(1)},
    batch, train=False)
loss_cfg = InstSegLossConfig()


@jax.jit
def model_fwd_loss(params, batch):
    v = dict(variables)
    v["params"] = params
    out = model.apply(v, batch, train=True,
                      rngs={"dropout": jax.random.key(3)},
                      mutable=["batch_stats"])[0]
    return instseg_set_loss(out["predictions_class"],
                            out["predictions_mask"], batch, loss_cfg)[0]


@jax.jit
def model_grad(params, batch):
    return jax.grad(lambda p: model_fwd_loss(p, batch))(params)


timeit("model fwd+loss (train)", model_fwd_loss, variables["params"], batch)
timeit("model fwd+loss+bwd", model_grad, variables["params"], batch)
