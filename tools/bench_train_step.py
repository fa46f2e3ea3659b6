"""Training-step throughput at bench scale (fwd+bwd+clip+AdamW).

Usage: python tools/bench_train_step.py [remat_policy] [grad_mode] [opts]
  remat_policy: full (default) | dots | gather_only | none
  grad_mode:    native (default) | scatter_free
  opts:         comma list of 'sorted' (sorted-index gathers),
                'dense_stem' (dense-block conv0), 'flat' (flat-packed
                layout), 'compact' (tap-compacted convs; implies flat),
                'ztriple' (z-run fetch plans for the L1-3 convs),
                'swin' (swin3d window-attention backbone; implies no stem)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys, time, numpy as np, jax, jax.numpy as jnp
POLICY = sys.argv[1] if len(sys.argv) > 1 else "full"
GRAD_MODE = sys.argv[2] if len(sys.argv) > 2 else "native"
OPTS = (sys.argv[3].split(",") if len(sys.argv) > 3 else [])
SORTED = "sorted" in OPTS
SWIN = "swin" in OPTS
STEM = "none" if SWIN else ("dense_block" if "dense_stem" in OPTS else "gather")
COMPACT = "compact" in OPTS
FLAT = COMPACT or ("flat" in OPTS)
ZTRIPLE = "ztriple" in OPTS
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)
from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.query3d import Query3DUnified, UnifiedEncoderCfg, MaskHeadCfg, VoxelEncoderCfg
from pq3d_tpu.optim.losses import InstSegLossConfig, instseg_set_loss
from pq3d_tpu.optim.optimizers import build_optimizer
from pq3d_tpu.train.state import TrainState, make_train_step

rng = np.random.default_rng(0)
pipe_cfg = InstSegPipelineConfig(voxel_size=0.02, num_queries=120, max_segments=512,
                                 max_instances=120, voxel_bucket=8192, use_aug=False,
                                 stem_mode=STEM, flat_pack=FLAT,
                                 compact_conv=COMPACT, ztriple_conv=ZTRIPLE,
                                 swin_window=4 if SWIN else 0)
scenes = [synthetic.make_scene(rng, n_points=80_000, n_instances=24, n_segments=400) for _ in range(4)]
for s in scenes: s["inst_labels"] = np.minimum(s["inst_labels"], 199)
batch = make_batch(scenes, pipe_cfg, rng, train=True)
S = 512
batch["mv_seg_fts"] = rng.standard_normal((4, S, 768)).astype(np.float32)
batch["mv_seg_pad_masks"] = batch["seg_pad_masks"]
batch["pc_seg_fts"] = rng.standard_normal((4, S, 768)).astype(np.float32)
batch["pc_seg_pad_masks"] = batch["seg_pad_masks"]
batch = {k: v for k, v in batch.items() if not k.startswith('_')}
batch = jax.tree.map(jnp.asarray, batch)
print("host done", flush=True)

model = Query3DUnified(memories=("voxel","mv","pc"), heads=("mask",), hidden_size=768, dim_loc=3,
    unified=UnifiedEncoderCfg(num_layers=4, num_blocks=3, num_attention_heads=12, structure="parallel",
                              spatial_selfattn=True, use_self_mask=True),
    voxel_enc=VoxelEncoderCfg(hlevels=(0,1,2,3), remat_policy=POLICY,
                              grad_mode=GRAD_MODE, sorted_gather=SORTED,
                              backbone="swin3d" if SWIN else "res16unet"),
    mask_head_cfg=MaskHeadCfg(num_targets=201, filter_out_classes=(0,2)))
variables = jax.jit(model.init, static_argnames=("train",))({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
print("init done", flush=True)
loss_cfg = InstSegLossConfig()
def loss_fn(out, b):
    return instseg_set_loss(out["predictions_class"], out["predictions_mask"], b, loss_cfg)
optimizer, _ = build_optimizer(variables["params"], lr=1e-4, total_steps=1000, grad_norm=80.0)
state = TrainState.create(variables, optimizer, jax.random.key(2))
step = make_train_step(model, optimizer, loss_fn, donate=False)
state2, metrics = step(state, batch)
print("compiled, loss", float(metrics["loss"]), flush=True)
t0 = time.time()
for _ in range(3):
    state2, metrics = step(state2, batch)
    _ = float(metrics["loss"])
dt = (time.time()-t0)/3
print(f"train step [{POLICY}/{GRAD_MODE}/{','.join(OPTS) or 'base'}]: "
      f"{dt*1000:.0f} ms -> {4/dt:.2f} scenes/s training", flush=True)

if os.environ.get("TRAIN_DECOMPOSE") == "1":
    # Piecewise profile of the non-conv remainder (VERDICT r04 item 4b):
    # time (a) forward, (b) forward+criterion (13 Hungarian rounds), and
    # (c) the optimizer update alone on fixed grads; with the full step
    # above, bwd = full - fwd_loss - opt (scheduling overlap makes this a
    # bound, not an exact split).
    def _t(fn, *a, n=3):
        out = fn(*a); _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.time()
        for _i in range(n):
            out = fn(*a)
            _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.time() - t0) / n

    fwd = jax.jit(lambda v, b: sum(
        jnp.sum(x) for x in jax.tree.leaves(
            model.apply(v, b, train=False))))
    t_fwd = _t(fwd, variables, batch)

    def _fwd_loss(v, b):
        out = model.apply(v, b, train=False)
        total, _parts = loss_fn(out, b)
        return total
    fwd_loss = jax.jit(_fwd_loss)
    t_fwd_loss = _t(fwd_loss, variables, batch)

    grads = jax.tree.map(jnp.zeros_like, variables["params"])
    opt_state = optimizer.init(variables["params"])

    def _opt(g, os_, p):
        up, os2 = optimizer.update(g, os_, p)
        import optax
        return optax.apply_updates(p, up)
    opt = jax.jit(_opt)
    t_opt = _t(opt, grads, opt_state, variables["params"])

    print(f"decompose: fwd={t_fwd*1e3:.0f} ms  "
          f"criterion={(t_fwd_loss-t_fwd)*1e3:.0f} ms  "
          f"opt(AdamW+clip)={t_opt*1e3:.0f} ms  "
          f"bwd+rest={(dt-t_fwd_loss-t_opt)*1e3:.0f} ms  "
          f"(full {dt*1e3:.0f} ms)", flush=True)
