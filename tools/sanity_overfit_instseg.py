"""Train on 2 fixed scenes until the evaluator shows real AP."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import numpy as np, jax, jax.numpy as jnp
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)
from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.query3d import Query3DUnified, UnifiedEncoderCfg, MaskHeadCfg, VoxelEncoderCfg, EncoderCfg
from pq3d_tpu.optim.losses import InstSegLossConfig, instseg_set_loss
from pq3d_tpu.optim.optimizers import build_optimizer
from pq3d_tpu.train.state import TrainState, make_train_step, make_eval_step
from pq3d_tpu.eval.instseg_eval import InstSegEval

rng = np.random.default_rng(0)
pipe_cfg = InstSegPipelineConfig(voxel_size=0.05, num_queries=32, max_segments=128,
                                 max_instances=24, voxel_bucket=2048, use_aug=False)
scenes = [synthetic.make_scene(rng, n_points=8000, n_instances=8, n_segments=64) for _ in range(2)]
for s in scenes: s["inst_labels"] = np.minimum(s["inst_labels"], 19)
batch_np = make_batch(scenes, pipe_cfg, rng, train=False)
S = 128
batch_np["mv_seg_fts"] = rng.standard_normal((2, S, 64)).astype(np.float32)
batch_np["mv_seg_pad_masks"] = batch_np["seg_pad_masks"]
batch_np["pc_seg_fts"] = rng.standard_normal((2, S, 64)).astype(np.float32)
batch_np["pc_seg_pad_masks"] = batch_np["seg_pad_masks"]
meta = batch_np.pop("_meta")
batch = jax.tree.map(jnp.asarray, batch_np)
print("host done", flush=True)

model = Query3DUnified(memories=("voxel","mv","pc"), heads=("mask",), hidden_size=128, dim_loc=3,
    unified=UnifiedEncoderCfg(num_layers=2, num_blocks=1, num_attention_heads=8, structure="parallel",
                              spatial_selfattn=True, use_self_mask=True),
    mv_enc=EncoderCfg(input_feat_size=64), pc_enc=EncoderCfg(input_feat_size=64),
    voxel_enc=VoxelEncoderCfg(hlevels=(0,1,2,3), out_channels=21,
                              grad_mode="scatter_free", remat_policy="none"),
    mask_head_cfg=MaskHeadCfg(num_targets=21, filter_out_classes=()))
variables = jax.jit(model.init, static_argnames=("train",))({"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
loss_cfg = InstSegLossConfig(num_classes=20)
def loss_fn(out, b):
    return instseg_set_loss(out["predictions_class"], out["predictions_mask"], b, loss_cfg)
optimizer, _ = build_optimizer(variables["params"], lr=3e-4, total_steps=600, grad_norm=80.0, sched_name="constant")
state = TrainState.create(variables, optimizer, jax.random.key(2))
step = make_train_step(model, optimizer, loss_fn, donate=False)
eval_step = make_eval_step(model)

for i in range(500):
    state, m = step(state, batch)
    if i % 100 == 0:
        print(f"step {i} loss {float(m['loss']):.2f}", flush=True)
print(f"final loss {float(m['loss']):.2f}", flush=True)

out = eval_step(state, batch)
ev = InstSegEval(topk_per_scene=30, num_classes=20)
host_out = {k: [np.asarray(x) for x in v] for k, v in out.items()
            if k in ("predictions_class", "predictions_mask")}
ev.update(host_out, {**{k: np.asarray(v) for k, v in batch.items()
                        if k != "maps"}})
res = ev.record()
print("AP:", {k: round(v, 3) for k, v in res.items()}, flush=True)
assert res["all_ap_25%"] > 0.3, "overfit scenes should have decent AP25"
print("AP PIPELINE OK", flush=True)
