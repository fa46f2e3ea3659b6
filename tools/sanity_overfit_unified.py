"""Stage-2 learning sanity: ground + generation losses drop on one batch."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import numpy as np, jax, jax.numpy as jnp
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)
from pq3d_tpu.config import Config
from pq3d_tpu.data.unified_datasets import SyntheticRefer, SyntheticQA
from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg, EncoderCfg,
                                     GroundHeadCfg, GenerationHeadCfg, TxtEncoderCfg)
from pq3d_tpu.optim.losses import cross_entropy, generation_loss
from pq3d_tpu.optim.optimizers import build_optimizer
from pq3d_tpu.train.state import TrainState, make_train_step

cfg = Config({"data": {"synthetic": {"num_train": 8, "n_points": 800, "n_instances": 6}},
              "debug": {"flag": False}})
pipe = UnifiedPipelineConfig(max_obj_len=8, num_points=64, prompt_len=10, response_len=6)
loader = UnifiedTaskLoader(SyntheticQA(cfg, "train"), pipe, batch_size=8, train=True)
batch = next(iter(loader(0)))
batch = {k: jnp.asarray(v) for k, v in batch.items() if not k.startswith("_")}
print("host done", flush=True)

model = Query3DUnified(
    memories=("mv","pc","voxel","prompt"), heads=("ground","generation"),
    hidden_size=64, dim_loc=6, use_offline_voxel_fts=True,
    skip_query_encoder_mask_pred=True, mask_head_cfg=None,
    unified=UnifiedEncoderCfg(num_layers=2, num_blocks=1, num_attention_heads=4,
                              structure="mixed", memory_dropout=0.3),
    mv_enc=EncoderCfg(input_feat_size=768),
    pc_enc=EncoderCfg(input_feat_size=768, backbone='pointnet++'),
    voxel_obj_enc=EncoderCfg(input_feat_size=128),
    ground_head_cfg=GroundHeadCfg(hidden_size=32),
    generation_head_cfg=GenerationHeadCfg(vocab_size=64, d_model=32, d_kv=8,
                                          d_ff=64, num_layers=2, num_heads=4,
                                          max_new_tokens=5),
    txt_cfg=TxtEncoderCfg(vocab_size=64, width=32, layers=2, heads=2,
                          freeze_backbone=False))
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, train=False)
def loss_fn(out, b):
    lg = cross_entropy(out["ground_logits"], b["tgt_object_id"])
    lgen = generation_loss(out, b)
    return 10.0 * lg + lgen, {"ground": lg, "gen": lgen}
optimizer, _ = build_optimizer(variables["params"], lr=1e-3, total_steps=100,
                               grad_norm=5.0, sched_name="constant")
state = TrainState.create(variables, optimizer, jax.random.key(2))
step = make_train_step(model, optimizer, loss_fn, donate=False)
first = None
for i in range(60):
    state, m = step(state, batch)
    if i == 0:
        first = {k: float(v) for k, v in m.items() if k in ("ground","gen")}
last = {k: float(v) for k, v in m.items() if k in ("ground","gen")}
print("first", first, "last", last, flush=True)
assert last["ground"] < first["ground"] * 0.8
assert last["gen"] < first["gen"] * 0.8
print("STAGE2 LEARNING OK", flush=True)
