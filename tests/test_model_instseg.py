"""End-to-end stage-1 slice: synthetic scenes -> pipeline -> model -> loss -> grad."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig, make_batch)
from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                     MaskHeadCfg, VoxelEncoderCfg, EncoderCfg)
from pq3d_tpu.optim.losses import InstSegLossConfig, instseg_set_loss

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")


PIPE_CFG = InstSegPipelineConfig(
    voxel_size=0.15, num_queries=16, max_segments=64, max_instances=16,
    voxel_bucket=256)


def tiny_model(**kw):
    defaults = dict(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=32,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=2, num_blocks=1,
                                  num_attention_heads=4, structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        mv_enc=EncoderCfg(input_feat_size=24),
        pc_enc=EncoderCfg(input_feat_size=24),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20),
        mask_head_cfg=MaskHeadCfg(num_targets=21, filter_out_classes=(0, 2)),
    )
    defaults.update(kw)
    return Query3DUnified(**defaults)


def build_batch(rng, n_scenes=2, n_points=800):
    scenes = [synthetic.make_scene(rng, n_points=n_points, n_instances=4,
                                   n_segments=24) for _ in range(n_scenes)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)  # 20 classes
    batch = make_batch(scenes, PIPE_CFG, rng, train=True)
    # offline mv/pc segment features (the reference ships them precomputed)
    S = PIPE_CFG.max_segments
    batch["mv_seg_fts"] = rng.standard_normal(
        (n_scenes, S, 24)).astype(np.float32)
    batch["mv_seg_pad_masks"] = batch["seg_pad_masks"]
    batch["pc_seg_fts"] = rng.standard_normal(
        (n_scenes, S, 24)).astype(np.float32)
    batch["pc_seg_pad_masks"] = batch["seg_pad_masks"]
    batch = {k: v for k, v in batch.items() if not k.startswith("_")}
    return jax.tree.map(jnp.asarray, batch)


@pytest.fixture(scope="module")
def batch():
    return build_batch(np.random.default_rng(0))


@pytest.fixture(scope="module")
def model_and_vars(batch):
    model = tiny_model()
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    return model, variables


def test_forward_shapes(batch, model_and_vars):
    model, variables = model_and_vars
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    # num_blocks * num_layers intermediate rounds + 1 final
    assert len(out["predictions_class"]) == 2 + 1
    b, q = batch["query_pad_masks"].shape
    s = batch["seg_pad_masks"].shape[1]
    assert out["predictions_class"][-1].shape == (b, q, 21)
    assert out["predictions_mask"][-1].shape == (b, s, q)
    assert np.isfinite(np.asarray(out["query"])).all()
    # filtered classes forced to -inf-ish
    cls = np.asarray(out["predictions_class"][-1])
    assert (cls[..., 0] < -1e8).all() and (cls[..., 2] < -1e8).all()


def test_loss_and_grad(batch, model_and_vars):
    model, variables = model_and_vars
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, updates = model.apply(
            {"params": p, **other}, batch, train=True,
            rngs={"dropout": jax.random.key(3)},
            mutable=["batch_stats"])
        total, parts = instseg_set_loss(
            out["predictions_class"], out["predictions_mask"], batch,
            InstSegLossConfig(num_classes=20))
        return total, parts

    (total, parts), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert np.isfinite(float(total))
    assert {"loss_ce", "loss_mask", "loss_dice"} <= set(parts)
    leaf_norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert np.isfinite(leaf_norms).all()
    assert max(leaf_norms) > 0, "gradients should flow"


def test_batchnorm_stats_update(batch, model_and_vars):
    model, variables = model_and_vars
    out, updates = jax.jit(lambda v, b: model.apply(
        v, b, train=True, rngs={"dropout": jax.random.key(4)},
        mutable=["batch_stats"]))(variables, batch)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed, "running BN stats should move in train mode"


def test_eval_deterministic(batch, model_and_vars):
    model, variables = model_and_vars
    f = jax.jit(lambda v, b, r: model.apply(v, b, train=False,
                                            rngs={"dropout": r}))
    o1 = f(variables, batch, jax.random.key(5))
    o2 = f(variables, batch, jax.random.key(6))
    np.testing.assert_allclose(np.asarray(o1["query"]),
                               np.asarray(o2["query"]), atol=1e-6)


def test_voxel_level_encoder():
    """PCDMask3DEncoder variant: mask feature + multi-scale voxel features."""
    from pq3d_tpu.models.encoders import VoxelLevelEncoder
    rng = np.random.default_rng(7)
    scenes = [synthetic.make_scene(rng, n_points=600, n_instances=3,
                                   n_segments=16) for _ in range(2)]
    batch = make_batch(scenes, PIPE_CFG, rng, train=False)
    enc = VoxelLevelEncoder(hidden_size=32, hlevels=(0, 1),
                            backbone_out_channels=20)
    feats = jnp.asarray(batch["voxel_feats"])
    maps = {k: jnp.asarray(v) for k, v in batch["maps"].items()}
    params = enc.init(jax.random.PRNGKey(0), feats, maps)
    mask_feat, multi = jax.jit(enc.apply)(params, feats, maps)
    b, p0 = batch["maps"]["valid_0"].shape
    assert mask_feat.shape == (b, p0, 32)
    assert len(multi) == 2
    assert multi[0].shape[0] == b and multi[0].shape[2] == 32
    assert np.isfinite(np.asarray(mask_feat)).all()
