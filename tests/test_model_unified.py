"""Stage-2 unified model slice: prompt routing, ground + generation heads,
mixed fusion, offline voxel features, PointNet++ pc backbone."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                     EncoderCfg, GroundHeadCfg,
                                     GenerationHeadCfg, TxtEncoderCfg,
                                     PROMPT_TXT, PROMPT_LOC)


B, S, Q, L, RESP = 4, 12, 8, 10, 6
HID = 32


def unified_model():
    return Query3DUnified(
        memories=("mv", "pc", "voxel", "prompt"),
        heads=("ground", "generation"),
        hidden_size=HID, dim_loc=6,
        use_offline_voxel_fts=True,
        skip_query_encoder_mask_pred=True,
        mask_head_cfg=None,
        unified=UnifiedEncoderCfg(num_layers=2, num_blocks=1,
                                  num_attention_heads=4, structure="mixed",
                                  spatial_selfattn=True,
                                  memory_dropout=0.5),
        mv_enc=EncoderCfg(input_feat_size=16),
        pc_enc=EncoderCfg(input_feat_size=16),
        voxel_obj_enc=EncoderCfg(input_feat_size=8),
        ground_head_cfg=GroundHeadCfg(hidden_size=16),
        generation_head_cfg=GenerationHeadCfg(
            vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
            num_heads=4, max_new_tokens=5),
        txt_cfg=TxtEncoderCfg(vocab_size=64, width=16, layers=2, heads=2),
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    b = {
        "query_locs": rng.standard_normal((B, Q, 6)).astype(np.float32),
        "query_pad_masks": np.ones((B, Q), bool),
        "seg_center": rng.standard_normal((B, S, 6)).astype(np.float32),
        "seg_pad_masks": np.ones((B, S), bool),
        "coord_min": np.full((B, 3), -1, np.float32),
        "coord_max": np.full((B, 3), 1, np.float32),
        "mv_seg_fts": rng.standard_normal((B, S, 16)).astype(np.float32),
        "mv_seg_pad_masks": np.ones((B, S), bool),
        "pc_seg_fts": rng.standard_normal((B, S, 16)).astype(np.float32),
        "pc_seg_pad_masks": np.ones((B, S), bool),
        "voxel_seg_fts": rng.standard_normal((B, S, 8)).astype(np.float32),
        "voxel_seg_pad_masks": np.ones((B, S), bool),
        "prompt": rng.integers(0, 64, (B, L)).astype(np.float32),
        "prompt_pad_masks": np.ones((B, L), bool),
        "prompt_type": np.array([PROMPT_TXT, PROMPT_TXT, PROMPT_LOC,
                                 PROMPT_TXT]),
        "response": rng.integers(2, 64, (B, RESP)).astype(np.int32),
        "tgt_object_id": (np.arange(B) % Q).astype(np.int32),
    }
    # LOC prompt: the first 6 floats are a box
    b["prompt"][2, :6] = [0.1, 0.2, 0.3, 0.2, 0.2, 0.2]
    return jax.tree.map(jnp.asarray, b)


@pytest.fixture(scope="module")
def model_and_vars(batch):
    model = unified_model()
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    return model, variables


@pytest.mark.slow
def test_train_forward_and_losses(batch, model_and_vars):
    from pq3d_tpu.optim.losses import cross_entropy, generation_loss
    model, variables = model_and_vars

    def loss_fn(params):
        out = model.apply({"params": params, **{k: v for k, v in
                                                variables.items()
                                                if k != "params"}},
                          batch, train=True,
                          rngs={"dropout": jax.random.key(2)})
        lg = cross_entropy(out["ground_logits"], batch["tgt_object_id"])
        lgen = generation_loss(out, batch)
        return 10.0 * lg + lgen, (lg, lgen)

    (total, (lg, lgen)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert np.isfinite(float(total))
    assert float(lg) > 0 and float(lgen) > 0
    gnorms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert max(gnorms) > 0
    # frozen CLIP tower gets no grads
    tower = grads["txt_encoder"]["tower"]
    assert max(float(jnp.abs(g).max()) for g in jax.tree.leaves(tower)) == 0


def test_eval_generation_tokens(batch, model_and_vars):
    model, variables = model_and_vars
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    toks = np.asarray(out["generation_tokens"])
    assert toks.shape == (B, 5)
    assert toks.dtype == np.int32
    logits = np.asarray(out["ground_logits"])
    assert logits.shape == (B, Q)
    assert np.isfinite(logits).all()


def test_pointnet_backbone():
    from pq3d_tpu.models.pointnet import PointNetPP
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((3, 64, 6)).astype(np.float32)
    m = PointNetPP(sa_n_points=(8, 4, None), sa_n_samples=(8, 8, 8),
                   sa_radii=(0.5, 1.0, 100.0),
                   sa_mlps=((8, 16), (16, 32), (32, 24)))
    v = m.init(jax.random.key(0), jnp.asarray(pts))
    out, _ = jax.jit(lambda v, p: m.apply(v, p, mutable=["batch_stats"]))(
        v, jnp.asarray(pts))
    assert out.shape == (3, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_image_prompt_routing():
    """IMAGE prompts (BEYOND the reference, which declares PromptType.IMAGE
    but never implements it): rows of type 2 attend projected image tokens
    from batch['prompt_img_fts'], other rows are unaffected."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pq3d_tpu.config import Config
    from pq3d_tpu.data.unified_datasets import SyntheticRefer
    from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.models.query3d import (EncoderCfg, GroundHeadCfg,
                                         Query3DUnified, TxtEncoderCfg,
                                         UnifiedEncoderCfg)

    cfg = Config({"data": {"synthetic": {"num_train": 2, "n_points": 400,
                                         "n_instances": 4}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=8, num_points=32,
                                 prompt_len=10, response_len=4)
    loader = UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                               batch_size=2, train=False,
                               feature_dims={"mv": 32, "voxel": 16})
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader(0))).items()
             if not k.startswith("_")}
    rng = np.random.default_rng(0)
    batch["prompt_type"] = jnp.asarray([1, 2])      # TXT, IMAGE
    batch["prompt_img_fts"] = jnp.asarray(
        rng.standard_normal((2, 10, 24)).astype(np.float32))

    model = Query3DUnified(
        memories=("mv", "prompt"), heads=("ground",), hidden_size=32,
        dim_loc=6, use_offline_voxel_fts=True,
        skip_query_encoder_mask_pred=True, mask_head_cfg=None,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4, structure="mixed"),
        mv_enc=EncoderCfg(input_feat_size=32),
        ground_head_cfg=GroundHeadCfg(hidden_size=16),
        txt_cfg=TxtEncoderCfg(vocab_size=64, width=32, layers=1, heads=4))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    out = model.apply(variables, batch, train=False)
    g = np.asarray(out["ground_logits"])
    assert np.isfinite(g[np.asarray(batch["query_pad_masks"])]).all()
    # image features must matter for the IMAGE row only
    b2 = dict(batch)
    b2["prompt_img_fts"] = batch["prompt_img_fts"] + 1.0
    g2 = np.asarray(model.apply(variables, b2, train=False)["ground_logits"])
    qv = np.asarray(batch["query_pad_masks"])
    assert not np.allclose(g[1][qv[1]], g2[1][qv[1]])   # IMAGE row changes
    np.testing.assert_allclose(g[0][qv[0]], g2[0][qv[0]])  # TXT row stable


def test_sa_msg_single_scale_matches_sa():
    """PointnetSAModuleMSG with ONE scale == PointnetSAModule with the same
    (radius, nsample, mlp) — exact, given the shared-MLP params renamed."""
    import jax
    import jax.numpy as jnp
    from pq3d_tpu.models.pointnet import PointnetSAModule, PointnetSAModuleMSG
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 32, 5)).astype(np.float32))
    sa = PointnetSAModule(mlp=(16, 24), npoint=8, radius=0.8, nsample=8)
    v = sa.init(jax.random.key(0), xyz, feats)
    c_sa, f_sa = sa.apply(v, xyz, feats)
    msg = PointnetSAModuleMSG(mlps=((16, 24),), npoint=8, radii=(0.8,),
                              nsamples=(8,))
    v_msg = jax.tree.map(lambda x: x, v)  # copy
    v_msg = {"params": {"mlp0": v["params"]["mlp"]},
             "batch_stats": {"mlp0": v["batch_stats"]["mlp"]}}
    c_msg, f_msg = msg.apply(v_msg, xyz, feats)
    np.testing.assert_array_equal(np.asarray(c_sa), np.asarray(c_msg))
    np.testing.assert_allclose(np.asarray(f_sa), np.asarray(f_msg),
                               rtol=1e-6, atol=1e-6)


def test_sa_msg_multi_scale_shapes():
    import jax
    import jax.numpy as jnp
    from pq3d_tpu.models.pointnet import PointnetSAModuleMSG
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    msg = PointnetSAModuleMSG(mlps=((8, 16), (8, 24)), npoint=8,
                              radii=(0.4, 0.9), nsamples=(4, 8))
    v = msg.init(jax.random.key(0), xyz, None)
    c, f = msg.apply(v, xyz, None)
    assert c.shape == (2, 8, 3) and f.shape == (2, 8, 40)
    assert np.isfinite(np.asarray(f)).all()
