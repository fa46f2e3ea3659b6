"""Flat-packed serving layout (InstSegPipelineConfig.flat_pack): voxel
arrays are the concatenation of true per-scene rows instead of B x max
padding.  Outputs must be identical to the rectangular layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.query3d import (EncoderCfg, MaskHeadCfg, Query3DUnified,
                                     UnifiedEncoderCfg, VoxelEncoderCfg)

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")


def _scenes(rng, sizes=(700, 1000)):
    scenes = [synthetic.make_scene(rng, n_points=n, n_instances=3,
                                   n_segments=16) for n in sizes]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    return scenes


def _prep(b, S=32, feat=16):
    B = b["seg_pad_masks"].shape[0]
    r = np.random.default_rng(5)
    b["mv_seg_fts"] = r.standard_normal((B, S, feat)).astype(np.float32)
    b["mv_seg_pad_masks"] = b["seg_pad_masks"]
    b["pc_seg_fts"] = r.standard_normal((B, S, feat)).astype(np.float32)
    b["pc_seg_pad_masks"] = b["seg_pad_masks"]
    b = {k: v for k, v in b.items() if not k.startswith("_")}
    return jax.tree.map(jnp.asarray, b)


def _model(use_self_mask=True):
    return Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=32,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=True,
                                  use_self_mask=use_self_mask),
        mv_enc=EncoderCfg(input_feat_size=16),
        pc_enc=EncoderCfg(input_feat_size=16),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20),
        mask_head_cfg=MaskHeadCfg(num_targets=21,
                                  filter_out_classes=(0, 2)))


@pytest.mark.parametrize("stem", ["dense_block", "gather"])
def test_flat_pack_matches_rectangular(stem):
    rng = np.random.default_rng(0)
    scenes = _scenes(rng)
    kw = dict(voxel_size=0.15, num_queries=8, max_segments=32,
              max_instances=8, voxel_bucket=128, use_aug=False,
              stem_mode=stem)
    br = _prep(make_batch(scenes, InstSegPipelineConfig(**kw),
                          np.random.default_rng(1), train=False))
    bf = _prep(make_batch(scenes, InstSegPipelineConfig(flat_pack=True, **kw),
                          np.random.default_rng(1), train=False))
    # flat total strictly below B x max rectangular pad
    assert bf["maps"]["valid_0"].shape[0] < \
        np.prod(br["maps"]["valid_0"].shape)

    model = _model()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        br, train=False)
    out_r = model.apply(variables, br, train=False)
    out_f = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables,
                                                                 bf)
    for k in ("predictions_class", "predictions_mask"):
        a = np.asarray(out_r[k][-1])
        c = np.asarray(out_f[k][-1])
        ok = np.isfinite(a) & np.isfinite(c)
        np.testing.assert_allclose(c[ok], a[ok], atol=2e-5)


def test_flat_pack_gradients_match_rectangular(monkeypatch):
    """Training gradients agree between layouts (single device).

    Uses the DIRECT criterion (the Hungarian set loss is piecewise — noise
    can flip a near-tie assignment), use_self_mask=False (sigmoid<0.5
    threshold), and f32 conv compute: train-mode BN batch statistics make
    the two layouts' reductions run in different orders, and in bf16 that
    1-ulp noise flips roundings that cascade through 30 conv layers (eval
    mode with constant running stats matches EXACTLY — see
    test_flat_pack_matches_rectangular)."""
    import functools
    from pq3d_tpu.ops import sparse as sparse_ops
    from pq3d_tpu.optim.losses import instseg_direct_loss
    for fname in ("sparse_conv", "sparse_conv_sym", "sparse_conv_down",
                  "sparse_conv_transpose", "sparse_conv_transpose_gf",
                  "conv0_dense_block"):
        monkeypatch.setattr(
            sparse_ops, fname,
            functools.partial(getattr(sparse_ops, fname),
                              compute_dtype=jnp.float32))
    rng = np.random.default_rng(2)
    scenes = _scenes(rng)
    kw = dict(voxel_size=0.15, num_queries=8, max_segments=32,
              max_instances=8, voxel_bucket=128, use_aug=False,
              stem_mode="dense_block")
    br = _prep(make_batch(scenes, InstSegPipelineConfig(**kw),
                          np.random.default_rng(1), train=True))
    bf = _prep(make_batch(scenes, InstSegPipelineConfig(flat_pack=True, **kw),
                          np.random.default_rng(1), train=True))
    model = _model(use_self_mask=False)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        br, train=False)

    def loss(params, batch):
        out, _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(3)})
        total, _ = instseg_direct_loss(out["predictions_class"],
                                       out["predictions_mask"], batch)
        return total

    lr, gr = jax.value_and_grad(loss)(variables["params"], br)
    lf, gf = jax.value_and_grad(loss)(variables["params"], bf)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, c in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(c) / scale,
                                   np.asarray(a) / scale, atol=1e-4)


def test_flat_pack_swin_matches_rectangular():
    """flat_pack + swin_window (flat window packs in collate_flat) produces
    the same swin3d-backbone outputs as the rectangular layout."""
    rng = np.random.default_rng(0)
    scenes = _scenes(rng)
    kw = dict(voxel_size=0.15, num_queries=8, max_segments=32,
              max_instances=8, voxel_bucket=128, use_aug=False,
              stem_mode="none", swin_window=4)
    br = _prep(make_batch(scenes, InstSegPipelineConfig(**kw),
                          np.random.default_rng(1), train=False))
    bf = _prep(make_batch(scenes, InstSegPipelineConfig(flat_pack=True, **kw),
                          np.random.default_rng(1), train=False))
    assert bf["maps"]["win1s0_c2v"].ndim == 1

    model = Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=32,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        mv_enc=EncoderCfg(input_feat_size=16),
        pc_enc=EncoderCfg(input_feat_size=16),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20,
                                  backbone="swin3d"),
        mask_head_cfg=MaskHeadCfg(num_targets=21,
                                  filter_out_classes=(0, 2)))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        br, train=False)
    out_r = model.apply(variables, br, train=False)
    out_f = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables,
                                                                 bf)
    for k in ("predictions_class", "predictions_mask"):
        a = np.asarray(out_r[k][-1])
        c = np.asarray(out_f[k][-1])
        ok = np.isfinite(a) & np.isfinite(c)
        # the swin backbone stacks ~20 dense/attention matmuls whose f32
        # reduction tiling depends on the (layout-dependent) row count, so
        # rounding noise accumulates beyond the conv-only backbone's 2e-5
        np.testing.assert_allclose(c[ok], a[ok], atol=1e-3)


def test_compact_conv_matches_rectangular():
    """flat_pack + compact_conv (tap-compacted CSR convs) == rectangular."""
    rng = np.random.default_rng(0)
    scenes = _scenes(rng)
    kw = dict(voxel_size=0.15, num_queries=8, max_segments=32,
              max_instances=8, voxel_bucket=128, use_aug=False,
              stem_mode="dense_block")
    br = _prep(make_batch(scenes, InstSegPipelineConfig(**kw),
                          np.random.default_rng(1), train=False))
    bc = _prep(make_batch(scenes,
                          InstSegPipelineConfig(flat_pack=True,
                                                compact_conv=True, **kw),
                          np.random.default_rng(1), train=False))
    assert "cmp0_in" in bc["maps"]
    model = _model()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        br, train=False)
    out_r = model.apply(variables, br, train=False)
    out_c = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables,
                                                                 bc)
    for k in ("predictions_class", "predictions_mask"):
        a = np.asarray(out_r[k][-1])
        c = np.asarray(out_c[k][-1])
        ok = np.isfinite(a) & np.isfinite(c)
        # partial products are stored bf16 (the padded conv accumulates all
        # taps in f32 directly) -> bf16-rounding-level differences
        np.testing.assert_allclose(c[ok], a[ok], atol=5e-3)


def test_compact_scatter_free_training_step():
    """compact_conv + grad_mode='scatter_free' trains (the self-dual compact
    backward needs out_idx shipped through the maps)."""
    from pq3d_tpu.optim.losses import instseg_direct_loss
    rng = np.random.default_rng(4)
    scenes = _scenes(rng)
    kw = dict(voxel_size=0.15, num_queries=8, max_segments=32,
              max_instances=8, voxel_bucket=128, use_aug=False,
              stem_mode="dense_block")
    bc = _prep(make_batch(scenes,
                          InstSegPipelineConfig(flat_pack=True,
                                                compact_conv=True, **kw),
                          np.random.default_rng(1), train=True))
    model = Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=32,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        mv_enc=EncoderCfg(input_feat_size=16),
        pc_enc=EncoderCfg(input_feat_size=16),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20,
                                  grad_mode="scatter_free",
                                  remat_policy="none"),
        mask_head_cfg=MaskHeadCfg(num_targets=21,
                                  filter_out_classes=(0, 2)))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        bc, train=False)

    def loss(params):
        out, _ = model.apply({**variables, "params": params}, bc, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(3)})
        total, _ = instseg_direct_loss(out["predictions_class"],
                                       out["predictions_mask"], bc)
        return total

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
