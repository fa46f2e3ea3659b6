"""Flat-object layout (UnifiedPipelineConfig.flat_obj): the pc memory ships
as concatenated real object clouds (F, P, 6) + a (B, O) slot map, and
PointNet++ runs only on real objects.  Must be equivalent to the padded
(B, O, P, 6) layout at every valid position (BN eval mode is per-object)."""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.config import Config
from pq3d_tpu.data.unified_datasets import SyntheticRefer
from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
import pytest


def _loaders(flat):
    cfg = Config({"data": {"synthetic": {"num_train": 4, "n_points": 400,
                                         "n_instances": 4}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=8, num_points=32,
                                 prompt_len=10, response_len=4,
                                 flat_obj=flat, flat_obj_bucket=4)
    return UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                             batch_size=2, train=False,
                             feature_dims={"mv": 16})


def _first_batch(loader):
    return {k: v for k, v in next(iter(loader(0))).items()
            if not k.startswith("_")}


def test_collate_flat_obj_matches_padded():
    pad = _first_batch(_loaders(False))
    flat = _first_batch(_loaders(True))
    assert "obj_fts" not in flat and "pc_seg_fts" not in flat
    F = flat["pc_obj_flat"].shape[0]
    assert F % 4 == 0
    slot = flat["pc_flat_slot"]
    valid = pad["seg_pad_masks"]
    # real slots point below F, pads at the zero row F
    assert (slot[valid] < F).all() and (slot[~valid] == F).all()
    # gathering the flat rows reconstructs the padded block
    flat_plus = np.concatenate([flat["pc_obj_flat"],
                                np.zeros_like(flat["pc_obj_flat"][:1])], 0)
    np.testing.assert_array_equal(flat_plus[slot], pad["pc_seg_fts"])
    # everything else is identical
    np.testing.assert_array_equal(pad["query_locs"], flat["query_locs"])
    np.testing.assert_array_equal(pad["mv_seg_fts"], flat["mv_seg_fts"])


@pytest.mark.slow
def test_object_encoder_flat_equivalence():
    """Frozen-backbone ObjectEncoder: flat layout == padded layout exactly
    (BN runs in eval mode, so per-object features are independent)."""
    from pq3d_tpu.models.encoders import ObjectEncoder
    rng = np.random.default_rng(0)
    B, O, P = 2, 5, 32
    pts = rng.standard_normal((B, O, P, 6)).astype(np.float32)
    valid = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 0]], bool)
    n = valid.sum()
    flat = pts[valid]                                   # (n, P, 6)
    slot = np.full((B, O), n, np.int32)
    slot[valid] = np.arange(n)

    enc = ObjectEncoder(hidden_size=16, input_feat_size=768,
                        backbone="pointnet++", freeze_backbone=True,
                        dropout=0.0)
    variables = enc.init(jax.random.key(0), jnp.asarray(pts))
    out_pad = enc.apply(variables, jnp.asarray(pts))
    out_flat = enc.apply(variables, jnp.asarray(flat),
                         flat_slot=jnp.asarray(slot))
    np.testing.assert_allclose(np.asarray(out_flat)[valid],
                               np.asarray(out_pad)[valid],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_model_flat_obj_equivalence():
    """Query3DUnified consumes pc_obj_flat/pc_flat_slot and reproduces the
    padded path's ground logits at valid queries."""
    from pq3d_tpu.models.query3d import (EncoderCfg, GroundHeadCfg,
                                         Query3DUnified, TxtEncoderCfg,
                                         UnifiedEncoderCfg)
    pad = {k: jnp.asarray(v)
           for k, v in _first_batch(_loaders(False)).items()}
    flat = {k: jnp.asarray(v)
            for k, v in _first_batch(_loaders(True)).items()}
    model = Query3DUnified(
        memories=("pc", "prompt"), heads=("ground",), hidden_size=32,
        dim_loc=6, use_offline_voxel_fts=True,
        skip_query_encoder_mask_pred=True, mask_head_cfg=None,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4, structure="mixed"),
        pc_enc=EncoderCfg(input_feat_size=768, backbone="pointnet++",
                          freeze_backbone=True),
        ground_head_cfg=GroundHeadCfg(hidden_size=16),
        txt_cfg=TxtEncoderCfg(vocab_size=64, width=32, layers=1, heads=4))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        pad, train=False)
    g_pad = np.asarray(model.apply(variables, pad,
                                   train=False)["ground_logits"])
    g_flat = np.asarray(model.apply(variables, flat,
                                    train=False)["ground_logits"])
    qv = np.asarray(pad["query_pad_masks"])
    np.testing.assert_allclose(g_flat[qv], g_pad[qv], rtol=1e-4, atol=1e-4)
