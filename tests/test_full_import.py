"""Full-model torch->JAX importer: reference-named state_dict tensors land
in the right flax leaves with the right transforms (ref trainer/build.py:
176-186 non-strict load; key names from the reference modules)."""
import numpy as np
import pytest

import jax

from pq3d_tpu.utils.hf_import import import_query3d


@pytest.fixture(scope="module")
def tiny_model():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_setup
    model, batch = _tiny_setup()
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False))
    # materialize shapes as zeros so we can compare values after import
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    return model, variables


MEMORIES = ("voxel", "mv", "pc")   # tiny instseg model memory order


def test_cross_attn_in_proj_split(tiny_model):
    _, variables = tiny_model
    h = variables["params"]["unified_encoder"]["layer0"]["cross_attns_mv"][
        "MultiHeadAttention_0"]["q_proj"]["kernel"].shape[0]
    rng = np.random.default_rng(0)
    in_proj = rng.standard_normal((3 * h, h)).astype(np.float32)
    in_bias = rng.standard_normal(3 * h).astype(np.float32)
    j = MEMORIES.index("mv")
    base = f"unified_encoder.layers.0.cross_attn_list.{j}.multihead_attn"
    sd = {f"{base}.in_proj_weight": in_proj,
          f"{base}.in_proj_bias": in_bias,
          f"{base}.out_proj.weight": rng.standard_normal((h, h)).astype(
              np.float32),
          f"{base}.out_proj.bias": np.zeros(h, np.float32)}
    new_vars, report = import_query3d(sd, variables, memories=MEMORIES)
    attn = new_vars["params"]["unified_encoder"]["layer0"]["cross_attns_mv"][
        "MultiHeadAttention_0"]
    np.testing.assert_allclose(attn["q_proj"]["kernel"], in_proj[:h].T)
    np.testing.assert_allclose(attn["k_proj"]["kernel"], in_proj[h:2 * h].T)
    np.testing.assert_allclose(attn["v_proj"]["kernel"], in_proj[2 * h:].T)
    np.testing.assert_allclose(attn["q_proj"]["bias"], in_bias[:h])
    np.testing.assert_allclose(attn["out_proj"]["kernel"],
                               sd[f"{base}.out_proj.weight"].T)
    assert not report["unused"]
    assert not report["mismatched"]


def test_ffn_spatial_and_mask_head(tiny_model):
    _, variables = tiny_model
    p = variables["params"]
    h = p["unified_encoder"]["layer0"]["ffn"]["Dense_0"]["kernel"].shape[0]
    ff = p["unified_encoder"]["layer0"]["ffn"]["Dense_0"]["kernel"].shape[1]
    rng = np.random.default_rng(1)
    sd = {
        "unified_encoder.layers.0.ffn.linear1.weight":
            rng.standard_normal((ff, h)).astype(np.float32),
        "unified_encoder.layers.0.ffn.linear1.bias":
            np.zeros(ff, np.float32),
        "unified_encoder.layers.0.self_attn.self_attn.w_qs.weight":
            rng.standard_normal((h, h)).astype(np.float32),
        "unified_encoder.layers.0.self_attn.self_attn.w_qs.bias":
            np.zeros(h, np.float32),
        "unified_encoder.layers.0.self_attn.norm.weight":
            np.full(h, 2.0, np.float32),
        "unified_encoder.layers.0.self_attn.norm.bias":
            np.zeros(h, np.float32),
    }
    ch = p["mask_head"]["cls_head"]["Dense_0"]["kernel"].shape
    sd["mask_head.cls_head.0.weight"] = rng.standard_normal(
        (ch[1], ch[0])).astype(np.float32)
    sd["mask_head.cls_head.0.bias"] = np.zeros(ch[1], np.float32)
    kp = p["mask_head"]["mask_pred_0"]["k_proj"]["kernel"].shape
    sd["mask_head.mask_pred_list.0.k_proj.weight"] = rng.standard_normal(
        (kp[1], kp[0])).astype(np.float32)

    new_vars, report = import_query3d(sd, variables, memories=MEMORIES)
    np.testing.assert_allclose(
        new_vars["params"]["unified_encoder"]["layer0"]["ffn"]["Dense_0"][
            "kernel"],
        sd["unified_encoder.layers.0.ffn.linear1.weight"].T)
    np.testing.assert_allclose(
        new_vars["params"]["unified_encoder"]["layer0"]["self_attn"][
            "MultiHeadAttentionSpatial_0"]["w_qs"]["kernel"],
        sd["unified_encoder.layers.0.self_attn.self_attn.w_qs.weight"].T)
    np.testing.assert_allclose(
        new_vars["params"]["unified_encoder"]["layer0"]["self_attn"][
            "LayerNorm_0"]["scale"], 2.0)
    np.testing.assert_allclose(
        new_vars["params"]["mask_head"]["cls_head"]["Dense_0"]["kernel"],
        sd["mask_head.cls_head.0.weight"].T)
    np.testing.assert_allclose(
        new_vars["params"]["mask_head"]["mask_pred_0"]["k_proj"]["kernel"],
        sd["mask_head.mask_pred_list.0.k_proj.weight"].T)
    assert not report["unused"]


def test_unet_backbone_and_bn_stats(tiny_model):
    _, variables = tiny_model
    p = variables["params"]["voxel_encoder"]["backbone"]
    rng = np.random.default_rng(2)
    k0 = p["conv0"]["kernel"].shape
    c = k0[2]
    sd = {
        "voxel_encoder.backbone.conv0p1s1.kernel":
            rng.standard_normal(k0).astype(np.float32),
        "voxel_encoder.backbone.bn0.weight": np.full(c, 3.0, np.float32),
        "voxel_encoder.backbone.bn0.bias": np.zeros(c, np.float32),
        "voxel_encoder.backbone.bn0.running_mean":
            np.full(c, 0.5, np.float32),
        "voxel_encoder.backbone.bn0.running_var":
            np.full(c, 4.0, np.float32),
    }
    new_vars, report = import_query3d(sd, variables, memories=MEMORIES)
    nb = new_vars["params"]["voxel_encoder"]["backbone"]
    np.testing.assert_allclose(
        nb["conv0"]["kernel"],
        sd["voxel_encoder.backbone.conv0p1s1.kernel"])
    np.testing.assert_allclose(nb["bn0"]["scale"], 3.0)
    bs = new_vars["batch_stats"]["voxel_encoder"]["backbone"]["bn0"]
    np.testing.assert_allclose(bs["mean"], 0.5)
    np.testing.assert_allclose(bs["var"], 4.0)
    assert not report["unused"]


def test_shape_mismatch_is_nonfatal(tiny_model):
    _, variables = tiny_model
    sd = {"unified_encoder.layers.0.ffn.linear1.weight":
          np.zeros((7, 7), np.float32),
          "unified_encoder.layers.0.ffn.linear1.bias":
          np.zeros(7, np.float32)}
    new_vars, report = import_query3d(sd, variables, memories=MEMORIES)
    assert report["mismatched"]          # recorded
    assert new_vars is not None          # and not fatal
