"""Swin3D window-attention backbone: pack correctness, masking invariance,
and the SegVoxelEncoder integration (reference counterpart:
modules/vision/pcd_mask3d_encoder.py:65-112, whose Swin3DUNet backbone is an
external dep the reference does not vendor)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.swin3d import Swin3DUNet, WindowAttention
from pq3d_tpu.ops import window_maps

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")


def _coords(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 40, (n, 3))
    return np.unique(pts, axis=0).astype(np.int32)


def test_window_pack_roundtrip():
    coords = _coords()
    for shift in (0, 2):
        p = window_maps.build_window_pack(coords, window=4, shift=shift)
        c2v, slot = p["cell_to_vox"], p["vox_slot"]
        n = len(coords)
        # every voxel occupies exactly one cell, and the maps invert
        assert len(np.unique(slot)) == n
        assert (c2v[slot] == np.arange(n)).all()
        occupied = c2v[c2v >= 0]
        assert sorted(occupied) == list(range(n))
        # cells of one window hold voxels of one spatial window
        w = 4
        for win in range(min(p["n_win"], 5)):
            cells = c2v[win * w**3:(win + 1) * w**3]
            vox = cells[cells >= 0]
            wc = (coords[vox] + shift) // w
            assert (wc == wc[0]).all()


def test_window_pack_pad():
    coords = _coords(100)
    p = window_maps.build_window_pack(coords, window=4)
    pp = window_maps.pad_pack(p, 4, p["n_win"] + 3, len(coords) + 7)
    assert (pp["cell_to_vox"][p["n_win"] * 64:] == -1).all()
    assert (pp["vox_slot"][len(coords):] == -1).all()
    assert (pp["vox_slot"][:len(coords)] == p["vox_slot"]).all()


def test_relative_position_index():
    ri = window_maps.relative_position_index(4)
    assert ri.shape == (64, 64)
    assert ri.min() >= 0 and ri.max() < 7 ** 3
    # symmetry: rel(a, b) and rel(b, a) are mirrored offsets
    assert ri[0, 63] + ri[63, 0] == 2 * ri[0, 0]


def test_window_attention_matches_manual_math():
    """Module output == manual numpy attention with the same params, and
    masked-cell VALUES never leak into occupied-cell outputs."""
    rng = np.random.default_rng(1)
    w3, c, h = 27, 32, 4
    x = rng.standard_normal((2, w3, c)).astype(np.float32)
    occ = np.ones((2, w3), bool)
    occ[0, 10:] = False
    attn = WindowAttention(dim=c, num_heads=h, window=3)
    vars_ = attn.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(occ))
    out = np.asarray(attn.apply(vars_, jnp.asarray(x), jnp.asarray(occ)))

    p = jax.tree.map(np.asarray, vars_["params"])
    qkv = x @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    qkv = qkv.reshape(2, w3, 3, h, c // h)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (2, w3, h, hd)
    ri = window_maps.relative_position_index(3)
    bias = p["rel_bias"][ri]                            # (w3, w3, h)
    # full manual forward (vectorized) for exact comparison
    logits = np.einsum("nqhd,nkhd->nhqk", q * (c // h) ** -0.5, k) \
        + bias.transpose(2, 0, 1)[None]
    logits = np.where(occ[:, None, None, :], logits, -1e9)
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    o = np.einsum("nhqk,nkhd->nqhd", a, v).reshape(2, w3, c)
    ref = o @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # masked-value leakage: perturb masked cells, occupied outputs unchanged
    x2 = x.copy()
    x2[~occ] += 50.0
    out2 = np.asarray(attn.apply(vars_, jnp.asarray(x2), jnp.asarray(occ)))
    np.testing.assert_allclose(out[occ], out2[occ], rtol=1e-4, atol=1e-5)


def _tiny_batch(batch_size=2, swin_window=4):
    rng = np.random.default_rng(0)
    cfg = InstSegPipelineConfig(
        voxel_size=0.15, num_queries=8, max_segments=32, max_instances=8,
        voxel_bucket=256, use_aug=False, swin_window=swin_window)
    scenes = [synthetic.make_scene(rng, n_points=600, n_instances=3,
                                   n_segments=12) for _ in range(batch_size)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    return make_batch(scenes, cfg, rng, train=False)


def test_swin3d_unet_forward_and_padding_invariance():
    batch = _tiny_batch()
    maps = jax.tree.map(jnp.asarray, batch["maps"])
    x = jnp.asarray(batch["voxel_feats"])
    model = Swin3DUNet(out_channels=20, channels=(8, 16, 24, 32),
                       depths=(1, 1, 2, 1), num_heads=(2, 2, 2, 2),
                       stem_dim=8)
    variables = model.init(jax.random.key(0), x, maps, train=False)
    final, fmaps = jax.jit(
        lambda v, x, m: model.apply(v, x, m, train=False))(variables, x, maps)
    b, p0 = batch["maps"]["valid_0"].shape
    assert final.shape == (b, p0, 20)
    assert len(fmaps) == 5
    assert np.isfinite(np.asarray(final)).all()
    # padded voxel rows must not affect valid outputs
    x2 = x + 100.0 * (~jnp.asarray(batch["maps"]["valid_0"]))[..., None]
    final2, _ = jax.jit(
        lambda v, x, m: model.apply(v, x, m, train=False))(variables, x2, maps)
    v0 = np.asarray(batch["maps"]["valid_0"])
    np.testing.assert_allclose(np.asarray(final)[v0], np.asarray(final2)[v0],
                               rtol=2e-3, atol=2e-4)


def test_swin3d_in_seg_encoder():
    from pq3d_tpu.models.encoders import SegVoxelEncoder
    batch = _tiny_batch()
    maps = jax.tree.map(jnp.asarray, batch["maps"])
    x = jnp.asarray(batch["voxel_feats"])
    v2s = jnp.asarray(batch["voxel2segment"])
    enc = SegVoxelEncoder(hidden_size=32, hlevels=(0, 1),
                          backbone_out_channels=20, backbone="swin3d")
    variables = enc.init(jax.random.key(0), x, maps, v2s, 32)
    outs = enc.apply(variables, x, maps, v2s, 32)
    assert len(outs) == 3  # hlevels + final
    for o in outs:
        assert o.shape[:2] == (2, 32) and o.shape[2] == 32
        assert np.isfinite(np.asarray(o)).all()


def test_swin3d_gradients_flow():
    batch = _tiny_batch()
    maps = jax.tree.map(jnp.asarray, batch["maps"])
    x = jnp.asarray(batch["voxel_feats"])
    model = Swin3DUNet(out_channels=8, channels=(8, 8, 8, 8),
                       depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                       stem_dim=8)
    variables = model.init(jax.random.key(0), x, maps, train=True)

    def loss(params):
        out, _ = model.apply({**variables, "params": params}, x, maps,
                             train=True, mutable=["batch_stats"])[0], None
        return jnp.sum(out[0] ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # attention params get nonzero grads
    gsum = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert gsum > 0


def test_window_pack_negative_coords():
    """The ravel key must stay injective for negative voxel coords
    (mean-centered/augmented scenes): distinct windows once collided and
    silently overwrote cells."""
    from pq3d_tpu.ops import window_maps
    # exact repro of the collision: different windows, same old key
    p = window_maps.build_window_pack(
        np.array([[0, -1, 0], [-8, 7, 0]], np.int32), 8, 0)
    assert p["n_win"] == 2
    assert len(set(p["vox_slot"].tolist())) == 2

    # dense random cloud spanning negative coords: every voxel gets its own
    # cell and the pack round-trips
    rng = np.random.default_rng(0)
    coords = np.unique(rng.integers(-50, 50, size=(5000, 3)), axis=0)
    for shift in (0, 4):
        p = window_maps.build_window_pack(coords.astype(np.int32), 8, shift,
                                          with_neighbors=True)
        slots = p["vox_slot"]
        assert len(np.unique(slots)) == len(coords)          # injective
        back = p["cell_to_vox"][slots]
        np.testing.assert_array_equal(back, np.arange(len(coords)))
        # translation invariance: shifting the cloud by a window multiple
        # must not change the partition structure
        q = window_maps.build_window_pack(
            (coords - 8 * 13).astype(np.int32), 8, shift,
            with_neighbors=True)
        assert q["n_win"] == p["n_win"]
        np.testing.assert_array_equal(q["vox_slot"], p["vox_slot"])
        np.testing.assert_array_equal(q["nbr_win"], p["nbr_win"])
