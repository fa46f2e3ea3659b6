"""On-device hierarchy builder (ops/device_maps) vs the host engine.

Pins build_device_hierarchy bit-for-bit against kernel_maps.build_hierarchy
— the contract the serving transfer-killer path relies on (ship ~0.8 MB of
coords instead of 60-100 MB of int32 maps; see serve.InstSegServer
device_maps mode).  The round-3 advisor found the shifted-compare dedup
produced duplicate coarse voxels (row-major keys don't keep parent keys
sorted); these tests would have caught it.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pq3d_tpu.ops import device_maps, kernel_maps


def _scene_coords(rng, extent=40, n_pts=3000, offset=(0, 0, 0)):
    """Random unique voxel coords, lexicographically sorted (the order
    voxelize.quantize produces)."""
    coords = np.unique(rng.integers(0, extent, (n_pts, 3)).astype(np.int32),
                       axis=0) + np.asarray(offset, np.int32)
    key = ((coords[:, 0].astype(np.int64) + 2048) * 8192
           + coords[:, 1] + 2048) * 8192 + coords[:, 2] + 2048
    return coords[np.argsort(key)]


def _caps_for(coords, bucket=64, build_nbr5=True, conv0_kernel=5):
    host = kernel_maps.build_hierarchy(coords, bucket=bucket,
                                       build_nbr5=build_nbr5,
                                       conv0_kernel=conv0_kernel)
    return host, list(host.pad_sizes)


def _compare(host: kernel_maps.SparseHierarchy, dev, caps,
             build_nbr5=True):
    got = {k: np.asarray(v) for k, v in dev.items()}
    want = host.device_arrays()
    for l in range(kernel_maps.NUM_LEVELS):
        assert got[f"n_{l}"] == host.num_voxels[l], l
        np.testing.assert_array_equal(got[f"valid_{l}"], want[f"valid_{l}"],
                                      err_msg=f"valid_{l}")
        np.testing.assert_array_equal(got[f"nbr3_{l}"], want[f"nbr3_{l}"],
                                      err_msg=f"nbr3_{l}")
        np.testing.assert_array_equal(got[f"coords_{l}"], host.coords[l],
                                      err_msg=f"coords_{l}")
    for l in range(kernel_maps.NUM_LEVELS - 1):
        np.testing.assert_array_equal(got[f"parent_{l}"], want[f"parent_{l}"],
                                      err_msg=f"parent_{l}")
        np.testing.assert_array_equal(got[f"parent_off_{l}"],
                                      want[f"parent_off_{l}"],
                                      err_msg=f"parent_off_{l}")
        np.testing.assert_array_equal(got[f"child_{l}"], want[f"child_{l}"],
                                      err_msg=f"child_{l}")
    np.testing.assert_array_equal(got["ancestor"], want["ancestor"])
    if build_nbr5:
        np.testing.assert_array_equal(got["nbr5_0"], want["nbr5_0"])


def test_device_hierarchy_matches_host(rng):
    coords = _scene_coords(rng)
    host, caps = _caps_for(coords)
    c0 = kernel_maps.pad_rows(coords, caps[0])
    dev = jax.jit(
        lambda c, n: device_maps.build_device_hierarchy(
            c, n, tuple(caps)))(jnp.asarray(c0), jnp.int32(len(coords)))
    _compare(host, dev, caps)


def test_device_hierarchy_no_duplicate_coarse_coords(rng):
    """The advisor's repro class: coarse levels must be duplicate-free and
    key-sorted (shifted-compare dedup on row-major keys produced 3 dup
    coords and unsorted coarse keys at level 1)."""
    coords = _scene_coords(rng, extent=16, n_pts=2500)  # dense -> collisions
    host, caps = _caps_for(coords, build_nbr5=False)
    c0 = kernel_maps.pad_rows(coords, caps[0])
    dev = device_maps.build_device_hierarchy(
        jnp.asarray(c0), jnp.int32(len(coords)), tuple(caps),
        build_nbr5=False)
    for l in range(1, kernel_maps.NUM_LEVELS):
        n_l = int(dev[f"n_{l}"])
        cl = np.asarray(dev[f"coords_{l}"])[:n_l]
        assert len(np.unique(cl, axis=0)) == n_l, f"dup coords at level {l}"
        key = (cl[:, 0].astype(np.int64) * 8192 + cl[:, 1]) * 8192 + cl[:, 2]
        assert (np.diff(key) > 0).all(), f"coarse keys unsorted at level {l}"
        assert n_l == host.num_voxels[l]
    _compare(host, dev, caps, build_nbr5=False)


def test_device_hierarchy_negative_origin_bias(rng):
    """Scenes with negative coords (quantize of centered points) go through
    the 16-aligned bias helper; the resulting INDEX arrays must equal the
    host build on the original coords (maps are translation-invariant for
    16-aligned shifts — floor-div grouping is preserved through 4 stride-2
    levels)."""
    coords = _scene_coords(rng, extent=36, n_pts=2000, offset=(-23, -5, -41))
    host, caps = _caps_for(coords, build_nbr5=False)
    biased, base = device_maps.bias_coords_16(coords)
    assert (biased >= 0).all() and (base % 16 == 0).all()
    c0 = kernel_maps.pad_rows(biased, caps[0])
    dev = device_maps.build_device_hierarchy(
        jnp.asarray(c0), jnp.int32(len(coords)), tuple(caps),
        build_nbr5=False)
    got = {k: np.asarray(v) for k, v in dev.items()}
    want = host.device_arrays()
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_device_hierarchy_vmap_batch(rng):
    """vmapped over a batch with different true counts (the serving shape)."""
    a = _scene_coords(rng, extent=30, n_pts=1800)
    b = _scene_coords(rng, extent=44, n_pts=2600)
    host_a, caps_a = _caps_for(a, build_nbr5=False)
    host_b, caps_b = _caps_for(b, build_nbr5=False)
    caps = [max(x, y) for x, y in zip(caps_a, caps_b)]
    c0 = np.stack([kernel_maps.pad_rows(a, caps[0]),
                   kernel_maps.pad_rows(b, caps[0])])
    n0 = np.array([len(a), len(b)], np.int32)
    fn = jax.jit(jax.vmap(lambda c, n: device_maps.build_device_hierarchy(
        c, n, tuple(caps), build_nbr5=False)))
    dev = fn(jnp.asarray(c0), jnp.asarray(n0))
    for i, coords in enumerate((a, b)):
        host = kernel_maps.build_hierarchy(coords, pad_sizes=caps,
                                           build_nbr5=False)
        _compare(host, {k: v[i] for k, v in dev.items()}, caps,
                 build_nbr5=False)


def _instseg_model(device_caps=None, ztriple=False):
    from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                         MaskHeadCfg, VoxelEncoderCfg)
    return Query3DUnified(
        memories=("voxel",), heads=("mask",), hidden_size=32, dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        voxel_enc=VoxelEncoderCfg(
            hlevels=(0, 1), out_channels=20,
            device_maps=tuple(device_caps) if device_caps else None,
            device_ztriple=ztriple),
        mask_head_cfg=MaskHeadCfg(num_targets=21, filter_out_classes=(0,)))


@pytest.mark.parametrize("ztriple", [False, True])
def test_full_model_device_maps_matches_host(rng, ztriple):
    """End-to-end: Query3DUnified forward from device-built maps (batch
    ships only vox_coords/n_voxels) == the same forward from host-built
    maps — the contract serve.InstSegServer's device_maps mode rests on."""
    import dataclasses
    from pq3d_tpu.data import synthetic
    from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig,
                                                make_batch)
    np_rng = np.random.default_rng(3)
    scenes = [synthetic.make_scene(np_rng, n_points=700, n_instances=4,
                                   n_segments=20) for _ in range(2)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    host_cfg = InstSegPipelineConfig(
        voxel_size=0.15, num_queries=8, max_segments=32, max_instances=8,
        voxel_bucket=256, use_aug=False, stem_mode="dense_block",
        ztriple_conv=ztriple, level_caps=(512, 256, 128, 64, 64))
    dev_cfg = dataclasses.replace(host_cfg, device_maps=True,
                                  ztriple_conv=False)
    host_batch = make_batch([dict(s) for s in scenes], host_cfg, np_rng,
                            train=False)
    dev_batch = make_batch([dict(s) for s in scenes], dev_cfg, np_rng,
                           train=False)
    assert "vox_coords" in dev_batch and not dev_batch["maps"]
    # the device batch ships no maps: its voxel payload is coords + feats
    to_dev = lambda b: jax.tree.map(
        jnp.asarray, {k: v for k, v in b.items() if not k.startswith("_")})
    host_batch, dev_batch = to_dev(host_batch), to_dev(dev_batch)

    host_model = _instseg_model()
    dev_model = _instseg_model(device_caps=host_cfg.level_caps,
                               ztriple=ztriple)
    variables = jax.jit(host_model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        host_batch, train=False)
    want = host_model.apply(variables, host_batch, train=False)
    got = jax.jit(lambda v, b: dev_model.apply(v, b, train=False))(
        variables, dev_batch)
    np.testing.assert_allclose(np.asarray(got["predictions_class"][-1]),
                               np.asarray(want["predictions_class"][-1]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["predictions_mask"][-1]),
                               np.asarray(want["predictions_mask"][-1]),
                               atol=1e-5, rtol=1e-5)


def test_device_stem_pack_matches_host(rng):
    """Device dense-block stem pack vs window_maps.build_window_pack."""
    from pq3d_tpu.ops import window_maps
    coords = _scene_coords(rng, extent=40, n_pts=3000)
    host, caps = _caps_for(coords, build_nbr5=False)
    pack = window_maps.build_window_pack(coords, 8, 0, with_neighbors=True)
    nb_cap = -(-int(pack["n_win"]) // 64) * 64
    c0 = kernel_maps.pad_rows(coords, caps[0])
    dev = device_maps.build_device_stem_pack(
        jnp.asarray(c0), jnp.int32(len(coords)), caps[0], nb_cap, block=8)
    got = {k: np.asarray(v) for k, v in dev.items()}
    assert got["n_win"] == pack["n_win"]
    nw = int(pack["n_win"])
    np.testing.assert_array_equal(got["vox_slot"][:len(coords)],
                                  pack["vox_slot"])
    np.testing.assert_array_equal(got["nbr_win"][:nw], pack["nbr_win"])
    np.testing.assert_array_equal(
        got["cell_to_vox"][:nw * 512], pack["cell_to_vox"])
    # pad region: slots -1 / cells -1
    assert (got["vox_slot"][len(coords):] == -1).all()
    assert (got["cell_to_vox"][nw * 512:] == -1).all()
