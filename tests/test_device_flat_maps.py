"""On-device FLAT map builder (ops/device_flat_maps) vs collate_flat.

Pins build_flat_maps bit-for-bit against the host flat collate — the
contract that lets serving compose the device-maps transfer win with the
flat_swin compute win (VERDICT r04 weak #4).  The level>=3 swin-pack
mismatch under a 16-aligned coord bias (window grouping needs
window*2^l | base — fixed by swin_bias_align) is exactly the class of bug
these tests exist to catch.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig,
                                            collate_flat, make_batch,
                                            process_scene)
from pq3d_tpu.ops import device_flat_maps as dfm
from pq3d_tpu.ops import device_maps as dm


def _processed(cfg, n_scenes=3, n_points=2500, seed0=0):
    rng = np.random.default_rng(0)
    scenes = [synthetic.make_scene(np.random.default_rng(seed0 + s),
                                   n_points=n_points, n_instances=5,
                                   n_segments=24) for s in range(n_scenes)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 199)
    return [process_scene(s, cfg, rng, train=False) for s in scenes]


def _device_inputs(processed, maps, cfg):
    """(flat biased coords, counts, flat feats, caps-from-host-shapes)."""
    tot0 = maps["valid_0"].shape[0]
    counts = np.array([len(p["vox_coords"]) for p in processed], np.int32)
    coords = np.zeros((tot0, 3), np.int32)
    cin = processed[0]["voxel_feats"].shape[1]
    feats = np.zeros((tot0, cin), np.float32)
    align = dm.swin_bias_align(cfg.swin_window)
    r = 0
    for p in processed:
        bi, _ = dm.bias_coords_16(p["vox_coords"], align=align)
        coords[r:r + len(bi)] = bi
        feats[r:r + len(bi)] = p["voxel_feats"]
        r += len(bi)
    caps = {}
    for l in range(5):
        caps[f"tot_{l}"] = maps[f"valid_{l}"].shape[0]
        caps[f"rect_{l}"] = maps[f"rect_{l}"].shape[1]
    if cfg.swin_window:
        w3 = cfg.swin_window ** 3
        for l in (1, 2, 3, 4):
            for j in (0, 1):
                caps[f"win{l}s{j}_nw"] = \
                    maps[f"win{l}s{j}_c2v"].shape[0] // w3
    if cfg.stem_mode == "dense_block":
        caps["stem_nb"] = maps["stem_nbrblk"].shape[0]
    return coords, counts, feats, caps


def _assert_maps_equal(host_maps, dev, skip=()):
    dev = {k: np.asarray(v) for k, v in dev.items()}
    for k in sorted(dev):
        if k in skip:
            continue
        assert k in host_maps, f"device-only key {k}"
        h = np.asarray(host_maps[k])
        assert h.shape == dev[k].shape, (k, h.shape, dev[k].shape)
        np.testing.assert_array_equal(dev[k], h.astype(dev[k].dtype),
                                      err_msg=k)
    missing = [k for k in host_maps if k not in dev and k not in skip]
    assert not missing, f"host-only keys {missing}"


def test_flat_maps_bit_parity_swin():
    """flat_swin configuration: hierarchy + all 8 window packs bit-exact."""
    cfg = InstSegPipelineConfig(voxel_size=0.1, num_queries=16,
                                max_segments=64, max_instances=16,
                                voxel_bucket=256, use_aug=False,
                                stem_mode="none", flat_pack=True,
                                swin_window=4)
    processed = _processed(cfg)
    host = collate_flat(processed, cfg)
    coords, counts, feats, caps = _device_inputs(processed, host["maps"],
                                                 cfg)
    dev = jax.jit(lambda c, n: dfm.build_flat_maps(
        c, n, caps, swin_window=4, stem_mode="none"))(
        jnp.asarray(coords), jnp.asarray(counts))
    _assert_maps_equal(host["maps"], dev)


def test_flat_maps_bit_parity_dense_stem():
    """res16unet flat configuration: dense-block stem pack bit-exact
    (stem_dense feature blocks included)."""
    cfg = InstSegPipelineConfig(voxel_size=0.1, num_queries=16,
                                max_segments=64, max_instances=16,
                                voxel_bucket=256, use_aug=False,
                                stem_mode="dense_block", flat_pack=True)
    processed = _processed(cfg)
    host = collate_flat(processed, cfg)
    coords, counts, feats, caps = _device_inputs(processed, host["maps"],
                                                 cfg)
    dev = jax.jit(lambda c, n, f: dfm.build_flat_maps(
        c, n, caps, stem_mode="dense_block", voxel_feats=f))(
        jnp.asarray(coords), jnp.asarray(counts), jnp.asarray(feats))
    # stem_dense is float data scattered by the (bit-checked) stem_slot
    d = {k: v for k, v in dev.items()}
    sd = np.asarray(d.pop("stem_dense"))
    _assert_maps_equal(host["maps"], d, skip=("stem_dense",))
    np.testing.assert_allclose(sd, host["maps"]["stem_dense"], atol=0)


def test_flat_maps_true_dims_check():
    """_flat_device_true_dims reproduces collate_flat's recorded flat_dims
    (the host-side overflow guard must agree with what the device would
    actually build)."""
    from pq3d_tpu.data.instseg_pipeline import _flat_device_true_dims
    cfg = InstSegPipelineConfig(voxel_size=0.1, num_queries=16,
                                max_segments=64, max_instances=16,
                                voxel_bucket=256, use_aug=False,
                                stem_mode="none", flat_pack=True,
                                swin_window=4)
    processed = _processed(cfg)
    host = collate_flat(processed, cfg)
    align = dm.swin_bias_align(cfg.swin_window)
    biased = [dm.bias_coords_16(p["vox_coords"], align=align)[0]
              for p in processed]
    got = _flat_device_true_dims(biased, cfg)
    recorded = host["_meta"]["flat_dims"]
    for k, v in recorded.items():
        # collate_flat records BUCKETED dims (window_maps.bucket); the
        # guard computes true counts — truth must never exceed recorded
        assert got[k] <= v, (k, got[k], v)
    # true voxel totals and window counts, independently recomputed from
    # the per-scene hierarchies / window packs, are exact
    from pq3d_tpu.ops import window_maps
    for l in range(5):
        want_tot = sum(p["hierarchy"].num_voxels[l] for p in processed)
        assert got[f"tot_{l}"] == want_tot, (l, got[f"tot_{l}"], want_tot)
    for l in (1, 2, 3, 4):
        for j, sh in enumerate((0, 2)):
            want_nw = sum(window_maps.build_window_pack(
                p["hierarchy"].coords[l][:p["hierarchy"].num_voxels[l]],
                4, sh)["n_win"] for p in processed)
            assert got[f"win{l}s{j}_nw"] == want_nw, (l, j)


def test_full_model_flat_device_matches_host():
    """End-to-end flat_swin: Query3DUnified forward from device-built flat
    maps (batch ships only flat coords + counts + feats) == the host-maps
    forward — the serving composition contract."""
    from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                         MaskHeadCfg, VoxelEncoderCfg,
                                         EncoderCfg)
    kw = dict(voxel_size=0.15, num_queries=8, max_segments=32,
              max_instances=8, voxel_bucket=128, use_aug=False,
              stem_mode="none", swin_window=4, flat_pack=True)
    host_cfg = InstSegPipelineConfig(**kw)
    rng = np.random.default_rng(1)
    scenes = [synthetic.make_scene(np.random.default_rng(7 + s),
                                   n_points=700, n_instances=4,
                                   n_segments=20) for s in range(2)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    host_batch = make_batch([dict(s) for s in scenes], host_cfg,
                            np.random.default_rng(1), train=False)
    # lock = the host batch's exact shapes -> identical device shapes
    from pq3d_tpu.data.instseg_pipeline import process_scene as _ps
    processed = [_ps(dict(s), host_cfg, np.random.default_rng(1),
                     train=False) for s in scenes]
    _, _, _, caps = _device_inputs(processed, host_batch["maps"], host_cfg)
    dev_cfg = dataclasses.replace(host_cfg, device_maps=True,
                                  flat_shape_caps=caps)
    dev_batch = make_batch([dict(s) for s in scenes], dev_cfg,
                           np.random.default_rng(1), train=False)
    assert dev_batch["vox_coords"].ndim == 2
    assert not dev_batch["maps"]

    def _prep(b):
        S = host_cfg.max_segments
        bsz = len(scenes)
        r = np.random.default_rng(5)
        b["mv_seg_fts"] = r.standard_normal((bsz, S, 16)).astype(np.float32)
        b["mv_seg_pad_masks"] = b["seg_pad_masks"]
        b["pc_seg_fts"] = r.standard_normal((bsz, S, 16)).astype(np.float32)
        b["pc_seg_pad_masks"] = b["seg_pad_masks"]
        return jax.tree.map(jnp.asarray,
                            {k: v for k, v in b.items()
                             if not k.startswith("_")})

    host_batch, dev_batch = _prep(host_batch), _prep(dev_batch)

    def _model(flat_caps=None):
        return Query3DUnified(
            memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=32,
            dim_loc=3,
            unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                      num_attention_heads=4,
                                      structure="parallel",
                                      spatial_selfattn=True,
                                      use_self_mask=True),
            mv_enc=EncoderCfg(input_feat_size=16),
            pc_enc=EncoderCfg(input_feat_size=16),
            voxel_enc=VoxelEncoderCfg(
                hlevels=(0, 1), out_channels=20, backbone="swin3d",
                device_flat_caps=flat_caps),
            mask_head_cfg=MaskHeadCfg(num_targets=21,
                                      filter_out_classes=(0, 2)))

    host_model = _model()
    dev_model = _model(flat_caps=tuple(sorted(caps.items())))
    variables = host_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        host_batch, train=False)
    want = host_model.apply(variables, host_batch, train=False)
    got = jax.jit(lambda v, b: dev_model.apply(v, b, train=False))(
        variables, dev_batch)
    for k in ("predictions_class", "predictions_mask"):
        a = np.asarray(want[k][-1])
        c = np.asarray(got[k][-1])
        ok = np.isfinite(a) & np.isfinite(c)
        # same tolerance rationale as test_flat_pack's swin equivalence:
        # ~20 stacked matmuls with layout-dependent f32 reduction tiling
        np.testing.assert_allclose(c[ok], a[ok], atol=1e-3)


def test_collate_flat_device_guards():
    """Config/overflow guards fail loudly (device drops rows silently)."""
    kw = dict(voxel_size=0.1, num_queries=16, max_segments=64,
              max_instances=16, voxel_bucket=256, use_aug=False,
              stem_mode="none", flat_pack=True, swin_window=4)
    with pytest.raises(ValueError, match="COMPLETE"):
        InstSegPipelineConfig(device_maps=True, **kw)
    # a deliberately tiny lock: collate must raise, not truncate
    caps = {f"tot_{l}": 8 for l in range(5)}
    caps.update({f"rect_{l}": 8 for l in range(5)})
    caps.update({f"win{l}s{j}_nw": 8 for l in (1, 2, 3, 4)
                 for j in (0, 1)})
    cfg = InstSegPipelineConfig(device_maps=True, flat_shape_caps=caps,
                                **kw)
    rng = np.random.default_rng(0)
    scenes = [synthetic.make_scene(np.random.default_rng(3), n_points=2000,
                                   n_instances=4, n_segments=24)]
    scenes[0]["inst_labels"] = np.minimum(scenes[0]["inst_labels"], 199)
    with pytest.raises(ValueError, match="tot_0"):
        make_batch(scenes, cfg, rng, train=False)
