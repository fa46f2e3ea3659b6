"""dp-sharded serving: one server drives every chip of a slice (serve.py
"one server per slice" topology) — the rectangular batch is sharded over
the mesh's data axis and per-scene results match the single-device server.
"""
import numpy as np
import jax
import pytest

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.query3d import (EncoderCfg, MaskHeadCfg, Query3DUnified,
                                     UnifiedEncoderCfg, VoxelEncoderCfg)
from pq3d_tpu.parallel.mesh import MeshConfig, make_mesh
from pq3d_tpu.serve import InstSegServer

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")


def _model():
    return Query3DUnified(
        memories=("voxel",), heads=("mask",), hidden_size=32, dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20),
        mask_head_cfg=MaskHeadCfg(num_targets=21,
                                  filter_out_classes=(0, 2)))


def _pipe():
    return InstSegPipelineConfig(
        voxel_size=0.15, num_queries=8, max_segments=32, max_instances=8,
        voxel_bucket=128, use_aug=False,
        level_caps=[512, 256, 128, 128, 128])


def _init_variables(model, pipe, scenes, rng):
    init_batch = {k: v for k, v in
                  make_batch(scenes[:2], pipe, rng, train=False).items()
                  if not k.startswith("_")}
    return model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)


def _serve_all(srv, scenes):
    try:
        futs = [srv.submit(s) for s in scenes]
        return [f.result(timeout=600) for f in futs]
    finally:
        srv.close()


def test_mesh_server_matches_single_device(monkeypatch):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    # force f32 conv compute: bf16 rounding is reduction-order sensitive and
    # sharding re-partitions the GEMMs, which can flip ranked near-ties
    # (same recipe as test_flat_pack's layout-equivalence tests)
    import functools
    import jax.numpy as jnp
    from pq3d_tpu.ops import sparse as sparse_ops
    for fname in ("sparse_conv", "sparse_conv_sym", "sparse_conv_down",
                  "sparse_conv_transpose", "sparse_conv_transpose_gf",
                  "conv0_dense_block"):
        monkeypatch.setattr(
            sparse_ops, fname,
            functools.partial(getattr(sparse_ops, fname),
                              compute_dtype=jnp.float32))
    rng = np.random.default_rng(0)
    pipe = _pipe()
    scenes = [synthetic.make_scene(rng, n_points=n, n_instances=3,
                                   n_segments=16)
              for n in (600, 900, 700, 800, 650, 720, 880, 640)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)

    model = _model()
    variables = _init_variables(model, pipe, scenes, rng)

    mesh = make_mesh(MeshConfig(data=-1))
    assert mesh.shape["data"] == 8
    srv = InstSegServer(model, variables, pipe, batch_size=8,
                        num_classes=20, topk=20, max_delay_s=0.2, mesh=mesh)
    sharded = _serve_all(srv, scenes)
    assert srv.jit_cache_size() == 1

    ref_srv = InstSegServer(model, variables, pipe, batch_size=8,
                            num_classes=20, topk=20, max_delay_s=0.2)
    single = _serve_all(ref_srv, scenes)

    # eval mode is per-scene independent and conv compute is forced f32:
    # the sharded forward must reproduce the single-device predictions
    for preds_a, preds_b in zip(sharded, single):
        assert len(preds_a) == len(preds_b)
        for a, b in zip(preds_a, preds_b):
            assert a["class"] == b["class"]
            np.testing.assert_allclose(a["score"], b["score"],
                                       rtol=1e-4, atol=1e-6)
            assert (a["mask"] == b["mask"]).mean() > 0.999


def test_replicated_server_flat_pack():
    """ReplicatedServer: device-pinned replicas serve the flat_pack fast
    path (which a sharded mesh cannot) and the fanout uses every replica."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from pq3d_tpu.serve import ReplicatedServer
    rng = np.random.default_rng(1)
    pipe = _pipe()
    pipe.flat_pack = True
    scenes = [synthetic.make_scene(rng, n_points=n, n_instances=3,
                                   n_segments=16)
              for n in (600, 900, 700, 800, 650, 720, 880, 640)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)

    model = _model()
    variables = _init_variables(model, pipe, scenes, rng)

    srv = ReplicatedServer(
        lambda d: InstSegServer(model, variables, pipe, batch_size=2,
                                num_classes=20, topk=20, max_delay_s=0.01,
                                device=d),
        devices=jax.devices()[:2])
    try:
        futs = [srv.submit(s) for s in scenes]
        results = [f.result(timeout=600) for f in futs]
    finally:
        srv.close()

    for s, preds in zip(scenes, results):
        assert isinstance(preds, list)
        for p in preds:
            assert p["mask"].shape == (len(s["points"]),)
            assert 0 <= p["class"] < 20
    st = srv.stats_summary()
    assert st["scenes"] == 8
    assert all(p["scenes"] > 0 for p in st["replicas"])


def test_mesh_server_rejects_ragged_batch():
    mesh = make_mesh(MeshConfig(data=-1))
    if mesh.shape["data"] < 2:
        pytest.skip("needs >1 device")
    with pytest.raises(ValueError, match="not divisible"):
        InstSegServer(_model(), {}, _pipe(), batch_size=3, num_classes=20,
                      mesh=mesh)


def test_mesh_server_rejects_flat_layout():
    mesh = make_mesh(MeshConfig(data=-1))
    pipe = _pipe()
    pipe.flat_pack = True
    with pytest.raises(ValueError, match="rectangular"):
        InstSegServer(_model(), {}, pipe, batch_size=8, num_classes=20,
                      mesh=mesh)


def test_unified_mesh_server_serves():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from pq3d_tpu.config import Config
    from pq3d_tpu.data.unified_datasets import SyntheticRefer
    from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.models.query3d import (GenerationHeadCfg, GroundHeadCfg,
                                         TxtEncoderCfg)
    from pq3d_tpu.serve import UnifiedServer

    cfg = Config({"data": {"synthetic": {"num_train": 8, "n_points": 600,
                                         "n_instances": 4}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=8, num_points=64,
                                 prompt_len=12, response_len=8)
    ds = SyntheticRefer(cfg, "train")
    feature_dims = {"mv": 32, "voxel": 16}
    model = Query3DUnified(
        memories=("mv", "voxel", "prompt"), heads=("ground", "generation"),
        hidden_size=64, dim_loc=6, use_offline_voxel_fts=True,
        skip_query_encoder_mask_pred=True, mask_head_cfg=None,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4, structure="mixed"),
        mv_enc=EncoderCfg(input_feat_size=32),
        voxel_obj_enc=EncoderCfg(input_feat_size=16),
        ground_head_cfg=GroundHeadCfg(hidden_size=32),
        generation_head_cfg=GenerationHeadCfg(
            vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=1,
            num_heads=4, max_new_tokens=4),
        txt_cfg=TxtEncoderCfg(vocab_size=200, width=32, layers=1, heads=4))
    loader = UnifiedTaskLoader(ds, pipe, batch_size=8, train=False,
                               feature_dims=feature_dims)
    init_batch = {k: v for k, v in next(iter(loader(0))).items()
                  if not k.startswith("_")}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)

    mesh = make_mesh(MeshConfig(data=-1))
    srv = UnifiedServer(model, variables, pipe, batch_size=8,
                        feature_dims=feature_dims, max_delay_s=0.2,
                        mesh=mesh,
                        detokenize=lambda t: " ".join(map(str, t)))
    results = _serve_all(srv, [ds.get_item(i) for i in range(8)])
    for r in results:
        assert 0 <= r["ground_obj"] < 8
        assert np.isfinite(r["ground_scores"][r["ground_obj"]])
        assert isinstance(r["generation"], str)


def test_unified_mesh_server_rejects_flat_obj():
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.serve import UnifiedServer
    mesh = make_mesh(MeshConfig(data=-1))
    pipe = UnifiedPipelineConfig(max_obj_len=8, num_points=64,
                                 prompt_len=12, response_len=8,
                                 flat_obj=True)
    with pytest.raises(ValueError, match="flat_obj"):
        UnifiedServer(_model(), {}, pipe, batch_size=8,
                      feature_dims={}, mesh=mesh)
