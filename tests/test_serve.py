"""Serving driver: micro-batching, single-compile shape discipline, and
full-resolution per-scene predictions through futures."""
import numpy as np
import jax
import pytest

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.models.query3d import (EncoderCfg, MaskHeadCfg, Query3DUnified,
                                     UnifiedEncoderCfg, VoxelEncoderCfg)
from pq3d_tpu.serve import InstSegServer


def _model():
    return Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=32,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        mv_enc=EncoderCfg(input_feat_size=16),
        pc_enc=EncoderCfg(input_feat_size=16),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20),
        mask_head_cfg=MaskHeadCfg(num_targets=21,
                                  filter_out_classes=(0, 2)))


def _pipe():
    return InstSegPipelineConfig(
        voxel_size=0.15, num_queries=8, max_segments=32, max_instances=8,
        voxel_bucket=128, use_aug=False,
        level_caps=[512, 256, 128, 128, 128])


@pytest.mark.slow
def test_server_serves_scenes_with_one_compile():
    rng = np.random.default_rng(0)
    pipe = _pipe()
    scenes = [synthetic.make_scene(rng, n_points=n, n_instances=3,
                                   n_segments=16)
              for n in (600, 900, 700, 800, 650)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)

    model = _model()
    init_batch = make_batch(scenes[:2], pipe, rng, train=False)
    S = pipe.max_segments
    init_batch["mv_seg_fts"] = np.zeros((2, S, 16), np.float32)
    init_batch["mv_seg_pad_masks"] = init_batch["seg_pad_masks"]
    init_batch["pc_seg_fts"] = np.zeros((2, S, 16), np.float32)
    init_batch["pc_seg_pad_masks"] = init_batch["seg_pad_masks"]
    init_batch = {k: v for k, v in init_batch.items()
                  if not k.startswith("_")}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)

    srv = InstSegServer(model, variables, pipe, batch_size=2,
                        num_classes=20, topk=20, max_delay_s=0.01,
                        extra_features={"mv": 16, "pc": 16})
    try:
        futs = [srv.submit(s) for s in scenes]
        results = [f.result(timeout=300) for f in futs]
    finally:
        srv.close()

    # every scene got full-resolution predictions
    for s, preds in zip(scenes, results):
        assert isinstance(preds, list)
        for p in preds:
            assert p["mask"].shape == (len(s["points"]),)
            assert 0 <= p["class"] < 20
            assert p["score"] > 0
    # mixed scene sizes + a padded final batch -> still ONE executable
    assert srv.jit_cache_size() == 1
    st = srv.stats.summary()
    assert st["scenes"] == 5 and st["steps"] >= 3
    assert st["p99_latency_s"] > 0


def test_unified_server_grounding_and_generation():
    from pq3d_tpu.config import Config
    from pq3d_tpu.data.unified_datasets import SyntheticRefer
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.models.query3d import (GenerationHeadCfg, GroundHeadCfg,
                                         TxtEncoderCfg)
    from pq3d_tpu.serve import UnifiedServer

    cfg = Config({"data": {"synthetic": {"num_train": 5, "n_points": 600,
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

    # init off one assembled batch
    from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
    loader = UnifiedTaskLoader(ds, pipe, batch_size=2, train=False,
                               feature_dims=feature_dims)
    init_batch = {k: v for k, v in next(iter(loader(0))).items()
                  if not k.startswith("_")}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)

    srv = UnifiedServer(model, variables, pipe, batch_size=2,
                        feature_dims=feature_dims, max_delay_s=0.01,
                        detokenize=lambda t: " ".join(map(str, t)))
    try:
        futs = [srv.submit(ds.get_item(i)) for i in range(5)]
        results = [f.result(timeout=300) for f in futs]
    finally:
        srv.close()

    for r in results:
        assert 0 <= r["ground_obj"] < 8
        assert np.isfinite(r["ground_scores"][r["ground_obj"]])
        assert isinstance(r["generation"], str)
    assert srv.jit_cache_size() == 1
    assert srv.stats.summary()["scenes"] == 5


def test_server_device_maps_matches_host_maps():
    """InstSegServer with pipe_cfg.device_maps: the batch ships only coords
    (+feats); predictions must match the host-maps server on the same
    scenes (ops/device_maps parity, end to end through serving)."""
    import dataclasses
    rng = np.random.default_rng(1)
    host_pipe = dataclasses.replace(_pipe(), stem_mode="dense_block")
    dev_pipe = dataclasses.replace(host_pipe, device_maps=True)
    scenes = [synthetic.make_scene(rng, n_points=n, n_instances=3,
                                   n_segments=16) for n in (600, 750)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)

    host_model = _model()
    dev_model = host_model.clone(voxel_enc=dataclasses.replace(
        host_model.voxel_enc, device_maps=tuple(host_pipe.level_caps)))
    init_batch = make_batch([dict(s) for s in scenes], host_pipe, rng,
                            train=False)
    S = host_pipe.max_segments
    for name in ("mv", "pc"):
        init_batch[f"{name}_seg_fts"] = np.zeros((2, S, 16), np.float32)
        init_batch[f"{name}_seg_pad_masks"] = init_batch["seg_pad_masks"]
    init_batch = {k: v for k, v in init_batch.items()
                  if not k.startswith("_")}
    variables = host_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)

    def run(model, pipe):
        srv = InstSegServer(model, variables, pipe, batch_size=2,
                            num_classes=20, topk=10, max_delay_s=0.01,
                            extra_features={"mv": 16, "pc": 16})
        try:
            return [f.result(timeout=600)
                    for f in [srv.submit(dict(s)) for s in scenes]]
        finally:
            srv.close()

    want = run(host_model, host_pipe)
    got = run(dev_model, dev_pipe)
    for w_preds, g_preds in zip(want, got):
        assert len(w_preds) == len(g_preds)
        for w, g in zip(w_preds, g_preds):
            assert w["class"] == g["class"]
            np.testing.assert_allclose(g["score"], w["score"],
                                       rtol=1e-4, atol=1e-5)
            assert (w["mask"] == g["mask"]).mean() > 0.999


def test_server_device_maps_config_mismatch():
    """device_maps set on only one side (pipe or model) must fail loudly."""
    import dataclasses
    dev_pipe = dataclasses.replace(_pipe(), device_maps=True,
                                   stem_mode="dense_block")
    with pytest.raises(ValueError, match="device_maps"):
        InstSegServer(_model(), {}, dev_pipe, batch_size=2, num_classes=20)
    dev_model = _model().clone(voxel_enc=dataclasses.replace(
        _model().voxel_enc, device_maps=(512, 256, 128, 128, 128)))
    with pytest.raises(ValueError, match="device_maps"):
        InstSegServer(dev_model, {}, _pipe(), batch_size=2, num_classes=20)


def test_server_requires_level_caps():
    pipe = InstSegPipelineConfig(voxel_size=0.15, num_queries=8,
                                 max_segments=32, max_instances=8,
                                 voxel_bucket=128, use_aug=False)
    with pytest.raises(ValueError, match="level_caps"):
        InstSegServer(_model(), {}, pipe, batch_size=2, num_classes=20)


def test_server_rejects_level_cap_ladder():
    """level_cap_ladder overrides level_caps in collate (one executable per
    rung) — serving must refuse it rather than silently recompile."""
    import dataclasses
    import pytest
    from pq3d_tpu.serve import InstSegServer
    pipe = dataclasses.replace(_pipe(),
                               level_cap_ladder=[[512, 256, 128, 64, 32]])
    with pytest.raises(ValueError, match="level_cap_ladder"):
        InstSegServer(_model(), {}, pipe, batch_size=2, num_classes=20)


def test_cancelled_future_does_not_poison_batch():
    """A client cancelling its future must not turn the other requests'
    results into InvalidStateError (serve.py worker loop)."""
    import threading
    from pq3d_tpu.serve import _MicroBatchServer

    release = threading.Event()

    class Slow(_MicroBatchServer):
        def _run_batch(self, reqs):
            release.wait(timeout=30)
            return [r * 2 for r in reqs] + \
                [None] * (self.batch_size - len(reqs))

    srv = Slow(batch_size=2, max_delay_s=0.01)
    try:
        f1 = srv.submit(21)
        f2 = srv.submit(100)
        # batch is now in flight (blocked on the event); the server never
        # marks futures running, so cancel() succeeds
        import time
        time.sleep(0.2)
        assert f2.cancel()
        release.set()
        assert f1.result(timeout=30) == 42
        assert f2.cancelled()
    finally:
        release.set()
        srv.close()


def test_cancel_race_during_delivery_does_not_poison_batch():
    """A cancel() landing BETWEEN any pre-check and set_result raises
    InvalidStateError inside the delivery loop; the worker must contain it
    to that one future instead of re-raising into the batch except-handler
    (which would overwrite the remaining futures' results)."""
    import concurrent.futures as futures
    import threading
    from pq3d_tpu.serve import _MicroBatchServer

    release = threading.Event()

    class Slow(_MicroBatchServer):
        def _run_batch(self, reqs):
            release.wait(timeout=30)
            return [r * 2 for r in reqs] + \
                [None] * (self.batch_size - len(reqs))

    srv = Slow(batch_size=3, max_delay_s=0.01)
    try:
        f1 = srv.submit(21)
        f2 = srv.submit(100)
        f3 = srv.submit(7)
        # simulate the race: f2 reports not-cancelled right up until
        # delivery, when set_result finds it already cancelled
        f2.set_result = lambda res: (_ for _ in ()).throw(
            futures.InvalidStateError("simulated cancel race"))
        release.set()
        assert f1.result(timeout=30) == 42
        assert f3.result(timeout=30) == 14
    finally:
        release.set()
        srv.close()


@pytest.mark.slow
def test_server_multiworker_pool():
    """num_workers>0 fans process_scene out to a spawn pool (multi-core
    serving hosts); results stay full-resolution and the shape discipline
    holds.  Deterministic per-scene seeds replace the serial rng, so
    FPS-sampled queries may differ from serial mode — the contract is
    valid predictions from ONE executable, not bit-equal outputs."""
    rng = np.random.default_rng(0)
    pipe = _pipe()
    scenes = [synthetic.make_scene(rng, n_points=n, n_instances=3,
                                   n_segments=16)
              for n in (600, 900, 700, 800)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    model = _model()
    init_batch = make_batch(scenes[:2], pipe, rng, train=False)
    S = pipe.max_segments
    for name in ("mv", "pc"):
        init_batch[f"{name}_seg_fts"] = np.zeros((2, S, 16), np.float32)
        init_batch[f"{name}_seg_pad_masks"] = init_batch["seg_pad_masks"]
    init_batch = {k: v for k, v in init_batch.items()
                  if not k.startswith("_")}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)
    srv = InstSegServer(model, variables, pipe, batch_size=2,
                        num_classes=20, topk=20, max_delay_s=0.01,
                        extra_features={"mv": 16, "pc": 16}, num_workers=2)
    try:
        futs = [srv.submit(s) for s in scenes]
        results = [f.result(timeout=600) for f in futs]
    finally:
        srv.close()
    for s, preds in zip(scenes, results):
        assert preds and all(p["mask"].shape == (len(s["points"]),)
                             for p in preds)
    assert srv.jit_cache_size() == 1
