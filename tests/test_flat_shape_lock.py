"""Flat-pack serving shape lock (InstSegPipelineConfig.flat_shape_caps):
different-sized batches collate to IDENTICAL array shapes, so a serving
process compiles once instead of once per bucketed batch-total combination
(chip: 9 compiles over 8 batches without the lock — PERF.md round-3
serving table)."""
import dataclasses
import warnings

import numpy as np
import pytest

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig,
                                            flat_shape_caps_from, make_batch)


def _scenes(rng, sizes):
    scenes = [synthetic.make_scene(rng, n_points=n, n_instances=3,
                                   n_segments=16) for n in sizes]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    return scenes


def _cfg(**kw):
    kw.setdefault("stem_mode", "none")
    return InstSegPipelineConfig(
        voxel_size=0.15, num_queries=8, max_segments=32, max_instances=8,
        voxel_bucket=256, use_aug=False, flat_pack=True, **kw)


def _shapes(batch):
    return {k: v.shape for k, v in batch["maps"].items()} | {
        "voxel_feats": batch["voxel_feats"].shape,
        "voxel2segment": batch["voxel2segment"].shape}


@pytest.mark.parametrize("swin", [0, 4])
def test_locked_batches_collate_to_one_shape(swin):
    rng = np.random.default_rng(0)
    cfg = _cfg(swin_window=swin,
               stem_mode="none" if swin else "dense_block")
    # representative batch -> lock
    rep = make_batch(_scenes(rng, (900, 1100)), cfg, rng, train=False)
    caps = flat_shape_caps_from(rep["_meta"]["flat_dims"], cfg, margin=1.3)
    locked = dataclasses.replace(cfg, flat_shape_caps=caps)
    # smaller and differently-sized batches now produce identical shapes
    b1 = make_batch(_scenes(rng, (700, 950)), locked, rng, train=False)
    b2 = make_batch(_scenes(rng, (400, 1050)), locked, rng, train=False)
    assert _shapes(b1) == _shapes(b2)
    # and the locked shapes cover the representative's true dims
    for k, v in rep["_meta"]["flat_dims"].items():
        assert caps[k] >= v


def test_overflow_falls_back_with_warning():
    rng = np.random.default_rng(1)
    cfg = _cfg()
    small = make_batch(_scenes(rng, (300, 400)), cfg, rng, train=False)
    caps = flat_shape_caps_from(small["_meta"]["flat_dims"], cfg,
                                margin=1.0)
    locked = dataclasses.replace(cfg, flat_shape_caps=caps)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        big = make_batch(_scenes(rng, (2500, 2500)), locked, rng,
                         train=False)
    assert any("overflows its shape cap" in str(x.message) for x in w)
    # fallback sizes are the bucketed TRUE sizes (never wrong, may recompile)
    assert big["maps"]["valid_0"].shape[0] >= \
        big["_meta"]["flat_dims"]["tot_0"] - 1


def test_server_auto_lock_converges():
    """InstSegServer grows its lock from traffic; once the biggest batch
    has been seen, the executable count stops growing."""
    jax = pytest.importorskip("jax")
    from pq3d_tpu.models.query3d import (MaskHeadCfg, Query3DUnified,
                                         UnifiedEncoderCfg, VoxelEncoderCfg)
    from pq3d_tpu.serve import InstSegServer

    rng = np.random.default_rng(2)
    cfg = _cfg(stem_mode="dense_block")
    model = Query3DUnified(
        memories=("voxel",), heads=("mask",), hidden_size=32, dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=False,
                                  use_self_mask=True),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20),
        mask_head_cfg=MaskHeadCfg(num_targets=21, filter_out_classes=(0, 2)))
    init_batch = make_batch(_scenes(rng, (900, 1000)), cfg, rng, train=False)
    init_batch = {k: v for k, v in init_batch.items()
                  if not k.startswith("_")}
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jax.tree.map(np.asarray, init_batch), train=False)
    srv = InstSegServer(model, variables, cfg, batch_size=2, num_classes=20,
                        topk=8, max_delay_s=0.01)
    try:
        # biggest scenes first: the first batch locks the shape envelope
        for sizes in ((1000, 1000), (500, 700), (650, 420), (800, 300)):
            futs = [srv.submit(s) for s in _scenes(rng, sizes)]
            for f in futs:
                assert isinstance(f.result(timeout=600), list)
        assert srv.pipe_cfg.flat_shape_caps is not None
        # first batch compiles unlocked + once locked; later batches reuse
        assert srv.jit_cache_size() <= 2
    finally:
        srv.close()
