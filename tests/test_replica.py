"""Realistic-replica generator + the eval-batch keys it exposed.

pq3d_tpu/data/replica.py writes the real SceneVerse file formats at
configurable statistics (dress-rehearsal substrate, VERDICT r2 item 2).
These tests check (a) every task dataset loads from a generated replica,
(b) the unified eval batch carries the box-matched eval side-channel
(tgt_obj_boxes / eval_type) that Multi3DReferEval consumes — a gap the
first rehearsal run caught live.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pq3d_tpu.config.config import Config
from pq3d_tpu.data.replica import ReplicaSpec, write_replica


@pytest.fixture(scope="module")
def replica(tmp_path_factory):
    root = tmp_path_factory.mktemp("replica")
    base, pred, aux = (str(root / d) for d in ("base", "pred", "aux"))
    spec = ReplicaSpec(n_train=2, n_val=1, n_points=6000, n_objects=8,
                       n_anno_per_scan=3, mv_dim=16, voxel_dim=8, seg_dim=16)
    ids = write_replica(base, pred, aux, spec)
    from pq3d_tpu.data.sceneverse import SceneVerseScans
    SceneVerseScans._cache = {}
    return base, pred, aux, ids


def _cfg(base, pred, aux):
    return Config({
        "data": {"scene_verse_base": base, "scene_verse_aux": aux,
                 "scene_verse_pred": pred,
                 "load_scan_options": {"load_image_obj_feat": True,
                                       "load_voxel_obj_feat": True}},
        "debug": {"flag": False}})


def test_all_task_datasets_load(replica):
    base, pred, aux, ids = replica
    from pq3d_tpu.data import sceneverse as sv
    cfg = _cfg(base, pred, aux)
    for name in ("ScanReferSceneVerse", "Sr3DSceneVerse", "Nr3DSceneVerse",
                 "Multi3DReferSceneVerse", "ScanQASceneVerse",
                 "SQA3DSceneVerse", "Scan2CapSceneVerse"):
        from pq3d_tpu.registry import DATASET_REGISTRY
        ds = DATASET_REGISTRY.get(name)(cfg, "val")
        assert len(ds) > 0, name
        scene, lang = ds.get_item(0)
        assert "prompt_tokens" in lang or lang["task_id"] == 2, name


def test_instseg_dataset_full_label_space(replica):
    base, pred, aux, ids = replica
    from pq3d_tpu.registry import DATASET_REGISTRY
    import pq3d_tpu.data.datasets  # registers instseg dataset
    cfg = Config({
        "data": {"scene_verse_base": base,
                 "instseg_options": {"filter_out_classes": [0, 2],
                                     "ignore_label": -100},
                 "load_scan_options": {}},
        "debug": {"flag": False}})
    ds = DATASET_REGISTRY.get("ScanNetInstSegSceneVerse")(cfg, "val")
    scene = ds.get_scene(0)
    labels = np.unique(scene["inst_labels"])
    labels = labels[labels >= 0]
    assert len(labels) >= 2                  # multiple ScanNet200 classes
    assert labels.max() < 200


def test_multi3drefer_eval_batch_keys(replica):
    """The eval batch must carry tgt_obj_boxes + eval_type through the
    _meta side channel, and Multi3DReferEval must consume them."""
    base, pred, aux, ids = replica
    from pq3d_tpu.registry import DATASET_REGISTRY
    from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.eval.grounding_eval import Multi3DReferEval

    cfg = _cfg(base, pred, aux)
    ds = DATASET_REGISTRY.get("Multi3DReferSceneVerse")(cfg, "val")
    pipe = UnifiedPipelineConfig(max_obj_len=8, num_points=32,
                                 prompt_len=12, response_len=4, dim_loc=6)
    loader = UnifiedTaskLoader(ds, pipe, batch_size=2, train=False,
                               feature_dims={"mv": 16, "voxel": 8})
    batch = next(iter(loader(0)))
    meta = batch["_meta"]
    assert "tgt_obj_boxes" in meta and "eval_type" in meta
    assert all(b.ndim == 2 and b.shape[1] == 6 for b in
               meta["tgt_obj_boxes"])
    ev = Multi3DReferEval()
    out = {"og3d_logits": np.random.default_rng(0).standard_normal(
        (2, pipe.max_obj_len)).astype(np.float32)}
    eval_batch = {k: v for k, v in batch.items() if not k.startswith("_")}
    eval_batch.update(meta)
    ev.update(out, eval_batch)
    rec = ev.record()
    assert "iou50_overall" in rec
