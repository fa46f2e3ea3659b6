"""Unified-task pipeline + loaders: shapes, masks, task mixing."""
import numpy as np

from pq3d_tpu.config import Config
from pq3d_tpu.data.unified_datasets import (SyntheticCaption, SyntheticQA,
                                            SyntheticRefer, detokenize, VOCAB)
from pq3d_tpu.data.unified_loader import MixedTaskLoader, UnifiedTaskLoader
from pq3d_tpu.data.unified_pipeline import (UnifiedPipelineConfig,
                                            process_objects)
from pq3d_tpu.models.query3d import PROMPT_LOC, PROMPT_TXT


CFG = Config({"data": {"synthetic": {"num_train": 8, "num_val": 4,
                                     "n_points": 600, "n_instances": 4}},
              "debug": {"flag": False}})
PIPE = UnifiedPipelineConfig(max_obj_len=6, num_points=64, prompt_len=12,
                             response_len=8)


def test_refer_loader_batch_contract():
    ds = SyntheticRefer(CFG, "train")
    loader = UnifiedTaskLoader(ds, PIPE, batch_size=4, train=True)
    batch = next(iter(loader(0)))
    assert batch["obj_fts"].shape == (4, 6, 64, 6)
    assert batch["query_locs"].shape == (4, 6, 6)
    assert batch["prompt"].shape == (4, 12)
    assert (batch["prompt_type"] == PROMPT_TXT).all()
    assert batch["tgt_object_id"].shape == (4, 6)
    assert batch["tgt_object_id"].sum(1).min() >= 1  # at least one target
    # normalized object points live in the unit ball
    r = np.sqrt((batch["obj_fts"][..., :3] ** 2).sum(-1)).max()
    assert r <= 1.0 + 1e-5


def test_caption_loader_loc_prompt():
    ds = SyntheticCaption(CFG, "val")
    loader = UnifiedTaskLoader(ds, PIPE, batch_size=2, train=False)
    batch = next(iter(loader(0)))
    assert (batch["prompt_type"] == PROMPT_LOC).all()
    assert "caption" in batch["_meta"]
    assert "tgt_object_id_int" in batch
    # the LOC prompt holds the target object's box
    t = batch["tgt_object_id_int"][0]
    np.testing.assert_allclose(batch["prompt"][0, :6],
                               batch["query_locs"][0, t], atol=1e-5)


def test_mixed_loader_covers_all_tasks():
    loaders = [UnifiedTaskLoader(cls(CFG, "train"), PIPE, 4, True)
               for cls in (SyntheticRefer, SyntheticQA, SyntheticCaption)]
    mixed = MixedTaskLoader(loaders)
    tasks = {int(b["task_id"][0]) for b in mixed(0)}
    assert tasks == {0, 1, 2}


def test_detokenize_roundtrip():
    ids = [VOCAB.index("the"), VOCAB.index("red"), VOCAB.index("chair"), 1, 0]
    assert detokenize(np.array(ids)) == "the red chair"


def test_process_objects_normalization():
    rng = np.random.default_rng(0)
    pcds = rng.standard_normal((3, 50, 6)).astype(np.float32) * 2 + 5
    fts, locs, boxes = process_objects(pcds, None)
    # centers/sizes preserved pre-normalization
    np.testing.assert_allclose(locs[:, :3], pcds[:, :, :3].mean(1), atol=1e-5)
    np.testing.assert_allclose(
        locs[:, 3:], pcds[:, :, :3].max(1) - pcds[:, :, :3].min(1), atol=1e-5)
    # points centered + unit-ball normalized
    np.testing.assert_allclose(fts[:, :, :3].mean(1), 0, atol=1e-5)
    assert np.sqrt((fts[:, :, :3] ** 2).sum(-1)).max() <= 1 + 1e-5


def test_match_gt_to_pred_iou_labels():
    from pq3d_tpu.data.unified_pipeline import match_gt_to_pred
    gt = np.array([[0, 0, 0, 2, 2, 2]], np.float32)
    preds = np.array([
        [0, 0, 0, 2, 2, 2],       # IoU 1.0
        [1.0, 0, 0, 2, 2, 2],     # IoU 1/3 (passes 0.25, fails 0.5)
        [5, 5, 5, 2, 2, 2],       # IoU 0
    ], np.float32)
    i25, i50 = match_gt_to_pred(gt, preds)
    np.testing.assert_array_equal(i25, [1, 1, 0])
    np.testing.assert_array_equal(i50, [1, 0, 0])
