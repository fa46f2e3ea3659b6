"""Eval-remainder discipline: every item scored exactly once.

The reference pads eval dataloaders by wrap-around in its distributed
sampler and drops the duplicates at metric gather
(reference common/misc.py:103-117 gather_for_metrics).  Our loaders used
to DROP the final non-divisible batch at eval (silent bias of up to
bs-1 items); they now wrap-pad it and mark ``_meta['n_real']`` so the
trainer truncates evaluator-facing rows (eval/base.truncate_batch_rows).
"""
import numpy as np
import pytest

from pq3d_tpu.config import Config
from pq3d_tpu.data.unified_datasets import SyntheticRefer
from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
from pq3d_tpu.eval.base import truncate_batch_rows
from pq3d_tpu.eval.grounding_eval import ScanReferEval


def _loader(n_items, bs, train):
    cfg = Config({"data": {"synthetic": {"num_train": n_items,
                                         "n_points": 300,
                                         "n_instances": 4}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=5, num_points=16, prompt_len=8,
                                 response_len=4)
    return UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                             batch_size=bs, train=train)


def test_unified_loader_wrap_remainder():
    batches = list(_loader(5, 2, train=False)(0))
    assert len(batches) == 3
    assert [b["_meta"]["n_real"] for b in batches] == [2, 2, 1]
    # wrapped row repeats item 0's data but is marked padding
    assert batches[-1]["query_locs"].shape[0] == 2
    # train keeps drop_last semantics (one shuffled epoch)
    assert len(list(_loader(5, 2, train=True)(0))) == 2
    # tiny dataset: wrap must tile, not under-fill
    small = list(_loader(1, 4, train=False)(0))
    assert len(small) == 1 and small[0]["_meta"]["n_real"] == 1


def test_instseg_loader_wrap_remainder():
    from pq3d_tpu.data.datasets import InstSegLoader, SyntheticInstSeg
    from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig
    cfg = Config({"data": {"synthetic": {"num_val": 3, "n_points": 500,
                                         "n_instances": 3,
                                         "n_segments": 16}},
                  "debug": {"flag": False}})
    pipe = InstSegPipelineConfig(voxel_size=0.15, num_queries=8,
                                 max_segments=32, max_instances=8,
                                 voxel_bucket=128, use_aug=False)
    loader = InstSegLoader(SyntheticInstSeg(cfg, "val"), pipe,
                           batch_size=2, train=False)
    batches = list(loader(0))
    assert len(batches) == 2
    assert [b["_meta"]["n_real"] for b in batches] == [2, 1]


def test_truncate_batch_rows_units():
    b, n = 4, 3
    arr = np.arange(8).reshape(4, 2)
    tree = {
        "batch_led": arr,                       # (B, ...) -> sliced
        "not_batch": np.arange(6).reshape(2, 3),
        "layers": [arr + i for i in range(4)],  # len==B BUT batch-led
        "rows": ["a", "b", "c", "d"],           # per-row payloads
        "meta": {"per_scene": [np.zeros((4, 7)) for _ in range(4)]},
    }
    out = truncate_batch_rows(tree, n, b)
    assert out["batch_led"].shape == (3, 2)
    assert out["not_batch"].shape == (2, 3)
    # a list of batch-led arrays is a per-LAYER stack: slice each
    # element's rows, never the list (the [-1] layer must survive)
    assert len(out["layers"]) == 4 and out["layers"][-1].shape == (3, 2)
    assert out["rows"] == ["a", "b", "c"]
    # per-scene meta arrays whose dim0 coincides with B are sliced as
    # batch-led lists (elements are batch-led by the heuristic) — the
    # list length shrinks... no: elements ARE (4,7) arrays == batch_led
    # heuristic, so each is row-sliced; pin the current contract
    assert len(out["meta"]["per_scene"]) == 4
    assert out["meta"]["per_scene"][0].shape == (3, 7)
    # no-op when the batch is fully real
    same = truncate_batch_rows(tree, b, b)
    assert same["batch_led"].shape == (4, 2)


def _fake_logits(batch, item_ids):
    """(B, O) logits: correct target iff global item id is even."""
    tgt = np.asarray(batch["tgt_object_id"])     # (B, O) one-hot
    b, O = tgt.shape
    logits = np.full((b, O), -10.0, np.float32)
    for i in range(b):
        true_obj = int(tgt[i].argmax())
        hit = item_ids[i] % 2 == 0
        logits[i, true_obj if hit else (true_obj + 1) % O] = 10.0
    return logits


def test_eval_scores_every_item_exactly_once():
    """bs=2 over 5 items (wrap-padded final batch) must equal the bs=5
    single-batch run: og_acc 3/5, total_count 5.  Without truncation the
    duplicated wrap row would score 4/6."""
    for bs in (2, 5):
        ev = ScanReferEval()
        row = 0
        for batch in _loader(5, bs, train=False)(0):
            nr = batch["_meta"]["n_real"]
            rows = batch["query_locs"].shape[0]
            ids = [(row + i) % 5 for i in range(rows)]
            out = {"og3d_logits": _fake_logits(batch, ids)}
            eval_batch = {k: np.asarray(v) for k, v in batch.items()
                          if not k.startswith("_")}
            out = truncate_batch_rows(out, nr, rows)
            eval_batch = truncate_batch_rows(eval_batch, nr, rows)
            ev.update(out, eval_batch)
            row += nr
        res = ev.record()
        assert ev.total_count == 5, bs
        np.testing.assert_allclose(res["og_acc"], 3 / 5, err_msg=str(bs))
