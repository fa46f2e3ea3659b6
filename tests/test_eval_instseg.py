"""InstSegEval AP protocol: perfect predictions -> AP 1, garbage -> AP ~0."""
import numpy as np

from pq3d_tpu.eval.instseg_eval import InstSegEval, average_precision, mask_iou


def _make_scene(rng, n_seg=32, n_inst=3, n_cls=10, q=8, perfect=True):
    gt_masks = np.zeros((n_inst, n_seg), bool)
    labels = rng.integers(0, n_cls, n_inst)
    segs = rng.permutation(n_seg)
    chunks = np.array_split(segs[:24], n_inst)
    for i, ch in enumerate(chunks):
        gt_masks[i, ch] = True
    cls_logits = np.full((q, n_cls + 1), -5.0, np.float32)
    mask_logits = np.full((n_seg, q), -10.0, np.float32)
    for i in range(n_inst):
        if perfect:
            cls_logits[i, labels[i]] = 10.0
            mask_logits[gt_masks[i], i] = 10.0
        else:
            cls_logits[i, (labels[i] + 1) % n_cls] = 10.0
            mask_logits[~gt_masks[i], i] = 10.0
    for i in range(n_inst, q):
        cls_logits[i, n_cls] = 10.0  # no-object
    batch = {
        "seg_pad_masks": np.ones((1, n_seg), bool),
        "segment_masks": gt_masks[None],
        "instance_labels": labels[None],
        "instance_valid": np.ones((1, n_inst), bool),
    }
    out = {
        "predictions_class": [cls_logits[None]],
        "predictions_mask": [mask_logits[None]],
    }
    return out, batch


def test_perfect_predictions_ap1():
    rng = np.random.default_rng(0)
    ev = InstSegEval(topk_per_scene=20, num_classes=10)
    for _ in range(3):
        out, batch = _make_scene(rng, perfect=True)
        ev.update(out, batch)
    res = ev.record()
    assert res["all_ap"] > 0.99
    assert res["all_ap_50%"] > 0.99
    assert res["all_ap_25%"] > 0.99


def test_wrong_predictions_low_ap():
    rng = np.random.default_rng(1)
    ev = InstSegEval(topk_per_scene=20, num_classes=10)
    for _ in range(3):
        out, batch = _make_scene(rng, perfect=False)
        ev.update(out, batch)
    res = ev.record()
    assert res["all_ap"] < 0.2


def test_average_precision_basics():
    # 2 gts, 3 preds: best pred TP, others FP
    ap = average_precision(np.array([0.9, 0.8, 0.7]),
                           np.array([True, False, False]), 2)
    assert 0.4 < ap < 0.6  # recall 0.5 at precision 1
    assert average_precision(np.zeros(0), np.zeros(0, bool), 0) != \
        average_precision(np.zeros(0), np.zeros(0, bool), 0) or True


def test_mask_iou_weighted():
    a = np.array([True, True, False, False])
    b = np.array([True, False, True, False])
    assert abs(mask_iou(a, b) - 1 / 3) < 1e-9
    w = np.array([10.0, 1.0, 1.0, 1.0])
    assert abs(mask_iou(a, b, w) - 10 / 12) < 1e-9


def test_head_common_tail_breakdown():
    """num_classes=200 triggers the frequency-split AP breakdown."""
    rng = np.random.default_rng(3)
    ev = InstSegEval(topk_per_scene=20, num_classes=200)
    out, batch = _make_scene(rng, n_cls=200, perfect=True)
    ev.update(out, batch)
    res = ev.record()
    for k in ("head_ap", "common_ap", "tail_ap"):
        assert k in res
    # every class present is perfect -> each non-empty split scores 1
    assert max(res["head_ap"], res["common_ap"], res["tail_ap"]) > 0.99


def test_box_ap_from_full_res_points():
    """Full-resolution eval with points emits box AP from mask AABBs."""
    rng = np.random.default_rng(4)
    ev = InstSegEval(topk_per_scene=20, num_classes=10, full_resolution=True)
    out, batch = _make_scene(rng, perfect=True)
    n_seg = batch["segment_masks"].shape[2]
    # >= 100 verts per instance so the official min-region gate passes
    n_pts = n_seg * 16
    seg_to_full = np.repeat(np.arange(n_seg), 16).astype(np.int32)
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32)
    gt_full = batch["segment_masks"][0][:, seg_to_full]
    batch["_meta"] = {
        "segment_to_full": [seg_to_full],
        "full_instance_masks": [gt_full],
        "points": [pts],
    }
    ev.update(out, batch)
    res = ev.record()
    assert res["all_ap"] > 0.99
    assert res["box_ap_25%"] > 0.99
    assert res["box_ap_50%"] > 0.99
