"""Official ScanNet AP protocol: cases where it diverges from a plain
greedy confidence-matched AP (ref common/eval_instseg.py:16-180)."""
import numpy as np

from pq3d_tpu.eval.scannet_protocol import (OVERLAPS, average_aps,
                                            evaluate_scannet_ap)


def _scene(preds, gt_masks, gt_labels, weights=None):
    return {"preds": [{"class": c, "score": s, "mask": np.asarray(m, bool)}
                      for c, s, m in preds],
            "gt_masks": np.asarray(gt_masks, bool),
            "gt_labels": np.asarray(gt_labels),
            "weights": None if weights is None else np.asarray(weights,
                                                               np.float32)}


def test_perfect_match_ap1():
    n = 400
    gt = np.zeros((2, n), bool)
    gt[0, :150] = True
    gt[1, 150:300] = True
    preds = [(0, 0.9, gt[0]), (0, 0.8, gt[1])]
    ap = evaluate_scannet_ap([_scene(preds, gt, [0, 0])], [0])
    assert np.nanmin(ap) > 0.99
    all_ap, ap50, ap25 = average_aps(ap)
    assert all_ap > 0.99 and ap50 > 0.99 and ap25 > 0.99


def test_min_region_size_drops_small_pred():
    """A tiny (<100 vert) wrong prediction is skipped entirely — the greedy
    protocol would count it as a false positive and lower AP."""
    n = 400
    gt = np.zeros((1, n), bool)
    gt[0, :200] = True
    small_junk = np.zeros(n, bool)
    small_junk[350:399] = True   # 49 verts
    preds = [(0, 0.95, small_junk), (0, 0.5, gt[0])]
    ap = evaluate_scannet_ap([_scene(preds, gt, [0])], [0])
    # official: junk dropped by min_region -> perfect AP
    assert np.nanmin(ap) > 0.99


def test_small_gt_is_ignore_not_fn():
    """GT below min_region is excluded; a prediction covering only it is
    ignored (not FP), and it is not a hard false negative."""
    n = 400
    gt = np.zeros((2, n), bool)
    gt[0, :200] = True          # big gt
    gt[1, 300:350] = True       # 50 verts: below min region
    pred_small = np.zeros(n, bool)
    pred_small[295:400] = True  # 105 verts, mostly over the small gt + void
    preds = [(0, 0.9, gt[0]), (0, 0.8, pred_small)]
    ap = evaluate_scannet_ap([_scene(preds, gt, [0, 0])], [0])
    # pred_small's mass is void+small-gt -> ignored; big gt matched -> AP 1
    assert np.nanmin(ap) > 0.99


def test_void_overlap_not_fp():
    """A prediction lying mostly on void (unannotated) space is not an FP."""
    n = 400
    gt = np.zeros((1, n), bool)
    gt[0, :150] = True
    void_pred = np.zeros(n, bool)
    void_pred[200:350] = True    # entirely void
    preds = [(0, 0.99, void_pred), (0, 0.5, gt[0])]
    ap = evaluate_scannet_ap([_scene(preds, gt, [0])], [0])
    assert np.nanmin(ap) > 0.99
    # contrast: same geometry but the void area is annotated as another
    # valid class -> the high-scoring prediction becomes a real FP
    gt2 = np.concatenate([gt, void_pred[None]], 0)
    ap2 = evaluate_scannet_ap([_scene(preds, gt2, [0, 1])], [0])
    assert np.nanmax(ap2) < 0.99


def test_double_match_lower_score_is_fp():
    """Two predictions over one GT above threshold: the lower score becomes
    an extra FP (reference evaluate_matches:74-87), cutting precision at
    the recall step of a lower-scored TP."""
    n = 600
    gt = np.zeros((2, n), bool)
    gt[0, :200] = True
    gt[1, 300:500] = True
    near_dup = gt[0].copy()
    near_dup[:20] = False        # IoU 0.9 with gt0
    preds = [(0, 0.9, gt[0]), (0, 0.85, near_dup), (0, 0.8, gt[1])]
    ap = evaluate_scannet_ap([_scene(preds, gt, [0, 0])],
                             [0], overlaps=np.array([0.5]))
    # TP@0.9, FP@0.85 (duplicate), TP@0.8 -> benchmark integration = 0.7917
    assert abs(ap[0, 0] - 0.791666) < 1e-3
    # without the duplicate the same scene is perfect
    ap_clean = evaluate_scannet_ap(
        [_scene([preds[0], preds[2]], gt, [0, 0])], [0],
        overlaps=np.array([0.5]))
    assert ap_clean[0, 0] > 0.99


def test_ignore_label_gt_is_void():
    """Instances labeled ignore (<0) contribute void, not GT."""
    n = 400
    gt = np.zeros((2, n), bool)
    gt[0, :150] = True
    gt[1, 200:350] = True
    pred_on_ignored = gt[1]
    preds = [(0, 0.9, gt[0]), (0, 0.8, pred_on_ignored)]
    ap = evaluate_scannet_ap([_scene(preds, gt, [0, -100])], [0])
    assert np.nanmin(ap) > 0.99


def test_weighted_segment_level_matches_fullres():
    """Segment-level masks + vert-count weights reproduce the full-res AP."""
    n_seg, seg_size = 40, 20
    weights = np.full(n_seg, seg_size, np.float32)
    gt_seg = np.zeros((1, n_seg), bool)
    gt_seg[0, :10] = True
    half = np.zeros(n_seg, bool)
    half[:5] = True              # IoU 0.5 exactly
    preds = [(0, 0.9, half)]
    ap_seg = evaluate_scannet_ap(
        [_scene(preds, gt_seg, [0], weights)], [0],
        overlaps=np.array([0.25, 0.5]))
    # full-res equivalent
    gt_full = np.repeat(gt_seg, seg_size, axis=1)
    preds_full = [(0, 0.9, np.repeat(half, seg_size))]
    ap_full = evaluate_scannet_ap(
        [_scene(preds_full, gt_full, [0])], [0],
        overlaps=np.array([0.25, 0.5]))
    assert np.allclose(ap_seg, ap_full, equal_nan=True)
    assert ap_seg[0, 0] > 0.99      # IoU .5 > .25 -> TP
    assert ap_seg[1, 0] < 0.01      # IoU .5 NOT > .5 -> miss


def test_instseg_eval_official_vs_greedy_divergence():
    """End-to-end through InstSegEval: a sub-min-region junk prediction
    changes the greedy AP but not the official one."""
    from pq3d_tpu.eval.instseg_eval import InstSegEval
    n_seg = 32
    sizes = np.full(n_seg, 50.0)    # 50 verts per segment
    gt = np.zeros((1, n_seg), bool)
    gt[0, :8] = True
    q, n_cls = 4, 5
    cls_logits = np.full((q, n_cls + 1), -5.0, np.float32)
    mask_logits = np.full((n_seg, q), -10.0, np.float32)
    cls_logits[0, 2] = 8.0
    mask_logits[gt[0], 0] = 10.0
    # junk scored HIGHER: 1 segment = 50 verts < 100 -> official drops it,
    # greedy counts a top-ranked FP
    cls_logits[1, 2] = 10.0
    mask_logits[20, 1] = 10.0
    for i in (2, 3):
        cls_logits[i, n_cls] = 10.0
    batch = {"seg_pad_masks": np.ones((1, n_seg), bool),
             "segment_masks": gt[None], "instance_labels": np.array([[2]]),
             "instance_valid": np.ones((1, 1), bool),
             "segment_sizes": sizes[None]}
    out = {"predictions_class": [cls_logits[None]],
           "predictions_mask": [mask_logits[None]]}

    official = InstSegEval(topk_per_scene=10, num_classes=n_cls)
    official.update(out, batch)
    res_o = official.record()
    greedy = InstSegEval(topk_per_scene=10, num_classes=n_cls,
                         official_protocol=False)
    greedy.update(out, batch)
    res_g = greedy.record()
    assert res_o["all_ap"] > 0.99           # official value asserted
    assert res_g["all_ap"] < res_o["all_ap"]  # protocols disagree here
