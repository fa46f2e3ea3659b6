"""Box-detection AP parity vs the reference's eval_det (common/eval_det.py
VOC-style AP with greedy confidence-ordered matching — pure numpy)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref_det():
    from _ref_stubs import install
    install()
    import importlib
    return importlib.import_module("common.eval_det")


def _boxes(rng, n):
    c = rng.uniform(-3, 3, (n, 3))
    s = rng.uniform(0.3, 1.5, (n, 3))
    return np.concatenate([c, s], axis=1).astype(np.float64)


def test_box_ap_matches_reference(ref_det):
    from pq3d_tpu.eval.instseg_eval import InstSegEval

    rng = np.random.default_rng(2)
    classes = [4, 7]
    pred_all, gt_all = {}, {}
    our_preds, our_gts = [], []
    for scene in range(3):
        n_gt = int(rng.integers(3, 6))
        gt_boxes = _boxes(rng, n_gt)
        gt_labels = rng.choice(classes, n_gt)
        gt_all[scene] = [(int(l), b) for l, b in zip(gt_labels, gt_boxes)]
        preds = []
        for i in range(n_gt):
            if rng.random() < 0.8:  # jittered true positive candidate
                b = gt_boxes[i].copy()
                b[:3] += rng.normal(0, 0.15, 3)
                b[3:] *= rng.uniform(0.85, 1.15, 3)
                lab = int(gt_labels[i] if rng.random() < 0.85
                          else rng.choice(classes))
                preds.append((lab, b, float(rng.random())))
        for _ in range(2):          # spurious
            preds.append((int(rng.choice(classes)), _boxes(rng, 1)[0],
                          float(rng.random())))
        pred_all[scene] = [(l, b, s) for l, b, s in preds]
        our_preds.append([{"class": l, "box": b, "score": s}
                          for l, b, s in preds])
        our_gts.append({"labels": gt_labels, "boxes": gt_boxes})

    ev = InstSegEval.__new__(InstSegEval)
    ev._preds = our_preds
    ev._gts = our_gts

    def box_iou(p, gt, g):
        return ref_det.calc_iou(p["box"], gt["boxes"][g])

    for thresh in (0.25, 0.5):
        rec, prec, ap = ref_det.eval_det(pred_all, gt_all,
                                         ovthresh=thresh,
                                         get_iou_func=ref_det.get_iou)
        table = ev._ap_table(classes, np.array([thresh]), box_iou)
        for ci, cls in enumerate(classes):
            np.testing.assert_allclose(table[0, ci], ap[cls], rtol=1e-9,
                                       err_msg=f"class {cls} @{thresh}")
