"""Full-resolution instseg eval: segment->point reconstruction path."""
import numpy as np

from pq3d_tpu.eval.instseg_eval import InstSegEval


def test_full_resolution_reconstruction():
    rng = np.random.default_rng(0)
    # instances must clear the official 100-vert min-region gate
    n_seg, n_pts, n_cls, q = 8, 2000, 5, 4
    seg_to_full = rng.integers(0, n_seg, n_pts)
    # gt: instance 0 = segments {0,1}, instance 1 = segments {2,3}
    seg_masks = np.zeros((2, n_seg), bool)
    seg_masks[0, [0, 1]] = True
    seg_masks[1, [2, 3]] = True
    full_gt = np.stack([seg_masks[i][seg_to_full] for i in range(2)])
    labels = np.array([1, 3])

    cls_logits = np.full((q, n_cls + 1), -5.0, np.float32)
    mask_logits = np.full((n_seg, q), -10.0, np.float32)
    for i in range(2):
        cls_logits[i, labels[i]] = 10.0
        mask_logits[seg_masks[i], i] = 10.0
    cls_logits[2:, n_cls] = 10.0

    batch = {
        "seg_pad_masks": np.ones((1, n_seg), bool),
        "segment_masks": seg_masks[None],
        "instance_labels": labels[None],
        "instance_valid": np.ones((1, 2), bool),
        "_meta": {"segment_to_full": [seg_to_full],
                  "full_instance_masks": [full_gt]},
    }
    out = {"predictions_class": [cls_logits[None]],
           "predictions_mask": [mask_logits[None]]}

    ev = InstSegEval(topk_per_scene=10, num_classes=n_cls,
                     full_resolution=True)
    ev.update(out, batch)
    res = ev.record()
    assert res["all_ap"] > 0.99
    # predictions now live in point space
    assert ev._preds[0][0]["mask"].shape == (n_pts,)
