"""Official ScanNet AP protocol parity vs the ACTUAL reference benchmark
code (common/eval_instseg.py — pure numpy, imported directly).

Fuzzes random scenes (instances of mixed sizes incl. sub-min_region, void
points, group instances, noisy + spurious predictions) through both
implementations and compares the full (overlap x class) AP matrix and the
all_ap / ap50 / ap25 averages.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref_eval():
    from _ref_stubs import install
    install()
    import importlib
    mod = importlib.import_module("common.eval_instseg")
    return mod


def _make_scene(rng, n=1500, valid_ids=None):
    """Random scene: returns (gt_ids (n,), preds list for the reference,
    our-format scene dict)."""
    gt_ids = np.zeros(n, np.int64)
    our_masks, our_labels = [], []
    n_inst = rng.integers(3, 7)
    cursor = 0
    for i in range(n_inst):
        size = int(rng.choice([40, 80, 150, 300, 500]))  # some < 100
        if cursor + size > n:
            break
        label = int(rng.choice(valid_ids))
        inst_id = label * 1000 + i + 1
        gt_ids[cursor:cursor + size] = inst_id
        m = np.zeros(n, bool)
        m[cursor:cursor + size] = True
        our_masks.append(m)
        our_labels.append(label)
        cursor += size
    # a "group" instance (instance_id < 1000): ignore mass, not a target
    if cursor + 120 <= n:
        gt_ids[cursor:cursor + 120] = int(rng.choice(valid_ids))
        cursor += 120
    # remaining points: void (label 1 = wall, not in valid ids)
    gt_ids[cursor:] = 1 * 1000 + 999

    preds = []
    k = 0
    for i, m in enumerate(our_masks):
        if rng.random() < 0.85:          # noisy copy of a gt mask
            pm = m.copy()
            flip = rng.random(n) < 0.05
            pm = np.logical_xor(pm, flip & (rng.random(n) < 0.5))
            label = our_labels[i] if rng.random() < 0.8 \
                else int(rng.choice(valid_ids))
            preds.append((pm, label, float(rng.random())))
            k += 1
    for _ in range(3):                   # spurious blobs
        start = int(rng.integers(0, n - 200))
        size = int(rng.choice([50, 150, 250]))
        pm = np.zeros(n, bool)
        pm[start:start + size] = True
        preds.append((pm, int(rng.choice(valid_ids)), float(rng.random())))

    ours = {
        "preds": [{"mask": pm, "class": c, "score": s}
                  for pm, c, s in preds],
        "gt_masks": np.stack(our_masks) if our_masks
        else np.zeros((0, n), bool),
        "gt_labels": np.asarray(our_labels, np.int64),
    }
    return gt_ids, preds, ours


def test_ap_protocol_matches_reference(ref_eval, tmp_path):
    from pq3d_tpu.eval.scannet_protocol import (OVERLAPS, average_aps,
                                                evaluate_scannet_ap)
    valid_ids = ref_eval.VALID_CLASS_IDS
    # same threshold SET; the reference appends 0.25 last, ours is sorted
    np.testing.assert_allclose(sorted(OVERLAPS),
                               sorted(ref_eval.opt["overlaps"]))
    remap = [int(np.argmin(np.abs(OVERLAPS - o)))
             for o in ref_eval.opt["overlaps"]]

    rng = np.random.default_rng(7)
    matches = {}
    our_scenes = []
    for si in range(3):
        gt_ids, preds, ours = _make_scene(rng, valid_ids=valid_ids)
        gt_file = tmp_path / f"scene{si}.txt"
        gt_file.write_text("\n".join(str(int(x)) for x in gt_ids))
        pred = {
            "pred_masks": np.stack([p[0] for p in preds], axis=1).astype(
                np.uint8),
            "pred_classes": np.asarray([p[1] for p in preds]),
            "pred_scores": np.asarray([p[2] for p in preds]),
        }
        gt2pred, pred2gt = ref_eval.assign_instances_for_scan(
            pred, str(gt_file))
        matches[f"scene{si}"] = {"gt": gt2pred, "pred": pred2gt}
        our_scenes.append(ours)

    ref_ap = ref_eval.evaluate_matches(matches)[0]   # (classes, overlaps)
    avgs = ref_eval.compute_averages(
        ref_ap[None])                                # dict of averages

    our_ap = evaluate_scannet_ap(our_scenes, list(valid_ids))
    # same matrix (ours is overlaps x classes, reference threshold order)
    np.testing.assert_allclose(our_ap[remap].T, ref_ap, rtol=1e-9,
                               atol=1e-12)

    all_ap, ap50, ap25 = average_aps(our_ap)
    np.testing.assert_allclose(all_ap, avgs["all_ap"], rtol=1e-9)
    np.testing.assert_allclose(ap50, avgs["all_ap_50%"], rtol=1e-9)
    np.testing.assert_allclose(ap25, avgs["all_ap_25%"], rtol=1e-9)
