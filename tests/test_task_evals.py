"""Task evaluators: grounding / QA / caption protocols."""
import numpy as np
import pytest

from pq3d_tpu.eval.grounding_eval import (ScanReferEval, ReferIt3DEval,
                                          Multi3DReferEval, aabb_iou)
from pq3d_tpu.eval.qa_eval import ScanQAEval, SQA3DGenEval
from pq3d_tpu.eval.caption_eval import Scan2CapEval
from pq3d_tpu.eval.caption_metrics import corpus_bleu, rouge_l, cider_d
from pq3d_tpu.eval.text_utils import clean_answer, answer_match


def test_scanrefer_eval_accuracy():
    ev = ScanReferEval()
    logits = np.array([[5.0, 0, 0], [0, 5.0, 0]], np.float32)
    batch = {
        "tgt_object_id": np.array([[0], [2]]),
        "tgt_object_id_iou25": np.array([[1, 0, 0], [0, 1, 0]]),
        "tgt_object_id_iou50": np.array([[1, 0, 0], [0, 0, 1]]),
        "is_multiple": np.array([False, True]),
    }
    ev.update({"og3d_logits": logits}, batch)
    r = ev.record()
    assert r["og_acc"] == pytest.approx(0.5)
    assert r["og_acc_iou25"] == pytest.approx(1.0)
    assert r["og_acc_iou50"] == pytest.approx(0.5)
    assert r["og_acc_iou50_unique"] == pytest.approx(1.0)
    assert r["og_acc_iou50_multiple"] == pytest.approx(0.0)
    assert r["target_metric"] == r["og_acc"]


def test_referit3d_splits():
    ev = ReferIt3DEval()
    logits = np.eye(4, 5, dtype=np.float32) * 5
    batch = {
        "tgt_object_id": np.array([[0], [1], [0], [3]]),
        "is_hard": np.array([True, False, True, False]),
        "is_view_dependent": np.array([False, True, False, True]),
    }
    ev.update({"og3d_logits": logits}, batch)
    r = ev.record()
    assert r["og_acc"] == pytest.approx(0.75)
    assert r["og_acc_hard"] == pytest.approx(0.5)
    assert r["og_acc_easy"] == pytest.approx(1.0)


def test_multi3drefer_f1():
    ev = Multi3DReferEval()
    # perfect: 2 predicted boxes match 2 gt
    boxes = np.array([[[0, 0, 0, 1, 1, 1], [2, 2, 2, 1, 1, 1],
                       [9, 9, 9, 1, 1, 1]]], np.float32)
    logits = np.array([[5.0, 5.0, -5.0]], np.float32)
    batch = {"obj_boxes": boxes,
             "tgt_obj_boxes": [boxes[0, :2]],
             "eval_type": ["mt"]}
    ev.update({"og3d_logits": logits}, batch)
    # zero-target with zero predictions -> f1 = 1
    batch2 = {"obj_boxes": boxes, "tgt_obj_boxes": [np.zeros((0, 6))],
              "eval_type": ["zt_wo_d"]}
    ev.update({"og3d_logits": np.array([[-5.0, -5.0, -5.0]])}, batch2)
    r = ev.record()
    assert r["iou50_overall"] == pytest.approx(1.0)
    assert r["iou50_mt"] == pytest.approx(1.0)
    assert r["iou50_zt_wo_d"] == pytest.approx(1.0)


def test_aabb_iou():
    a = np.array([0, 0, 0, 2, 2, 2], np.float32)
    assert aabb_iou(a, a) == pytest.approx(1.0)
    b = np.array([1, 0, 0, 2, 2, 2], np.float32)
    assert aabb_iou(a, b) == pytest.approx(1 / 3, rel=1e-5)


def test_scanqa_eval_topk():
    ev = ScanQAEval()
    scores = np.zeros((2, 20), np.float32)
    scores[0, 3] = 5
    scores[1, 4] = 5
    scores[1, 7] = 4
    label = np.zeros((2, 20))
    label[0, 3] = 1   # top1 correct
    label[1, 7] = 1   # only in top10
    ev.update({"answer_scores": scores}, {"answer_label": label})
    r = ev.record()
    assert r["ans1_acc"] == pytest.approx(0.5)
    assert r["ans10_acc"] == pytest.approx(1.0)


def test_sqa3d_gen_eval_and_clean_answer():
    assert clean_answer("The   Left one!") == "left one"
    assert clean_answer("3") == "three"
    assert answer_match("left", ["the left", "right"])
    ev = SQA3DGenEval()
    ev.update({"answer_pred": ["3 chairs", "blue"]},
              {"answers": [["three chairs"], ["red"]],
               "sqa_type": np.array([0, 2])})
    r = ev.record()
    assert r["ans1_acc"] == pytest.approx(0.5)
    assert r["what"] == pytest.approx(1.0)
    assert r["how"] == pytest.approx(0.0)


def test_caption_metrics_sanity():
    refs = {
        "a": ["the red chair next to the table",
              "a red chair beside the table"],
        "b": ["a wooden desk under the window"],
        "c": ["the small trash can near the door"],
    }
    perfect = {k: [v[0]] for k, v in refs.items()}
    bleus, _ = corpus_bleu(perfect, refs)
    assert bleus[3] == pytest.approx(1.0)
    assert rouge_l(perfect, refs) == pytest.approx(1.0)
    garbage = {k: ["completely unrelated words here now"] for k in refs}
    bleus2, _ = corpus_bleu(garbage, refs)
    assert bleus2[3] < 0.1
    assert cider_d(perfect, refs) > 1.0 > cider_d(garbage, refs)


def test_scan2cap_iou_gating():
    ev = Scan2CapEval()
    ev.update({"caption_pred": ["a red chair", "a blue sofa"]},
              {"corpus_key": ["o1", "o2"],
               "ref_captions": [["a red chair"], ["a blue sofa"]],
               "iou": np.array([0.6, 0.3])})
    r = ev.record()
    # o2 fails the 0.5 gate -> empty caption lowers metrics at 0.5
    assert r["cider@0.25"] > r["cider@0.5"] - 1e-9
    assert r["bleu4@0.25"] > r["bleu4@0.5"]
    assert r["target_metric"] == r["cider@0.5"]
