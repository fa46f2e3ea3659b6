"""Common-utility parity tests (SURVEY §2.13): io, boxes, metrics."""
import numpy as np
import pytest

from pq3d_tpu.utils import box_utils, io_utils, metric_utils


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    cols = np.random.default_rng(1).integers(0, 256, (50, 3)).astype(np.uint8)
    p = tmp_path / "cloud.ply"
    io_utils.save_ply(p, pts, cols)
    back = io_utils.load_ply(p)
    np.testing.assert_allclose(back["points"], pts, rtol=1e-6)
    np.testing.assert_array_equal(back["colors"], cols)


def test_json_jsonl_pickle_roundtrip(tmp_path):
    obj = {"a": 1, "b": [1, 2, 3]}
    io_utils.save_json(obj, tmp_path / "x.json")
    assert io_utils.load_json(tmp_path / "x.json") == obj
    rows = [{"i": i} for i in range(5)]
    io_utils.save_jsonl(rows, tmp_path / "x.jsonl")
    assert io_utils.load_jsonl(tmp_path / "x.jsonl") == rows
    io_utils.save_pickle(obj, tmp_path / "x.pkl")
    assert io_utils.load_pickle(tmp_path / "x.pkl") == obj


def test_box3d_iou_identity_and_disjoint():
    c = box_utils.get_3d_box([0, 0, 0], [2, 2, 2], 0.0)
    assert box_utils.box3d_iou(c, c) == pytest.approx(1.0, abs=1e-6)
    c2 = box_utils.get_3d_box([10, 0, 0], [2, 2, 2], 0.0)
    assert box_utils.box3d_iou(c, c2) == pytest.approx(0.0, abs=1e-9)


def test_box3d_iou_rotation_invariant_cube():
    # rotating a cube about z by 45deg against itself: known analytic overlap
    a = box_utils.get_3d_box([0, 0, 0], [2, 2, 2], 0.0)
    b = box_utils.get_3d_box([0, 0, 0], [2, 2, 2], np.pi / 4)
    iou = box_utils.box3d_iou(a, b)
    # octagon intersection area = 8*(sqrt(2)-1), volume/union analytic
    inter = 8 * (np.sqrt(2) - 1) * 2
    expect = inter / (8 + 8 - inter)
    assert iou == pytest.approx(expect, rel=1e-3)


def test_box3d_iou_half_shift():
    a = box_utils.get_3d_box([0, 0, 0], [2, 2, 2], 0.0)
    b = box_utils.get_3d_box([1, 0, 0], [2, 2, 2], 0.0)
    assert box_utils.box3d_iou(a, b) == pytest.approx(1 / 3, rel=1e-4)


def test_aabb_iou_matches_box3d_for_axis_aligned():
    rng = np.random.default_rng(2)
    for _ in range(10):
        ca, cb = rng.normal(size=(2, 3))
        sa, sb = rng.uniform(0.5, 2.0, (2, 3))
        a = np.concatenate([ca, sa])
        b = np.concatenate([cb, sb])
        v1 = box_utils.aabb_iou(a, b)
        v2 = box_utils.box3d_iou(box_utils.get_3d_box(ca, sa),
                                 box_utils.get_3d_box(cb, sb))
        assert v1 == pytest.approx(v2, abs=1e-5)


def test_confusion_matrix():
    cm = metric_utils.ConfusionMatrix(3)
    cm.add(np.array([0, 1, 2, 2]), np.array([0, 1, 1, -100]))
    m = cm.metrics()
    # class0: tp=1 union=1 -> 1.0; class1: tp=1 union=2 -> 0.5; class2 absent
    np.testing.assert_allclose(cm.per_class_iou()[:2], [1.0, 0.5])
    assert m["oacc"] == pytest.approx(2 / 3)


def test_points_to_aabb():
    pts = np.array([[0, 0, 0], [2, 4, 6]], np.float32)
    box = box_utils.points_to_aabb(pts)
    np.testing.assert_allclose(box, [1, 2, 3, 2, 4, 6])


def test_preemption_checkpoint(tmp_path):
    """SIGUSR1-style preemption: the step loop saves 'latest' and stops
    (ref submitit requeue flow, common/launch_utils.py:60-74)."""
    from pq3d_tpu.config.config import Config
    from pq3d_tpu.train.trainer import Query3DTrainer

    class DummyTrainer(Query3DTrainer):
        def _lazy_init(self, batch):
            pass

    cfg = Config({"solver": {"epochs": 1},
                  "dataloader": {"batchsize": 1,
                                 "allow_single_device": True},
                  "exp_dir": str(tmp_path)})
    tr = DummyTrainer(cfg, model=None, loss_fn=None,
                      train_data=lambda e: iter([]))
    tr._preempted = True
    saved = {}
    tr.ckpt = type("C", (), {
        "save": lambda self, name, state, tracker: saved.update(
            {"name": name}),
        "exists": lambda self, name: False,
        "close": lambda self: saved.update({"closed": True})})()
    tr._state = object()
    assert tr._handle_preemption()
    assert saved["name"] == "latest"
    assert saved.get("closed")  # must be durable before the requeue kill


def test_launch_submit_writes_sbatch(tmp_path, monkeypatch):
    """submit mode writes a requeueing sbatch script."""
    import pq3d_tpu.launch as launch
    calls = {}
    monkeypatch.setattr(launch.subprocess, "run",
                        lambda *a, **k: calls.update({"cmd": a[0]}))
    sb = str(tmp_path / "job.sbatch")
    launch.main(["--mode", "submit", "--nodes", "2",
                 "--sbatch-file", sb, "--",
                 "--config-name", "instseg_sceneverse.yaml"])
    text = open(sb).read()
    assert "#SBATCH --requeue" in text
    assert "--signal=USR1@120" in text
    assert "--nodes=2" in text
    assert "resume=True" in text
    assert calls["cmd"][0] == "sbatch"
