import os
import tempfile

import pytest

from pq3d_tpu.config import Config, load_config


def _write(tmpdir, text):
    p = os.path.join(tmpdir, "c.yaml")
    with open(p, "w") as f:
        f.write(text)
    return p


def test_interpolation_and_overrides():
    with tempfile.TemporaryDirectory() as d:
        p = _write(d, """
model:
  hidden_size: 768
  memories: [voxel, mv, pc]
  encoder:
    hidden_size: ${model.hidden_size}
    memories: ${model.memories}
name: "h${model.hidden_size}"
""")
        cfg = load_config(p, overrides=["model.hidden_size=512",
                                        "solver.lr=1e-4",
                                        "data.train=[a,b]"])
        assert cfg.model.encoder.hidden_size == 512
        assert cfg.model.encoder.memories == ["voxel", "mv", "pc"]
        assert cfg.name == "h512"
        assert cfg.solver.lr == pytest.approx(1e-4)
        assert cfg.data.train == ["a", "b"]


def test_config_mapping_protocol():
    cfg = Config({"a": {"b": 1}, "l": [1, {"x": 2}]})
    assert cfg.a.b == 1
    assert cfg["l"][1].x == 2
    assert cfg.select("a.b") == 1
    assert cfg.select("a.missing", 42) == 42
    cfg.set_dotted("a.c.d", 3)
    assert cfg.a.c.d == 3
    d = cfg.to_dict()
    assert isinstance(d["a"], dict)


def test_update_merges_recursively():
    cfg = Config({"a": {"b": 1, "c": 2}})
    cfg.update({"a": {"b": 9}, "d": 4})
    assert cfg.a.b == 9 and cfg.a.c == 2 and cfg.d == 4


def test_experiment_name_naming_keywords():
    from pq3d_tpu.run import experiment_name
    cfg = Config({
        "name": "pq3d", "task": "Query3D",
        "naming_keywords": ["task", "dataloader.batchsize", "solver.lr"],
        "data": {"train": ["A", "B"]},
        "dataloader": {"batchsize": 4},
        "solver": {"lr": 0.0001},
        "debug": {"flag": False},
    })
    name = experiment_name(cfg)
    assert name.startswith("pq3d_Query3D_A+B_b")
    assert name.endswith("_0.0001")
    cfg.debug.flag = True
    assert experiment_name(cfg) == "Debug_test"


def test_resume_reloads_snapshot(tmp_path):
    import os
    import yaml
    from pq3d_tpu.config import load_config
    exp = tmp_path / "exp"
    exp.mkdir()
    snap = {"name": "orig", "solver": {"lr": 0.5}, "exp_dir": str(exp)}
    with open(exp / "config.yaml", "w") as f:
        yaml.safe_dump(snap, f)
    # simulate the run.py resume path
    cfg = load_config(str(exp / "config.yaml"))
    assert cfg.name == "orig" and float(cfg.solver.lr) == 0.5
