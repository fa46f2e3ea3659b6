"""Full trainer.run() loop: epoch advance, latest checkpoint, and periodic
numbered checkpoints (ref trainer/build.py:54 epochs_per_save +
default_trainer.py:100-104 latest/best/ckpt_N saves)."""
import os

import pytest

from pq3d_tpu.config import load_config, default_config_dir

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")


@pytest.fixture(scope="module")
def run_trainer(tmp_path_factory):
    from pq3d_tpu.run import build_instseg_trainer
    tmp = tmp_path_factory.mktemp("exp")
    cfg = load_config(
        os.path.join(default_config_dir(), "instseg_synthetic.yaml"),
        overrides=[
            "data.synthetic.num_train=2", "data.synthetic.num_val=2",
            "data.synthetic.n_points=1200", "data.synthetic.n_instances=4",
            "data.synthetic.n_segments=24",
            "data.instseg_options.query_sample_strategy=gt",
            "data.instseg_options.num_queries=8",
            "data.instseg_options.max_segments=32",
            "data.instseg_options.max_instances=8",
            "data.instseg_options.voxel_bucket=2048",
            "data.instseg_options.level_caps=[2048, 1024, 512, 256, 128]",
            "model.hidden_size=32",
            "model.unified_encoder.args.num_attention_heads=4",
            "model.unified_encoder.args.num_layers=1",
            "model.unified_encoder.args.num_blocks=1",
            "model.voxel_encoder.args.hlevels=[0]",
            "dataloader.batchsize=2", "dataloader.batchsize_eval=2",
            "dataloader.allow_single_device=True",
            "solver.epochs=2", "solver.epochs_per_eval=0",
            "solver.epochs_per_save=1",
            f"base_dir={tmp}", "exp_dir="])
    cfg.exp_dir = str(tmp / "run")
    trainer = build_instseg_trainer(cfg)
    trainer.run()
    return trainer


def test_run_advances_epochs(run_trainer):
    assert run_trainer.tracker.epoch == 2


def test_run_saves_latest_and_numbered(run_trainer):
    assert run_trainer.ckpt.exists("latest")
    # epochs_per_save=1 -> one numbered checkpoint per epoch
    assert run_trainer.ckpt.exists("ckpt_1")
    assert run_trainer.ckpt.exists("ckpt_2")


def test_numbered_checkpoint_restores(run_trainer):
    state, tracker_state = run_trainer.ckpt.restore(
        "ckpt_1", run_trainer._state)
    assert tracker_state["epoch"] == 1
