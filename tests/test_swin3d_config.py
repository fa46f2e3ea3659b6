"""Config-driven Swin3D stage-1 path: instseg_swin3d_synthetic.yaml builds a
trainer whose voxel backbone is the window-attention U-Net, and one epoch
trains with finite loss (reference counterpart registration:
PCDMask3DSwin3DEncoder, modules/vision/pcd_mask3d_encoder.py:65)."""
import os

import numpy as np
import pytest

from pq3d_tpu.config import load_config, default_config_dir

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")


@pytest.fixture(scope="module")
def swin_trainer(tmp_path_factory):
    from pq3d_tpu.run import build_instseg_trainer
    tmp = tmp_path_factory.mktemp("exp")
    cfg = load_config(
        os.path.join(default_config_dir(), "instseg_swin3d_synthetic.yaml"),
        overrides=[
            "data.synthetic.num_train=2", "data.synthetic.num_val=2",
            "data.synthetic.n_points=1200", "data.synthetic.n_instances=4",
            "data.synthetic.n_segments=24",
            "data.instseg_options.num_queries=8",
            "data.instseg_options.max_segments=32",
            "data.instseg_options.max_instances=8",
            "data.instseg_options.voxel_bucket=2048",
            "data.instseg_options.level_caps=[2048, 1024, 512, 256, 128]",
            "model.hidden_size=32",
            "model.unified_encoder.args.num_attention_heads=4",
            "model.unified_encoder.args.num_layers=1",
            "model.unified_encoder.args.num_blocks=1",
            "model.voxel_encoder.args.hlevels=[0, 1]",
            "dataloader.batchsize=2", "dataloader.batchsize_eval=2",
            "dataloader.allow_single_device=True",
            "solver.epochs=1", "solver.epochs_per_eval=0",
            f"base_dir={tmp}", "exp_dir="])
    cfg.exp_dir = str(tmp / "run")
    return build_instseg_trainer(cfg)


def test_swin_batch_has_window_packs(swin_trainer):
    batch = next(iter(swin_trainer.train_data(0)))
    assert "nbr5_0" not in batch["maps"]
    for l in (1, 2, 3, 4):
        for j in (0, 1):
            assert f"win{l}s{j}_c2v" in batch["maps"]
            assert f"win{l}s{j}_slot" in batch["maps"]


def test_swin_trains_and_uses_swin_backbone(swin_trainer):
    metrics = swin_trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])
    params = swin_trainer._state.params
    vox = params["voxel_encoder"]["backbone"]
    assert "stage1" in vox and "stem" in vox
    assert "attn" in vox["stage1"]["block0"]
