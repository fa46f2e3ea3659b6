"""GT-query stage-1 variant (ref instseg_sceneverse_gt.yaml): GT-centered
queries, GT offline attention masks, direct (no-Hungarian) criterion."""
import os

import numpy as np
import pytest

from pq3d_tpu.config import load_config, default_config_dir

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")


@pytest.fixture(scope="module")
def gt_trainer(tmp_path_factory):
    from pq3d_tpu.run import build_instseg_trainer
    tmp = tmp_path_factory.mktemp("exp")
    cfg = load_config(
        os.path.join(default_config_dir(), "instseg_synthetic.yaml"),
        overrides=[
            "data.synthetic.num_train=2", "data.synthetic.num_val=2",
            "data.synthetic.n_points=1200", "data.synthetic.n_instances=4",
            "data.synthetic.n_segments=24",
            "data.instseg_options.query_sample_strategy=gt",
            "data.instseg_options.offline_mask_source=gt",
            "data.instseg_options.num_queries=8",
            "data.instseg_options.max_segments=32",
            "data.instseg_options.max_instances=8",
            "data.instseg_options.voxel_bucket=2048",
            "data.instseg_options.level_caps=[2048, 1024, 512, 256, 128]",
            "model.use_offline_attn_mask=True",
            "model.InstSegLoss.criterion_type=direct",
            "model.hidden_size=32",
            "model.unified_encoder.args.num_attention_heads=4",
            "model.unified_encoder.args.num_layers=1",
            "model.unified_encoder.args.num_blocks=1",
            "model.voxel_encoder.args.hlevels=[0]",
            "dataloader.batchsize=2", "dataloader.batchsize_eval=2",
            "dataloader.allow_single_device=True",
            "solver.epochs=1", "solver.epochs_per_eval=0",
            f"base_dir={tmp}", "exp_dir="])
    cfg.exp_dir = str(tmp / "run")
    return build_instseg_trainer(cfg)


def test_offline_attn_mask_in_batch(gt_trainer):
    batch = next(iter(gt_trainer.train_data(0)))
    assert "offline_attn_mask" in batch
    oam = batch["offline_attn_mask"]
    assert oam.shape == (2, 8, 32) and oam.dtype == bool
    # GT-query mode: query i attends exactly instance i's segments
    assert (oam == batch["segment_masks"][:, :8, :32]).all()
    # queries sit at GT object centers
    n = batch["instance_valid"][0].sum()
    np.testing.assert_allclose(batch["query_locs"][0, :n],
                               batch["obj_center"][0, :n], atol=1e-5)


def test_direct_criterion_trains(gt_trainer):
    metrics = gt_trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])
    assert any(k.startswith("loss_ce") for k in metrics)
    assert any(k.startswith("loss_dice") for k in metrics)
