"""End-to-end stage-2: config -> build_multitask_trainer -> train 1 epoch ->
multi-dataset eval with generative decode (all on CPU, tiny sizes)."""
import os
import tempfile

import numpy as np
import pytest

from pq3d_tpu.config import load_config, default_config_dir


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    from pq3d_tpu.run import build_multitask_trainer
    tmp = tmp_path_factory.mktemp("exp")
    cfg = load_config(
        os.path.join(default_config_dir(), "unified_tasks_synthetic.yaml"),
        overrides=[
            "data.synthetic.num_train=4", "data.synthetic.num_val=4",
            "data.synthetic.n_points=400", "data.synthetic.n_instances=4",
            "data.unified_options.max_obj_len=6",
            "data.unified_options.num_points=32",
            "data.unified_options.prompt_len=8",
            "data.unified_options.response_len=6",
            "dataloader.batchsize=4", "dataloader.batchsize_eval=4",
            # 4 % 8 virtual devices != 0: single-device is deliberate here
            "dataloader.allow_single_device=True",
            "model.hidden_size=32",
            "model.txt_tower.width=16", "model.txt_tower.layers=1",
            "model.txt_tower.heads=2",
            "model.unified_encoder.args.num_attention_heads=4",
            "model.unified_encoder.args.num_layers=1",
            "model.generation_head.args.d_model=16",
            "model.generation_head.args.d_kv=4",
            "model.generation_head.args.d_ff=32",
            "model.generation_head.args.num_layers=1",
            "model.generation_head.args.num_heads=2",
            "model.generation_head.args.max_new_tokens=4",
            "model.ground_head.args.hidden_size=16",
            "solver.epochs=1", "solver.epochs_per_eval=1",
            f"base_dir={tmp}", "exp_dir="])
    cfg.exp_dir = str(tmp / "run")
    return build_multitask_trainer(cfg)


@pytest.mark.slow
def test_train_epoch_losses_finite(trainer):
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["loss"])
    assert metrics["batches"] == 3  # 3 datasets x 1 batch each
    assert "ground_loss" in metrics and "generation_loss" in metrics


def test_multi_dataset_eval(trainer):
    results = trainer.eval_epoch(0)
    # one evaluator per dataset, summed target
    assert "SyntheticRefer/og_acc" in results
    assert "SyntheticQA/ans1_acc" in results
    assert "SyntheticCaption/cider@0.5" in results
    assert "target_metric" in results
    assert all(np.isfinite(v) for v in results.values())


def _ensure_init(trainer):
    """The module-scoped trainer inits lazily on its first batch; don't
    depend on an earlier test in this file having run one."""
    if trainer._state is None:
        trainer.eval_epoch(0)


def test_checkpoint_roundtrip(trainer):
    _ensure_init(trainer)
    state = trainer._state
    trainer.ckpt.save("latest", state, trainer.tracker.state_dict())
    restored, tr = trainer.ckpt.restore("latest", state)
    import jax
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_roundtrip(trainer, tmp_path):
    """async_save overlaps the orbax commit with training; close() makes it
    durable, and consecutive overwrites of the same name stay serialized."""
    from pq3d_tpu.train.checkpoints import CheckpointManager
    _ensure_init(trainer)
    state = trainer._state
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    mgr.save("latest", state, {"epoch": 1, "best_result": 0.5})
    mgr.save("latest", state, {"epoch": 2, "best_result": 0.7})  # overwrite
    mgr.close()
    import jax
    restored, tr = mgr.restore("latest", state)
    assert tr["epoch"] == 2 and tr["best_result"] == 0.7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
