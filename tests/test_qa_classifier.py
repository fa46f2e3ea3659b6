"""Classifier-QA end-to-end: 'qa' head -> answer_label in the batch ->
BCE answer loss -> ScanQAEval ans@1/@10 (ref unifiedtask_wrapper.py:34-35,
optim/loss/loss.py:54-57, evaluator/scanqa_eval.py:28-64)."""
import os

import numpy as np
import pytest

from pq3d_tpu.config import load_config, default_config_dir


@pytest.fixture(scope="module")
def qa_trainer(tmp_path_factory):
    from pq3d_tpu.run import build_multitask_trainer
    tmp = tmp_path_factory.mktemp("exp")
    cfg = load_config(
        os.path.join(default_config_dir(), "unified_tasks_synthetic.yaml"),
        overrides=[
            "data.train=[SyntheticQA]",
            "data.synthetic.num_train=4", "data.synthetic.num_val=4",
            "data.synthetic.n_points=400", "data.synthetic.n_instances=4",
            "data.unified_options.max_obj_len=6",
            "data.unified_options.num_points=32",
            "data.unified_options.prompt_len=8",
            "data.unified_options.response_len=6",
            "dataloader.batchsize=4", "dataloader.batchsize_eval=4",
            "dataloader.allow_single_device=True",
            "model.hidden_size=32",
            "model.heads=[ground, generation, qa]",
            "model.qa_num_answers=3",  # COLORS vocab
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


def test_answer_label_in_batch(qa_trainer):
    batch = next(iter(qa_trainer.train_data(0)))
    assert "answer_label" in batch
    assert batch["answer_label"].shape == (4, 3)
    assert (batch["answer_label"].sum(-1) >= 1).all()


@pytest.mark.slow
def test_answer_loss_trains(qa_trainer):
    metrics = qa_trainer.train_epoch(0)
    assert "answer_loss" in metrics
    assert np.isfinite(metrics["answer_loss"])


def test_classifier_eval_ans_at_1_and_10(qa_trainer):
    results = qa_trainer.eval_epoch(0)
    assert "SyntheticQA/ans1_acc" in results
    assert "SyntheticQA/ans10_acc" in results
    assert 0.0 <= results["SyntheticQA/ans1_acc"] <= 1.0
    # vocab has 3 answers -> top-10 always contains the gt
    assert results["SyntheticQA/ans10_acc"] == 1.0
