"""Optimizer construction: wd masks, per-module LR, schedules, accumulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pq3d_tpu.optim.optimizers import (build_optimizer, make_schedule,
                                       no_decay_mask, lr_scale_mask)


def fake_params():
    return {
        "ground_head": {"dense": {"kernel": jnp.ones((4, 4)),
                                  "bias": jnp.zeros(4)}},
        "encoder": {"norm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                    "proj": {"kernel": jnp.ones((4, 4))}},
    }


def test_no_decay_mask():
    m = no_decay_mask(fake_params())
    assert m["ground_head"]["dense"]["kernel"] is True
    assert m["ground_head"]["dense"]["bias"] is False
    assert m["encoder"]["norm"]["scale"] is False


def test_lr_scale_mask():
    s = lr_scale_mask(fake_params(), {"ground_head": 1e-5}, 1e-4)
    assert s["ground_head"]["dense"]["kernel"] == pytest.approx(0.1)
    assert s["encoder"]["proj"]["kernel"] == 1.0


def test_schedules():
    s = make_schedule("warmup_cosine", 1e-4, 100, warmup_steps=10)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-4)
    assert float(s(100)) < 1e-5
    c = make_schedule("constant", 3e-4, 100)
    assert float(c(50)) == pytest.approx(3e-4)


def test_per_module_lr_updates():
    params = fake_params()
    tx, _ = build_optimizer(params, lr=1.0, sched_name="constant",
                            total_steps=10, module_lrs={"ground_head": 0.1})
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    head = float(jnp.abs(updates["ground_head"]["dense"]["kernel"]).mean())
    enc = float(jnp.abs(updates["encoder"]["proj"]["kernel"]).mean())
    assert head == pytest.approx(enc * 0.1, rel=1e-3)


def test_gradient_accumulation():
    params = {"w": jnp.zeros(3)}
    tx, _ = build_optimizer(params, name="sgd", lr=1.0, sched_name="constant",
                            total_steps=10, accumulation_steps=2)
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    up1, state = tx.update(g, state, params)
    assert float(jnp.abs(up1["w"]).max()) == 0  # accumulated, not applied
    up2, state = tx.update(g, state, params)
    assert float(jnp.abs(up2["w"]).max()) > 0


def test_grad_clip():
    params = {"w": jnp.zeros(4)}
    tx, _ = build_optimizer(params, name="sgd", lr=1.0, sched_name="constant",
                            total_steps=10, grad_norm=1.0)
    state = tx.init(params)
    g = {"w": jnp.full(4, 100.0)}
    up, _ = tx.update(g, state, params)
    import optax
    assert float(optax.global_norm(up)) <= 1.0 + 1e-5


def test_build_from_config_plumbs_gamma_and_wd():
    """solver.sched.args.gamma / solver.optim.args.weight_decay must reach
    the schedule and optimizer (they were silently dropped once)."""
    from pq3d_tpu.config import Config
    from pq3d_tpu.optim.optimizers import build_from_config

    def cfg_for(gamma):
        return Config({
            "model": {"heads": []},
            "solver": {"lr": 1e-4,
                       "optim": {"name": "AdamW",
                                 "args": {"weight_decay": 0.5}},
                       "sched": {"name": "warmup_exp",
                                 "args": {"warmup_steps": 0,
                                          "gamma": gamma}}}})

    params = fake_params()
    _tx, s_slow = build_from_config(cfg_for(0.9), params, total_steps=100)
    _tx, s_fast = build_from_config(cfg_for(0.001), params, total_steps=100)
    # gamma=0.9 keeps ~90% of lr at the end; gamma=0.001 collapses it
    assert float(s_slow(100)) == pytest.approx(0.9e-4, rel=1e-3)
    assert float(s_fast(100)) == pytest.approx(0.001e-4, rel=1e-3)

    # weight_decay reaches optax.adamw: a pure-decay update (zero grads)
    # shrinks a kernel param by lr * schedule * wd
    tx, _s = build_from_config(cfg_for(0.9), params, total_steps=100)
    state = tx.init(params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    upd, _ = tx.update(zeros, state, params)
    k = upd["encoder"]["proj"]["kernel"]
    assert float(jnp.abs(k).max()) > 0  # decay applied


def test_warmup_matches_reference_net_semantics():
    """Reference NET parity, any DP width: the reference multiplies warmup
    by cfg.num_gpu (ref optim/scheduler.py:20) BUT accelerate's
    AcceleratedScheduler advances the wrapped LambdaLR num_processes times
    per optimizer step, so the effective warmup is warmup_steps *optimizer*
    steps regardless of world size.  Our once-per-optimizer-step schedule
    with the unscaled warmup must equal the reference lambda evaluated at
    step*num_gpu with warmup*num_gpu, for every world size."""
    import math

    from pq3d_tpu.config import Config
    from pq3d_tpu.optim.optimizers import build_from_config

    def ref_lambda(s, warmup, total):
        # ref optim/scheduler.py:5-9 warmup_cosine, in LambdaLR units
        if s <= warmup and warmup > 0:
            return s / warmup
        return max(0.5 * (1 + math.cos((s - warmup) / (total - warmup)
                                       * math.pi)), 1e-5)

    warmup, opt_steps, lr = 100, 2500, 1e-3
    cfg = Config({
        "model": {"heads": []},
        "solver": {"lr": lr,
                   "optim": {"name": "AdamW", "args": {}},
                   "sched": {"name": "warmup_cosine",
                             "args": {"warmup_steps": warmup}}}})
    params = fake_params()
    _tx, sched = build_from_config(cfg, params, total_steps=opt_steps)
    for num_gpu in (1, 4):
        # the reference passes total_steps in pre-`prepare` loader units =
        # optimizer steps * num_gpu (ref trainer/build.py:102)
        for t in (0, 25, 100, 400, 2000, 2500):
            want = lr * ref_lambda(t * num_gpu, warmup * num_gpu,
                                   opt_steps * num_gpu)
            assert float(sched(t)) == pytest.approx(want, rel=1e-5), \
                (num_gpu, t)
    # warmup completes at the configured step count, DP-invariant
    assert float(sched(warmup)) == pytest.approx(lr, rel=1e-4)
