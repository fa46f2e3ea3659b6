"""Optimizers + LR schedules (optax).

Replaces the reference's torch.optim builder, Lion implementation and
LambdaLR schedules (reference: optim/optimizer/optim.py, optim/optimizer/
lion.py:21-85, optim/scheduler/scheduler.py:5-22, optim/utils.py:1-18):

- AdamW / Adam / SGD / Lion by name
- no-weight-decay grouping for biases and norm params (optax mask)
- per-module learning-rate overrides (e.g. T5 head lr 1e-5,
  configs/unified_tasks_sceneverse.yaml:181) via scaling masks
- warmup_cosine / warmup_exp / constant schedules
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def no_decay_mask(params) -> Any:
    """True where weight decay applies: skip biases, LayerNorm/BatchNorm
    scales (ref optim/utils.py no_decay_param_group: 'norm'/'bias' excluded)."""
    def decide(path, x):
        name = _path_str(path).lower()
        if x.ndim <= 1:
            return False
        if "norm" in name or "bias" in name or "scale" in name:
            return False
        return True
    return jax.tree_util.tree_map_with_path(decide, params)


def make_schedule(name: str, lr: float, total_steps: int,
                  warmup_steps: int = 0, gamma: float = 0.1
                  ) -> optax.Schedule:
    """Reference-EXACT LR lambdas (ref optim/scheduler.py:5-17; pinned by
    tests/test_criterion_parity.py::test_schedule_curves_match_reference):
    linear warmup to step==warmup_steps, then cosine with a 1e-5 floor /
    gamma**(step/(total-warmup)) exponential / constant."""
    import math
    name = name or "constant"
    denom = max(total_steps - warmup_steps, 1)
    if name == "warmup_cosine":
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            lin = step / max(warmup_steps, 1)
            cos = jnp.maximum(
                0.5 * (1 + jnp.cos((step - warmup_steps) / denom * math.pi)),
                1e-5)
            mult = jnp.where((warmup_steps > 0) & (step <= warmup_steps),
                             lin, cos)
            return lr * mult
        return sched
    if name == "warmup_exp":
        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            lin = step / max(warmup_steps, 1)
            decay = jnp.power(gamma, step / denom)
            mult = jnp.where((warmup_steps > 0) & (step <= warmup_steps),
                             lin, decay)
            return lr * mult
        return sched
    if name == "constant":
        return optax.constant_schedule(lr)
    raise NotImplementedError(name)


def lr_scale_mask(params, module_lrs: Dict[str, float], base_lr: float) -> Any:
    """Per-parameter multiplier implementing per-module LR overrides
    (ref model get_opt_params, query3d_unified.py:224-238)."""
    def scale(path, x):
        name = _path_str(path)
        top = name.split("/", 1)[0]
        if top in module_lrs:
            return module_lrs[top] / base_lr
        return 1.0
    return jax.tree_util.tree_map_with_path(scale, params)


def build_optimizer(params, name: str = "AdamW", lr: float = 1e-4,
                    total_steps: int = 10000, warmup_steps: int = 0,
                    sched_name: str = "warmup_cosine",
                    betas=(0.9, 0.98), weight_decay: float = 0.01,
                    grad_norm: Optional[float] = None,
                    module_lrs: Optional[Dict[str, float]] = None,
                    accumulation_steps: int = 1,
                    gamma: float = 0.1
                    ) -> optax.GradientTransformation:
    schedule = make_schedule(sched_name, lr, total_steps, warmup_steps,
                             gamma=gamma)
    mask = no_decay_mask(params)
    name_l = name.lower()
    if name_l == "adamw":
        core = optax.adamw(schedule, b1=betas[0], b2=betas[1],
                           weight_decay=weight_decay, mask=mask)
    elif name_l == "adam":
        core = optax.adam(schedule, b1=betas[0], b2=betas[1])
    elif name_l == "sgd":
        core = optax.sgd(schedule, momentum=0.9)
    elif name_l == "lion":
        core = optax.lion(schedule, b1=betas[0], b2=betas[1],
                          weight_decay=weight_decay, mask=mask)
    else:
        raise NotImplementedError(name)

    chain = []
    if grad_norm is not None and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    chain.append(core)
    if module_lrs:
        scales = lr_scale_mask(params, module_lrs, lr)

        def update_fn(updates, state, params_=None):
            return jax.tree.map(lambda u, s: u * s, updates, scales), state
        chain.append(optax.GradientTransformation(
            lambda _: optax.EmptyState(), update_fn))
    tx = optax.chain(*chain)
    if accumulation_steps and accumulation_steps > 1:
        # gradient accumulation (ref trainer/build.py:71 Accelerator(...)
        # gradient_accumulation_steps + default_trainer.py:31)
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx, schedule


def build_from_config(cfg, params, total_steps: int):
    """Build (optimizer, schedule) from a solver config node
    (ref optim/build.py:10-14 + trainer/build.py:103).

    Warmup is the configured value, NOT scaled by the DP width: the
    reference multiplies warmup by ``cfg.num_gpu`` (ref
    optim/scheduler.py:20) but accelerate's ``AcceleratedScheduler.step``
    advances the wrapped LambdaLR ``num_processes`` times per optimizer
    step, so the two factors cancel — the net reference behavior is
    ``warmup_steps`` *optimizer* steps regardless of world size, which is
    exactly what a once-per-optimizer-step optax schedule needs."""
    solver = cfg.solver
    module_lrs = {}
    for head in cfg.model.get("heads", []) or []:
        node = cfg.model.get(head + "_head")
        if node is not None and node.get("lr") is not None:
            module_lrs[head + "_head"] = float(node.get("lr"))
    for enc in ("txt_encoder", "mv_encoder", "pc_encoder", "voxel_encoder"):
        node = cfg.model.get(enc)
        if node is not None and node.get("lr") is not None:
            module_lrs[enc] = float(node.get("lr"))
    return build_optimizer(
        params,
        name=solver.optim.get("name", "AdamW"),
        lr=float(solver.lr),
        total_steps=total_steps,
        warmup_steps=int(solver.sched.args.get("warmup_steps", 0)),
        sched_name=solver.sched.get("name", "warmup_cosine"),
        gamma=float(solver.sched.args.get("gamma", 0.1)),
        betas=tuple(solver.optim.args.get("betas", [0.9, 0.98])),
        weight_decay=float(solver.optim.args.get("weight_decay", 0.01)),
        grad_norm=float(solver.get("grad_norm", 0) or 0) or None,
        module_lrs=module_lrs or None,
        accumulation_steps=int(solver.get("gradient_accumulation_steps", 1)))
