"""Train state + jitted train/eval steps.

The reference's training step is imperative torch (forward -> loss ->
accelerator.backward -> clip -> optim.step -> sched.step, reference:
trainer/default_trainer.py:10-45).  Here the whole step is one jitted pure
function over a sharded batch: XLA fuses the backward pass, inserts the
gradient psum over the 'data' mesh axis, and updates parameters in place
(donated buffers).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    buffers: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, variables: Dict, optimizer: optax.GradientTransformation,
               rng: jax.Array) -> "TrainState":
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32),
                   params=params,
                   batch_stats=variables.get("batch_stats", FrozenDict()),
                   buffers=variables.get("buffers", FrozenDict()),
                   opt_state=optimizer.init(params),
                   rng=rng)

    def model_variables(self) -> Dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.buffers:
            v["buffers"] = self.buffers
        return v


LossFn = Callable[[Dict, Dict], Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]


def make_train_step(model, optimizer: optax.GradientTransformation,
                    loss_fn: LossFn, donate: bool = True):
    """Build the jitted train step: grads + psum (XLA-inserted) + update."""

    def step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        rng, dropout_rng = jax.random.split(state.rng)

        def compute_loss(params):
            variables = {"params": params, "buffers": state.buffers}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, updates = model.apply(
                variables, batch, train=True,
                rngs={"dropout": dropout_rng}, mutable=mutable)
            total, parts = loss_fn(out, batch)
            new_stats = updates.get("batch_stats", state.batch_stats) \
                if mutable else state.batch_stats
            return total, (parts, new_stats)

        (total, (parts, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total,
                   "grad_norm": optax.global_norm(grads), **parts}
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats,
                                  opt_state=opt_state, rng=rng)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_fn: Optional[LossFn] = None):
    def step(state: TrainState, batch: Dict) -> Dict:
        out = model.apply(state.model_variables(), batch, train=False)
        if loss_fn is not None:
            total, parts = loss_fn(out, batch)
            out = dict(out)
            out["eval_loss"] = total
        return out
    return jax.jit(step)
