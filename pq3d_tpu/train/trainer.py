"""Trainers: config-driven host orchestration of the jitted steps.

Mirrors the reference's trainer layer (reference: trainer/build.py,
trainer/default_trainer.py, trainer/query3d_trainer.py,
trainer/multitask_trainer.py): build dataloaders/model/optim/evaluator from
the config, run the epoch loop, log, checkpoint latest/best, resume.
TPU-native differences: one jitted train step (grads psum'd over the data
mesh), donated buffers, background-thread host pipeline.
"""
from __future__ import annotations

import os
import queue
import threading
import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.config import Config
from pq3d_tpu.parallel.mesh import MeshConfig, make_mesh, shard_batch
from pq3d_tpu.registry import TRAINER_REGISTRY
from pq3d_tpu.train.checkpoints import CheckpointManager
from pq3d_tpu.train.metrics import ExpTracker, MetricsLogger
from pq3d_tpu.train.state import TrainState, make_eval_step, make_train_step


def prefetch_batches(batch_iter: Iterable, n_prefetch: int = 2):
    """Background-thread prefetch so host preprocessing (voxelize, kernel
    maps, FPS) overlaps device compute — the reference relies on torch
    DataLoader workers for this (data/build.py:56-66)."""
    q: "queue.Queue" = queue.Queue(maxsize=n_prefetch)
    sentinel = object()

    def worker():
        try:
            for b in batch_iter:
                q.put(b)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is sentinel:
            break
        yield b


@TRAINER_REGISTRY.register(name="Query3DTrainer")
class Query3DTrainer:
    """Stage-1 (instseg) trainer (ref trainer/query3d_trainer.py:10-114)."""

    def __init__(self, cfg: Config, model, loss_fn, train_data, val_data=None,
                 evaluator=None, total_steps: Optional[int] = None,
                 mesh_cfg: MeshConfig = MeshConfig()):
        self.cfg = cfg
        self.model = model
        self.loss_fn = loss_fn
        self.train_data = train_data      # callable(epoch) -> batch iterable
        self.val_data = val_data
        self.evaluator = evaluator
        self.epochs = int(cfg.solver.epochs)
        self.epochs_per_eval = int(cfg.solver.get("epochs_per_eval", 0) or 0)
        self.exp_dir = cfg.get("exp_dir") or os.path.join(
            cfg.get("base_dir", "outputs"), cfg.get("name", "exp"))
        self.logger = MetricsLogger(self.exp_dir)
        self.tracker = ExpTracker()
        self.ckpt = CheckpointManager(os.path.join(self.exp_dir, "ckpt"))
        self.mesh = make_mesh(mesh_cfg) if len(jax.devices()) > 1 else None

        # init model/optimizer lazily on the first batch
        self._state: Optional[TrainState] = None
        self._train_step = None
        self._eval_step = None
        self._total_steps = total_steps

    def _lazy_init(self, batch):
        from pq3d_tpu.optim.optimizers import build_from_config
        rng = jax.random.key(int(self.cfg.get("rng_seed", 42)))
        p_rng, d_rng, s_rng = jax.random.split(rng, 3)
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            {"params": p_rng, "dropout": d_rng}, batch, train=False)
        total_steps = self._total_steps or (self.epochs * 1000)
        optimizer, self._schedule = build_from_config(
            self.cfg, variables["params"], total_steps)
        self._optimizer = optimizer
        self._state = TrainState.create(variables, optimizer, s_rng)
        self._train_step = make_train_step(self.model, optimizer, self.loss_fn)
        self._eval_step = make_eval_step(self.model, self.loss_fn)
        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        print(f"[trainer] initialized: {n_params/1e6:.2f}M params, "
              f"exp_dir={self.exp_dir}")
        if self.cfg.get("resume") and self.ckpt.exists("latest"):
            self._state, tr = self.ckpt.restore("latest", self._state)
            self.tracker.load_state_dict(tr)
            print(f"[trainer] resumed from epoch {self.tracker.epoch}")
        elif self.cfg.get("pretrain_ckpt_path"):
            self._warm_start(self.cfg.pretrain_ckpt_path)

    def _warm_start(self, path: str):
        from pq3d_tpu.train.checkpoints import load_pretrain
        state, _ = self.ckpt.__class__(path).restore("latest", self._state) \
            if os.path.isdir(os.path.join(path, "latest")) else (None, None)
        if state is not None:
            self._state = self._state.replace(
                params=load_pretrain(self._state.params, state.params))

    def _put(self, batch):
        batch = jax.tree.map(jnp.asarray, batch)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        t0 = time.time()
        last = {}
        n = 0
        for batch in prefetch_batches(self.train_data(epoch)):
            batch = self._put(batch)
            if self._state is None:
                self._lazy_init(batch)
            self._state, metrics = self._train_step(self._state, batch)
            last = metrics
            n += 1
            step = int(self._state.step)
            if step % int(self.cfg.get("log_every", 10)) == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["lr"] = float(self._schedule(step))
                self.logger.log(host, step)
        dt = time.time() - t0
        out = {k: float(v) for k, v in last.items()}
        out["epoch_time_s"] = dt
        out["batches"] = n
        return out

    def eval_epoch(self, epoch: int) -> Dict[str, float]:
        if self.val_data is None or self.evaluator is None:
            return {}
        self.evaluator.reset()
        for batch in prefetch_batches(self.val_data(epoch)):
            batch = self._put(batch)
            out = self._eval_step(self._state, batch)
            self.evaluator.update(jax.tree.map(np.asarray, out),
                                  jax.tree.map(np.asarray, batch))
        results = self.evaluator.record()
        self.logger.log(results, int(self._state.step), prefix="val")
        return results

    def run(self):
        for epoch in range(self.tracker.epoch, self.epochs):
            metrics = self.train_epoch(epoch)
            print(f"[epoch {epoch}] loss={metrics.get('loss', float('nan')):.4f} "
                  f"({metrics.get('batches', 0)} steps, "
                  f"{metrics.get('epoch_time_s', 0):.1f}s)")
            self.tracker.epoch = epoch + 1
            do_eval = self.epochs_per_eval and ((epoch + 1) % self.epochs_per_eval == 0)
            if do_eval:
                results = self.eval_epoch(epoch)
                target = results.get("target_metric", 0.0)
                if self.tracker.is_better(target):
                    self.ckpt.save("best", self._state,
                                   self.tracker.state_dict())
            self.ckpt.save("latest", self._state, self.tracker.state_dict())
        return self._state
