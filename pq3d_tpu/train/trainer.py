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
from typing import Any, Dict, Iterable, Optional

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
    err: list = []

    def worker():
        try:
            for b in batch_iter:
                q.put(b)
        except BaseException as e:   # propagate to the consumer — a dead
            err.append(e)            # loader must fail the step loop, not
        finally:                     # silently end the epoch at 0 batches
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is sentinel:
            if err:
                raise RuntimeError("data loader thread failed") from err[0]
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
        # periodic numbered checkpoints alongside latest/best
        # (ref trainer/build.py:54 + default_trainer.py:103 ckpt_N.pth)
        self.epochs_per_save = int(cfg.solver.get("epochs_per_save", 0) or 0)
        self.exp_dir = cfg.get("exp_dir") or os.path.join(
            cfg.get("base_dir", "outputs"), cfg.get("name", "exp"))
        self.logger = MetricsLogger(self.exp_dir)
        self.tracker = ExpTracker()
        self.ckpt = CheckpointManager(
            os.path.join(self.exp_dir, "ckpt"),
            async_save=bool(cfg.solver.get("async_ckpt", False)))
        # opt-in XLA trace, schedule like the reference's torch.profiler
        # (ref trainer/multitask_trainer.py:30-44 wait/warmup/active)
        from pq3d_tpu.utils.profiling import StepProfiler
        self.profiler = StepProfiler(
            os.path.join(self.exp_dir, "trace"),
            wait=int(cfg.get("profile_wait", 10)),
            active=int(cfg.get("profile_active", 10)),
            enabled=bool(cfg.get("profile", False)))
        self.mesh_cfg = mesh_cfg
        n_dev = len(jax.devices())
        bs = int(cfg.dataloader.batchsize)
        if bool(cfg.dataloader.get("force_single_device", False)):
            # set by run.py for flat serving layouts (flat_pack/flat_obj):
            # their flat arrays have no batch dim for the dp rule to split,
            # so a mesh must not be built even when bs % n_dev == 0
            if n_dev > 1:
                print(f"[trainer] force_single_device — running on one of "
                      f"{n_dev} devices (flat layout)")
            self.mesh = None
        elif n_dev > 1:
            # the batch shards over the 'data' axis only — fsdp/tp axes
            # replicate it, so divisibility is against dp, not n_dev
            dp = (mesh_cfg.data if mesh_cfg.data > 0
                  else n_dev // (mesh_cfg.fsdp * mesh_cfg.tp))
            if bs % max(dp, 1) != 0:
                # never fall back silently to one device — on a pod that is
                # a silent n_dev x throughput cliff.  Either fix the config
                # or opt into the fallback explicitly.
                if not bool(cfg.dataloader.get("allow_single_device", False)):
                    raise ValueError(
                        f"dataloader.batchsize={bs} is not divisible by "
                        f"dp={dp} (of {n_dev} devices); set a divisible "
                        f"batchsize or dataloader.allow_single_device=True "
                        f"to run on one device deliberately")
                print(f"[trainer] batchsize {bs} not divisible by dp={dp} "
                      f"— running single-device (explicit opt-in)")
                self.mesh = None
            else:
                self.mesh = make_mesh(mesh_cfg)
        else:
            self.mesh = None

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
        # warmup is NOT scaled by DP width: the reference's
        # warmup_steps * num_gpu (ref optim/scheduler.py:20) cancels
        # against AcceleratedScheduler advancing the LambdaLR
        # num_processes times per optimizer step
        optimizer, self._schedule = build_from_config(
            self.cfg, variables["params"], total_steps)
        self._optimizer = optimizer
        self._state = TrainState.create(variables, optimizer, s_rng)
        if self.mesh is not None:
            # apply the configured param shardings (fsdp/tp; pure-DP
            # MeshConfig yields P() == replicated for every param).  The
            # batch is sharded per-step in _put; XLA inserts the
            # grad-psum / fsdp all-gathers / tp collectives from these
            # annotations alone (scaling-book recipe).
            from pq3d_tpu.parallel.mesh import shard_params
            self._state = self._state.replace(
                params=shard_params(self._state.params, self.mesh,
                                    self.mesh_cfg),
                opt_state=shard_params(self._state.opt_state, self.mesh,
                                       self.mesh_cfg))
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
        """Warm-start weights from an orbax dir OR reference torch
        ``pytorch_model*.bin`` checkpoints (ref trainer/build.py:176-186
        glob + non-strict load)."""
        from pq3d_tpu.train.checkpoints import load_pretrain
        orbax_dir = None
        for cand in (os.path.join(path, "latest"), path):
            if os.path.isdir(cand) and os.path.exists(
                    os.path.join(cand, "_CHECKPOINT_METADATA")):
                orbax_dir = cand
                break
        if orbax_dir:
            # Target-free restore: a stage-1 checkpoint's state tree does
            # NOT match the stage-2 state template (different model/opt),
            # so restore the raw pytree and copy leaves non-strictly —
            # reference semantics (strict=False, trainer/build.py:176-186).
            import orbax.checkpoint as ocp
            raw = ocp.StandardCheckpointer().restore(orbax_dir)
            pre = raw.get("state", raw)
            repl = {"params": load_pretrain(self._state.params,
                                            pre.get("params", {}))}
            if self._state.batch_stats and pre.get("batch_stats"):
                repl["batch_stats"] = load_pretrain(self._state.batch_stats,
                                                    pre["batch_stats"])
            self._state = self._state.replace(**repl)
            return
        import glob
        bins = []
        if os.path.isdir(path):
            bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
        elif path.endswith((".bin", ".pth", ".pt")) and os.path.exists(path):
            bins = [path]
        if not bins:
            print(f"[trainer] warm start: nothing loadable at {path!r}")
            return
        import torch
        sd = {}
        for b in bins:
            sd.update(torch.load(b, map_location="cpu", weights_only=False))
        from pq3d_tpu.utils.hf_import import import_query3d
        memories = tuple(self.cfg.model.get("memories",
                                            ("mv", "pc", "voxel", "prompt")))
        variables = {"params": self._state.params}
        if self._state.batch_stats:
            variables["batch_stats"] = self._state.batch_stats
        new_vars, report = import_query3d(sd, variables, memories=memories)
        print(f"[trainer] warm start from {len(bins)} torch file(s): "
              f"{len(report['loaded'])} loaded, "
              f"{len(report['missing'])} missing, "
              f"{len(report['mismatched'])} mismatched, "
              f"{len(report['unused'])} unused")
        self._state = self._state.replace(
            params=new_vars["params"],
            batch_stats=new_vars.get("batch_stats",
                                     self._state.batch_stats))

    def _put(self, batch):
        batch = {k: v for k, v in batch.items() if not k.startswith("_")}
        batch = jax.tree.map(jnp.asarray, batch)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    def install_preemption_handler(self, signals=None) -> None:
        """Checkpoint-on-signal: SLURM sends SIGUSR1 ``signal_delay_s``
        before killing a requeueing job (ref common/launch_utils.py:60-74
        submitit timeout handling); the step loop saves ``latest`` and
        exits so the requeued run resumes cleanly."""
        import signal as _signal
        signals = signals or (_signal.SIGUSR1, _signal.SIGTERM)

        def _handler(signum, frame):
            print(f"[trainer] signal {signum}: checkpointing for requeue")
            self._preempted = True

        for s in signals:
            try:
                _signal.signal(s, _handler)
            except (ValueError, OSError):   # non-main thread / platform
                pass

    def _handle_preemption(self) -> bool:
        if not getattr(self, "_preempted", False):
            return False
        if self._state is not None:
            self.ckpt.save("latest", self._state, self.tracker.state_dict())
            self.ckpt.close()   # must be durable before the requeue kill
        print("[trainer] latest checkpoint saved; exiting for requeue")
        return True

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        t0 = time.time()
        last = {}
        n = 0
        for batch in prefetch_batches(self.train_data(epoch)):
            batch = self._put(batch)
            if self._state is None:
                self._lazy_init(batch)
            self._state, metrics = self._train_step(self._state, batch)
            self.profiler.step()
            last = metrics
            n += 1
            step = int(self._state.step)
            if step % int(self.cfg.get("log_every", 10)) == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["lr"] = float(self._schedule(step))
                self.logger.log(host, step)
            if getattr(self, "_preempted", False):
                break
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
            meta = batch.get("_meta", {}) if isinstance(batch, dict) else {}
            n_real = int(meta.get("n_real", 0))
            batch = self._put(batch)
            if self._state is None:   # mode=test / eval-before-train
                self._lazy_init(batch)
            out = self._eval_step(self._state, batch)
            out_np = jax.tree.map(np.asarray, out)
            bat_np = jax.tree.map(np.asarray, batch)
            if n_real:
                # final wrap-padded batch: evaluators must not score the
                # padding rows (eval/base.truncate_batch_rows)
                from pq3d_tpu.eval.base import truncate_batch_rows
                rows = int(bat_np["query_pad_masks"].shape[0])
                out_np = truncate_batch_rows(out_np, n_real, rows)
                bat_np = truncate_batch_rows(bat_np, n_real, rows)
            self.evaluator.update(out_np, bat_np)
        results = self.evaluator.record()
        self.logger.log(results, int(self._state.step), prefix="val")
        print(f"[eval {epoch}] " + " ".join(
            f"{k}={v:.4f}" for k, v in results.items()
            if isinstance(v, float)))
        return results


    def _close_loaders(self):
        """Release epoch-persistent loader worker pools (one pool per
        loader; each worker holds a pickled dataset copy)."""
        closers = [self.train_data, getattr(self, "val_data", None)]
        closers += [ld for _n, ld, _e in getattr(self, "val_sets", [])]
        for ld in closers:
            if hasattr(ld, "close"):
                ld.close()

    def _save_epoch_ckpts(self, epoch: int) -> None:
        """latest every epoch + numbered ckpt_N on the epochs_per_save
        cadence (ref default_trainer.py:100-104); shared by both run loops."""
        self.ckpt.save("latest", self._state, self.tracker.state_dict())
        if self.epochs_per_save and (epoch + 1) % self.epochs_per_save == 0:
            self.ckpt.save(f"ckpt_{epoch + 1}", self._state,
                           self.tracker.state_dict())

    def run(self):
        self.install_preemption_handler()
        for epoch in range(self.tracker.epoch, self.epochs):
            metrics = self.train_epoch(epoch)
            if self._handle_preemption():
                return self._state
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
            self._save_epoch_ckpts(epoch)
        self.profiler.close()
        self._close_loaders()
        self.ckpt.close()   # async saves must be durable before returning
        return self._state


@TRAINER_REGISTRY.register(name="DefaultTrainer")
class DefaultTrainer(Query3DTrainer):
    """Generic epoch-loop trainer (ref trainer/default_trainer.py:10-108);
    identical loop to Query3DTrainer in this framework — the reference split
    them only for logging differences."""


@TRAINER_REGISTRY.register(name="MultitaskTrainer")
class MultitaskTrainer(Query3DTrainer):
    """Stage-2 trainer: list of per-dataset val loaders + evaluators,
    T5-token decode into answer/caption predictions, target metric summed
    across datasets (ref trainer/multitask_trainer.py:72-145)."""

    def __init__(self, cfg: Config, model, loss_fn, train_data,
                 val_sets=None, detokenize=None,
                 total_steps: Optional[int] = None,
                 mesh_cfg: MeshConfig = MeshConfig()):
        super().__init__(cfg, model, loss_fn, train_data, None, None,
                         total_steps=total_steps, mesh_cfg=mesh_cfg)
        self.val_sets = val_sets or []   # list of (name, loader, evaluator)
        self.detokenize = detokenize or (lambda toks: "")
        self._decode_states_fn = None    # lazy jit for two-phase decode

    def postprocess_for_eval(self, out, batch) -> Dict[str, Any]:
        """Decode generation tokens into text predictions
        (ref multitask_trainer.py:138-145)."""
        host_out: Dict[str, Any] = {
            k: np.asarray(v) for k, v in out.items()
            if k in ("og3d_logits", "ground_logits", "generation_logits",
                     "answer_scores")}
        if "generation_enc" in out and "generation_tokens" not in out:
            # two-phase decode (GenerationHeadCfg.two_phase): run phase 2
            # as its own jit over the returned states
            from pq3d_tpu.models.generation import decode_states
            if self._decode_states_fn is None:
                import jax
                self._decode_states_fn = jax.jit(
                    decode_states, static_argnames=("cfg",))
            out = dict(out)
            out["generation_tokens"] = self._decode_states_fn(
                {"params": self._state.params},
                out["generation_enc"], out["generation_enc_mask"],
                cfg=self.model.generation_head_cfg)
        if "generation_tokens" in out:
            toks = np.asarray(out["generation_tokens"])
            texts = [self.detokenize(t) for t in toks]
            task_ids = np.asarray(batch["task_id"])
            host_out["answer_pred"] = texts
            host_out["caption_pred"] = texts
            host_out["task_id"] = task_ids
        return host_out

    def eval_epoch(self, epoch: int) -> Dict[str, float]:
        all_results: Dict[str, float] = {}
        target = 0.0
        for name, loader, evaluator in self.val_sets:
            evaluator.reset()
            for batch in loader(epoch):
                meta = batch.get("_meta", {})
                n_real = int(meta.get("n_real", 0)) \
                    if isinstance(meta, dict) else 0
                dev_batch = self._put(batch)
                if self._state is None:   # mode=test / eval-before-train
                    self._lazy_init(dev_batch)
                out = self._eval_step(self._state, dev_batch)
                host_out = self.postprocess_for_eval(out, batch)
                eval_batch = {k: np.asarray(v) for k, v in batch.items()
                              if not k.startswith("_")}
                eval_batch.update({k: v for k, v in meta.items()
                                   if k != "n_real"})
                # grounding evaluators expect integer targets at eval
                if "tgt_object_id_int" in eval_batch:
                    eval_batch["tgt_object_id"] = eval_batch["tgt_object_id_int"]
                if n_real:
                    # final wrap-padded batch: score only the real rows
                    from pq3d_tpu.eval.base import truncate_batch_rows
                    rows = int(eval_batch["query_pad_masks"].shape[0])
                    host_out = truncate_batch_rows(host_out, n_real, rows)
                    eval_batch = truncate_batch_rows(eval_batch, n_real,
                                                     rows)
                evaluator.update(host_out, eval_batch)
            results = evaluator.record()
            for k, v in results.items():
                all_results[f"{name}/{k}"] = v
            target += results.get("target_metric", 0.0)
            self.logger.log(results, int(self._state.step),
                            prefix=f"val-{name}")
        all_results["target_metric"] = target
        return all_results

    def run(self):
        self.install_preemption_handler()
        for epoch in range(self.tracker.epoch, self.epochs):
            metrics = self.train_epoch(epoch)
            if self._handle_preemption():
                return self._state
            print(f"[epoch {epoch}] loss={metrics.get('loss', float('nan')):.4f} "
                  f"({metrics.get('batches', 0)} steps, "
                  f"{metrics.get('epoch_time_s', 0):.1f}s)")
            self.tracker.epoch = epoch + 1
            if self.epochs_per_eval and (epoch + 1) % self.epochs_per_eval == 0:
                results = self.eval_epoch(epoch)
                print(f"[epoch {epoch}] target_metric="
                      f"{results.get('target_metric', 0):.4f}")
                if self.tracker.is_better(results.get("target_metric", 0.0)):
                    self.ckpt.save("best", self._state,
                                   self.tracker.state_dict())
            self._save_epoch_ckpts(epoch)
        self.profiler.close()
        self._close_loaders()
        self.ckpt.close()   # async saves must be durable before returning
        return self._state
