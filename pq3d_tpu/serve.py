"""Production serving driver: queued scenes -> bucketed batches -> one
compiled forward -> per-scene instance predictions.

The reference repo stops at offline evaluation (run.py mode=test); serving
3D scenes on TPU needs one more piece: requests arrive one scene at a
time, but the chip wants fixed-shape batches compiled ONCE.  This driver
provides it:

- a submit() queue with futures, so callers get per-scene results;
- micro-batching: up to ``batch_size`` scenes per step, waiting at most
  ``max_delay_s`` for stragglers, padding short batches by repeating a
  scene (results for the padding rows are dropped);
- shape discipline: with the rectangular gather-stem layout,
  ``pipe_cfg.level_caps`` makes every batch compile to ONE executable.
  flat_pack / dense_block / swin batch shapes are bucket-laddered: the
  executable count is bounded by the rung ladder, not one — size
  ``voxel_bucket`` to a single rung (>= the worst-case batch total) and
  warm it if strict one-compile serving latency is required;
- per-scene postprocessing through the same ranking as the evaluator
  (eval/instseg_eval.rank_instances), at full point resolution.

Three scale-out topologies:

- one server per chip behind a load balancer (default, ``mesh=None``) —
  uses the flat/compact single-chip fast paths;
- one server per slice (``mesh=make_mesh(...)``): the rectangular batch is
  sharded over the mesh's ``data`` axis and the forward runs SPMD over
  ICI, so a v5e-8 slice serves 8x the batch per step from one process.
  Requires ``batch_size % mesh.shape['data'] == 0`` and the rectangular
  layout (flat_pack/compact arrays have no batch dim to shard);
- ``ReplicatedServer``: one process, one replica per chip (``device=``
  pinning), requests fanned out by queue depth — the single-chip fast
  paths (flat_pack/compact/int8) scale to the whole slice without any
  sharding, since each replica owns its chip outright.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
import concurrent.futures as _futures
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig
from pq3d_tpu.eval.instseg_eval import rank_instances


# ---- spawn-pool worker protocol for multi-core host preprocessing --------
# (module-level so spawn workers resolve them by qualified name; the
# worker runs ONLY numpy host code — it must never touch the accelerator)
_SERVE_WORKER: Dict[str, Any] = {}


def _init_serve_worker(pipe_cfg) -> None:
    _SERVE_WORKER["cfg"] = pipe_cfg


def _serve_process_scene(scene, seed):
    from pq3d_tpu.data.instseg_pipeline import process_scene
    rng = np.random.default_rng(seed)
    return process_scene(scene, _SERVE_WORKER["cfg"], rng, train=False)


@dataclass
class ServerStats:
    scenes: int = 0
    steps: int = 0
    total_wait_s: float = 0.0   # first-submit -> dispatch batching wait
    total_step_s: float = 0.0   # summed per-batch dispatch->resolve time
    # wall-clock span of processed batches: with the pipelined worker,
    # per-batch times overlap, so throughput must come from the span
    t_first: float = 0.0
    t_last: float = 0.0
    # bounded: a long-running server must not grow host RAM per request;
    # quantiles come from the most recent window
    latencies_s: "deque" = field(
        default_factory=lambda: deque(maxlen=100_000))
    # per-stage host decomposition (summed seconds across batches): where
    # the serving wall goes — preprocess (process_scene, parallelizable
    # across host cores), collate, cast+device put, device-result readback
    # + full-res ranking.  With the depth-1 pipeline, preprocess/collate/
    # put of batch N+1 overlap the device step of batch N, so these sums
    # can legitimately exceed the wall span.
    stage_s: Dict[str, float] = field(default_factory=dict)
    # guards latencies_s: summary() may run on a monitoring thread while
    # the worker appends (iterating a mutating deque raises RuntimeError)
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False, compare=False)

    def record_latency(self, seconds: float) -> None:
        with self._lock:
            self.latencies_s.append(seconds)

    def add_stage(self, name: str, seconds: float) -> None:
        self.stage_s[name] = self.stage_s.get(name, 0.0) + seconds

    def summary(self) -> Dict[str, float]:
        with self._lock:
            lat = np.asarray(self.latencies_s) if self.latencies_s else \
                np.zeros(1)
        span = self.t_last - self.t_first
        return {"scenes": self.scenes, "steps": self.steps,
                "scenes_per_sec": self.scenes / max(span, 1e-9),
                "p50_latency_s": float(np.quantile(lat, 0.5)),
                "p99_latency_s": float(np.quantile(lat, 0.99)),
                "stage_s": dict(self.stage_s)}


class _MicroBatchServer:
    """Shared micro-batching machinery: a submit() queue with futures, a
    collector that waits at most ``max_delay_s`` for stragglers after the
    first request, and a worker loop that reports per-batch failures into
    the affected futures instead of dying.  Subclasses implement
    ``_run_batch(requests) -> [result, ...]`` over the REAL requests
    (``len(requests) <= batch_size``): they pad short batches to
    ``batch_size`` at the PROCESSED-item level (repeating the last
    processed dict), so per-request host preprocessing runs exactly once
    per real request and postprocessing skips the padding rows."""

    def __init__(self, batch_size: int, max_delay_s: float = 0.05,
                 mesh=None, device=None, cast=None):
        self.batch_size = batch_size
        self.max_delay_s = max_delay_s
        self.mesh = mesh
        self.device = device
        # optional host-side batch transform applied before device put —
        # e.g. utils/inference.cast_batch_bf16 paired with bf16-cast
        # variables, so the whole forward runs at the MXU bf16 rate
        # (f32 inputs would promote bf16 params back to f32)
        self.cast = cast
        if mesh is not None and device is not None:
            raise ValueError("mesh and device pinning are exclusive: a "
                             "sharded server spans devices, a pinned one "
                             "owns exactly one")
        if mesh is not None:
            dp = mesh.shape["data"]
            if batch_size % dp != 0:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh's "
                    f"data axis ({dp}); the sharded forward would be ragged")
        self.stats = ServerStats()
        # explicit AOT executable cache: batch-shape signature -> compiled
        # executable.  jax.jit's own lookup lives in a GLOBAL LRU
        # (PjitFunctionCache, capacity 8192) shared by every jitted function
        # in the process — under a long-lived process it can evict this
        # server's entry, and jit_cache_size() would under-count.  Owning
        # the executables makes the compile count exact and the executable
        # set bounded by the shape ladder, independent of anything else the
        # process compiles.
        self._exe: Dict[Any, Any] = {}
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._close_lock = threading.Lock()
        self._rng = np.random.default_rng(0)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ API
    def submit(self, request) -> Future:
        fut: Future = Future()
        # the closed-check and enqueue must be atomic vs close(): a put
        # landing behind the shutdown sentinel would never resolve
        with self._close_lock:
            if self._closed:
                raise RuntimeError("server closed")
            self._q.put((request, fut, time.time()))
        return fut

    def close(self) -> None:
        with self._close_lock:
            if not self._closed:
                self._closed = True
                self._q.put(None)
        self._thread.join()

    def jit_cache_size(self) -> int:
        """Number of distinct executables this server has compiled (exact:
        counts the server-owned AOT cache, not the process-global jit LRU)."""
        return len(self._exe)

    def _aot_call(self, tag: str, jitted, *args, _key_args=None, **static):
        """Dispatch through the server-owned AOT executable cache.

        ``_key_args`` (default: all of ``args``) selects the pytrees whose
        leaf shapes/dtypes key the cache — pass just the batch when the
        other args (model variables) are fixed for the server's lifetime.
        Static kwargs are baked into the executable at lower() time.
        """
        import jax
        src = args if _key_args is None else _key_args
        leaves = jax.tree_util.tree_leaves(src)
        key = (tag,) + tuple((tuple(l.shape), str(l.dtype)) for l in leaves)
        exe = self._exe.get(key)
        if exe is None:
            exe = jitted.lower(*args, **static).compile()
            self._exe[key] = exe
        return exe(*args)

    # ----------------------------------------------------------------- loop
    def _collect(self, first_timeout=None):
        """``first_timeout=None`` blocks until a request (idle server);
        ``first_timeout=0.0`` drains whatever is queued RIGHT NOW without
        waiting for stragglers (pipelined loop with a batch in flight — a
        straggler wait here would stall resolution of the in-flight batch
        by up to max_delay_s).  Returns ``None`` on the shutdown sentinel,
        ``[]`` when a bounded wait found nothing."""
        nonblocking = first_timeout == 0.0
        try:
            if nonblocking:
                first = self._q.get_nowait()
            elif first_timeout is not None:
                first = self._q.get(timeout=first_timeout)
            else:
                first = self._q.get()
        except queue.Empty:
            return []
        if first is None:
            return None
        items = [first]
        deadline = time.time() + self.max_delay_s
        while len(items) < self.batch_size:
            try:
                nxt = self._q.get_nowait() if nonblocking else \
                    self._q.get(timeout=max(deadline - time.time(), 0))
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)   # re-post sentinel for the outer loop
                break
            items.append(nxt)
        return items

    def _loop(self):
        """Pipelined worker: while a batch's device step is in flight
        (dispatched asynchronously by jax), the NEXT backlogged batch's
        host work (preprocess + collate + device put + dispatch) runs on
        the CPU — so under load the chip never idles waiting for the host.
        Depth-1: at most one batch in flight, so request latency is never
        stretched by a deep queue."""
        inflight = None    # (items, n_real, state, t_dispatch)
        shutdown = False
        while True:
            items = None
            if not shutdown:
                # only wait for stragglers when nothing is in flight —
                # with a batch on the device, take whatever is queued NOW
                # and get back to resolving
                items = self._collect(
                    first_timeout=0.0 if inflight is not None else None)
            if items is None and not shutdown:
                shutdown = True
                items = []
            nxt = None
            if items:
                t0 = time.time()
                reqs = [it[0] for it in items]
                self.stats.total_wait_s += t0 - min(it[2] for it in items)
                try:
                    state = self._dispatch(reqs)
                    nxt = (items, len(reqs), state, t0)
                except Exception as e:   # host-side failure: report,
                    self._fail(items, e)  # don't kill the loop
            if inflight is not None:
                self._resolve(inflight)
            inflight = nxt
            if shutdown and inflight is None:
                return

    def _resolve(self, inflight):
        items, n_real, state, t0 = inflight
        try:
            results = self._finish(state)
            dt = time.time() - t0
            for i in range(n_real):
                _, fut, t_sub = items[i]
                try:
                    fut.set_result(results[i])
                except _futures.InvalidStateError:
                    # a client cancel() can land at ANY point before
                    # set_result (checking fut.cancelled() first is a
                    # TOCTOU race); swallowing it here keeps one
                    # abandoned request from poisoning the batch
                    continue
                self.stats.record_latency(time.time() - t_sub)
            self.stats.scenes += n_real
            self.stats.steps += 1
            self.stats.total_step_s += dt
            if self.stats.t_first == 0.0:
                self.stats.t_first = t0
            self.stats.t_last = time.time()
        except Exception as e:
            self._fail(items, e)

    @staticmethod
    def _fail(items, e):
        for _, fut, _t in items:
            try:
                if not fut.done():
                    fut.set_exception(e)
            except _futures.InvalidStateError:
                pass     # lost a cancel race; nothing to deliver

    # Subclasses either implement the pipelined pair — _dispatch (host
    # work + async device dispatch) and _finish (device readback + host
    # postprocess) — or just override _run_batch, which degrades to
    # un-pipelined execution (all work at the _finish stage).
    def _dispatch(self, reqs):
        return reqs

    def _finish(self, state):
        return self._run_batch(state)

    def _run_batch(self, reqs):
        raise NotImplementedError(
            "implement _dispatch/_finish (pipelined) or _run_batch")

    def _to_device(self, np_batch):
        if self.cast is not None:
            np_batch = self.cast(np_batch)
        if self.mesh is not None:
            from pq3d_tpu.parallel.mesh import shard_batch
            return shard_batch(np_batch, self.mesh)
        if self.device is not None:
            import jax
            return jax.tree.map(
                lambda x: jax.device_put(x, self.device), np_batch)
        import jax.numpy as jnp
        return {k: (jnp.asarray(v) if not isinstance(v, dict) else
                    {kk: jnp.asarray(vv) for kk, vv in v.items()})
                for k, v in np_batch.items()}


class InstSegServer(_MicroBatchServer):
    """Micro-batching inference server for the stage-1 instseg model:
    submit one raw scene dict (points/colors/segment_id/...), receive a
    list of {"class", "score", "mask"} instance predictions at full point
    resolution."""

    def __init__(self, model, variables, pipe_cfg: InstSegPipelineConfig,
                 batch_size: int, num_classes: int, topk: int = 100,
                 score_threshold: float = 0.0, max_delay_s: float = 0.05,
                 extra_features: Optional[Dict[str, int]] = None,
                 mesh=None, device=None, cast=None, num_workers: int = 0):
        if not pipe_cfg.level_caps and not pipe_cfg.flat_pack:
            # flat_pack ignores level_caps: its shapes are bucket-laddered
            # by voxel_bucket instead (see module docstring)
            raise ValueError(
                "serving requires pipe_cfg.level_caps: without fixed level "
                "pads every batch may compile a new executable")
        if pipe_cfg.level_cap_ladder and not pipe_cfg.flat_pack:
            # the ladder OVERRIDES level_caps in collate (one executable per
            # rung) — it would silently reintroduce the recompiles the
            # level_caps guard above exists to prevent
            raise ValueError(
                "unset pipe_cfg.level_cap_ladder for serving: it overrides "
                "level_caps and compiles one executable per rung")
        if mesh is not None and (pipe_cfg.flat_pack or pipe_cfg.compact_conv):
            raise ValueError(
                "mesh serving needs the rectangular layout: flat_pack/"
                "compact_conv arrays have no batch dim to shard")
        from pq3d_tpu.models.encoders import check_swin_window
        check_swin_window(model, pipe_cfg)
        ve = getattr(model, "voxel_enc", None)
        if pipe_cfg.device_maps and pipe_cfg.flat_pack:
            # device-built FLAT maps (ops/device_flat_maps): the model's
            # baked-in flat caps must equal the pipeline's shape lock
            mcaps = dict(getattr(ve, "device_flat_caps", None) or ())
            pcaps = dict(pipe_cfg.flat_shape_caps or {})
            if mcaps != pcaps:
                diff = {k: (mcaps.get(k), pcaps.get(k))
                        for k in set(mcaps) | set(pcaps)
                        if mcaps.get(k) != pcaps.get(k)}
                raise ValueError(
                    "pipe_cfg.device_maps + flat_pack needs the model "
                    "built with voxel_enc.device_flat_caps == "
                    f"flat_shape_caps; differing keys (model, pipe): {diff}")
        elif pipe_cfg.device_maps:
            # device-built kernel maps (ops/device_maps): the batch ships
            # only vox_coords/n_voxels, so the MODEL must be configured to
            # build the hierarchy itself, with the same static caps
            caps = tuple(getattr(ve, "device_maps", None) or ())
            if caps != tuple(pipe_cfg.level_caps):
                raise ValueError(
                    "pipe_cfg.device_maps=True needs the model built with "
                    f"voxel_enc.device_maps == level_caps "
                    f"(model: {caps or None}, pipe: "
                    f"{tuple(pipe_cfg.level_caps)})")
        elif getattr(ve, "device_maps", None) is not None or \
                getattr(ve, "device_flat_caps", None) is not None:
            raise ValueError(
                "model voxel_enc.device_maps/device_flat_caps is set but "
                "the pipeline ships host maps — set "
                "pipe_cfg.device_maps=True (the model would look for "
                "'vox_coords' the batch does not carry)")
        import jax
        self.model = model
        if mesh is not None:
            from pq3d_tpu.parallel.mesh import replicate
            variables = replicate(variables, mesh)
        elif device is not None:
            variables = jax.tree.map(
                lambda x: jax.device_put(x, device), variables)
        self.variables = variables
        self.pipe_cfg = pipe_cfg
        self.num_classes = num_classes
        self.topk = topk
        self.score_threshold = score_threshold
        self.extra_features = extra_features or {}

        def _forward(v, b):
            out = model.apply(v, b, train=False)
            return out["predictions_class"][-1], out["predictions_mask"][-1]
        self._fwd = jax.jit(_forward)
        # multi-core host preprocessing: per-scene process_scene (voxelize,
        # FPS, centers — the dominant serving host cost) fans out to a
        # persistent spawn pool.  On a 1-core box this only adds pickling
        # overhead; on a real multi-core serving host it parallelizes the
        # per-scene work the device-maps path leaves behind (PERF.md
        # round-5 host-core decomposition).
        self._pool = None
        self._pool_seed = 0
        if num_workers > 0:
            from pq3d_tpu.data.pool import BatchPool
            self._pool = BatchPool(num_workers, _init_serve_worker,
                                   (pipe_cfg,))
        super().__init__(batch_size, max_delay_s, mesh=mesh, device=device,
                         cast=cast)

    def close(self) -> None:
        super().close()
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def _update_flat_lock(self, dims) -> None:
        """Flat-pack shape lock from observed traffic: the first batch (and
        any batch that overflows the current lock) grows
        ``pipe_cfg.flat_shape_caps`` (margin-scaled), so steady-state
        serving converges to ONE executable instead of one per bucketed
        batch-total combination (chip: 9 compiles over 8 batches without
        the lock).  Pass ``flat_shape_caps`` explicitly for strict
        compile-once serving."""
        if not dims:
            return
        caps = self.pipe_cfg.flat_shape_caps
        if caps is not None and all(v <= caps.get(k, 0)
                                    for k, v in dims.items()):
            return
        import dataclasses
        from pq3d_tpu.data.instseg_pipeline import flat_shape_caps_from
        new = flat_shape_caps_from(dims, self.pipe_cfg)
        if caps:
            new = {k: max(new.get(k, 0), caps.get(k, 0))
                   for k in set(new) | set(caps)}
        self.pipe_cfg = dataclasses.replace(self.pipe_cfg,
                                            flat_shape_caps=new)

    def _dispatch(self, scenes):
        from pq3d_tpu.data.instseg_pipeline import (collate_processed,
                                                    process_scene)
        n_real = len(scenes)
        # preprocess each REAL scene exactly once; padding duplicates the
        # last processed dict (re-running voxelize/hierarchy/window packs
        # per padding row multiplied idle-traffic latency)
        t0 = time.time()
        if self._pool is not None:
            seeds = range(self._pool_seed, self._pool_seed + n_real)
            self._pool_seed += n_real
            processed = list(self._pool.run(
                _serve_process_scene, ((s, sd) for s, sd in
                                       zip(scenes, seeds))))
        else:
            processed = [process_scene(s, self.pipe_cfg, self._rng,
                                       train=False) for s in scenes]
        t1 = time.time()
        self.stats.add_stage("preprocess", t1 - t0)
        processed += [processed[-1]] * (self.batch_size - n_real)
        np_batch = collate_processed(processed, self.pipe_cfg)
        self.stats.add_stage("collate", time.time() - t1)
        meta = np_batch.pop("_meta")
        if self.pipe_cfg.flat_pack and not self.pipe_cfg.device_maps:
            # device flat maps bake the lock into the model — it cannot
            # grow; collate_flat_device raises loudly on overflow instead
            self._update_flat_lock(meta.get("flat_dims"))
        S = self.pipe_cfg.max_segments
        for name, dim in self.extra_features.items():
            np_batch[f"{name}_seg_fts"] = np.zeros(
                (self.batch_size, S, dim), np.float32)
            np_batch[f"{name}_seg_pad_masks"] = np_batch["seg_pad_masks"]
        t2 = time.time()
        dev_batch = self._to_device(np_batch)
        cls_l, mask_l = self._aot_call("fwd", self._fwd, self.variables,
                                       dev_batch, _key_args=(dev_batch,))
        self.stats.add_stage("put_dispatch", time.time() - t2)
        # device arrays are futures (async dispatch): readback in _finish
        return (n_real, cls_l, mask_l, np_batch["seg_pad_masks"], meta)

    def _finish(self, state):
        n_real, cls_l, mask_l, seg_pad, meta = state
        t0 = time.time()
        cls_l = np.asarray(cls_l)
        mask_l = np.asarray(mask_l)
        seg_valid = np.asarray(seg_pad)
        self.stats.add_stage("readback", time.time() - t0)
        t1 = time.time()
        out = [rank_instances(cls_l[i], mask_l[i], seg_valid[i],
                              num_classes=self.num_classes, topk=self.topk,
                              score_threshold=self.score_threshold,
                              seg_to_full=meta["segment_to_full"][i])
               for i in range(n_real)]
        self.stats.add_stage("rank", time.time() - t1)
        return out


class UnifiedServer(_MicroBatchServer):
    """Micro-batching server for the stage-2 unified model: submit
    ``(scene, lang)`` request pairs (the same payloads the unified task
    datasets produce — obj points + offline features + tokenized prompt),
    receive {"ground_obj", "ground_scores", "generation_tokens",
    "generation"} per request."""

    def __init__(self, model, variables, pipe_cfg, batch_size: int,
                 feature_dims: Dict[str, int], detokenize=None,
                 max_delay_s: float = 0.05, mesh=None, device=None,
                 cast=None):
        import jax
        from pq3d_tpu.data.unified_pipeline import (collate_unified,
                                                    process_item)
        if mesh is not None and getattr(pipe_cfg, "flat_obj", False):
            raise ValueError(
                "mesh serving needs the padded object layout: flat_obj "
                "arrays have no batch dim to shard")
        self._collate = collate_unified
        self._process = process_item
        self.model = model
        if mesh is not None:
            from pq3d_tpu.parallel.mesh import replicate
            variables = replicate(variables, mesh)
        elif device is not None:
            variables = jax.tree.map(
                lambda x: jax.device_put(x, device), variables)
        self.variables = variables
        self.pipe_cfg = pipe_cfg
        self.feature_dims = feature_dims
        self.detokenize = detokenize

        def _forward(v, b):
            out = model.apply(v, b, train=False)
            return {k: out[k] for k in ("ground_logits", "generation_tokens",
                                        "generation_enc",
                                        "generation_enc_mask") if k in out}
        self._fwd = jax.jit(_forward)
        gen_cfg = getattr(model, "generation_head_cfg", None)
        self._decode = None
        if gen_cfg is not None and getattr(gen_cfg, "two_phase", False):
            # phase-2 greedy decode as its own jit (bf16 serving lever;
            # see GenerationHeadCfg.two_phase)
            from pq3d_tpu.models.generation import decode_states
            self._decode = jax.jit(decode_states, static_argnames=("cfg",))
            self._gen_cfg = gen_cfg
        super().__init__(batch_size, max_delay_s, mesh=mesh, device=device,
                         cast=cast)

    def _dispatch(self, reqs):
        n_real = len(reqs)
        processed = []
        for scene, lang in reqs:
            item = self._process(scene, lang, self.pipe_cfg, self._rng,
                                 False, self.feature_dims)
            processed.append({k: v for k, v in item.items()
                              if not k.startswith("meta_")})
        # pad at the processed level — preprocessing runs once per request
        processed += [processed[-1]] * (self.batch_size - n_real)
        np_batch = self._collate(processed, self.pipe_cfg,
                                 self.feature_dims, train=False)
        np_batch = {k: v for k, v in np_batch.items()
                    if not k.startswith("_")}
        dev_batch = self._to_device(np_batch)
        out = self._aot_call("fwd", self._fwd, self.variables, dev_batch,
                             _key_args=(dev_batch,))
        if self._decode is not None and "generation_enc" in out:
            # phase-2 decode dispatches asynchronously on the fwd outputs —
            # both stay on device; nothing blocks until _finish reads back
            out = dict(out)
            enc = out.pop("generation_enc")
            enc_mask = out.pop("generation_enc_mask")
            out["generation_tokens"] = self._aot_call(
                "decode", self._decode, {"params": self.variables["params"]},
                enc, enc_mask, _key_args=(enc, enc_mask), cfg=self._gen_cfg)
        return (n_real, out, np_batch["query_pad_masks"])

    def _finish(self, state):
        n_real, out, query_pad = state
        out = {k: np.asarray(v) for k, v in out.items()}
        # object slots == query slots in the unified batch (one query per
        # candidate object, collate_unified:277-300)
        obj_valid = np.asarray(query_pad)
        results = []
        for i in range(n_real):
            r: Dict[str, Any] = {}
            if "ground_logits" in out:
                scores = np.where(obj_valid[i], out["ground_logits"][i],
                                  -np.inf)
                r["ground_scores"] = scores
                # no valid candidates -> explicit None, not a confident
                # argmax over an all--inf row (which points at padding)
                r["ground_obj"] = (int(np.argmax(scores))
                                   if obj_valid[i].any() else None)
            if "generation_tokens" in out:
                toks = out["generation_tokens"][i]
                r["generation_tokens"] = toks
                if self.detokenize is not None:
                    r["generation"] = self.detokenize(toks.tolist())
            results.append(r)
        return results


class ReplicatedServer:
    """One process, one replica per chip: builds a device-pinned server on
    each device via ``factory(device)`` and fans requests out to the
    replica with the shallowest queue.  Each replica owns its chip
    outright, so the single-chip fast paths (flat_pack / compact_conv /
    int8 gathers) scale to the whole slice with zero sharding — the
    in-process version of the one-server-per-chip load-balancer topology.

    ``factory`` is called once per device and must return a started
    ``_MicroBatchServer`` pinned to it (pass ``device=device`` through to
    InstSegServer/UnifiedServer).
    """

    def __init__(self, factory, devices=None):
        import jax
        devices = list(devices) if devices is not None else jax.devices()
        if not devices:
            raise ValueError("no devices to replicate over")
        self.replicas = [factory(d) for d in devices]
        self._rr = 0

    def submit(self, request) -> Future:
        # shallowest queue wins; round-robin breaks ties so padding-heavy
        # partial batches spread evenly
        depths = [r._q.qsize() for r in self.replicas]
        best = min(range(len(depths)),
                   key=lambda i: (depths[i], (i - self._rr)
                                  % len(depths)))
        self._rr = (best + 1) % len(self.replicas)
        return self.replicas[best].submit(request)

    def close(self) -> None:
        for r in self.replicas:
            r.close()

    def stats_summary(self) -> Dict[str, Any]:
        per = [r.stats.summary() for r in self.replicas]
        return {"replicas": per,
                "scenes": sum(p["scenes"] for p in per),
                "scenes_per_sec": sum(p["scenes_per_sec"] for p in per)}
