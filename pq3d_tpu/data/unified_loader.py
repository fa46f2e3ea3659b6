"""Unified-task batch loaders: single-task loaders + a mixing train loader.

Mirrors the reference's train-time ConcatDataset + per-dataset val loaders
(reference: data/build.py:56-83) and the multitask trainer's zip of
val loaders + evaluators (trainer/multitask_trainer.py:72).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from pq3d_tpu.data.unified_pipeline import (UnifiedPipelineConfig,
                                            collate_unified, process_item)


def _assemble_unified_batch(dataset, cfg: UnifiedPipelineConfig,
                            feature_dims: Dict[str, int], idxs,
                            rng: np.random.Generator,
                            train: bool) -> Dict[str, np.ndarray]:
    items = []
    metas: Dict[str, List] = {}
    for i in idxs:
        scene, lang = dataset.get_item(int(i))
        item = process_item(scene, lang, cfg, rng, train, feature_dims)
        for k in list(item.keys()):
            if k.startswith("meta_"):
                metas.setdefault(k[5:], []).append(item.pop(k))
        items.append(item)
    batch = collate_unified(items, cfg, feature_dims, train=train)
    batch["_meta"] = metas  # host-only side channel for evaluators
    return batch


# worker-process state (spawn initializer; dataset pickled once per worker)
_WORKER: Dict[str, object] = {}


def _init_unified_worker(dataset, cfg, feature_dims):
    _WORKER["args"] = (dataset, cfg, feature_dims)


def _unified_worker_batch(idxs, seed_key, train):
    dataset, cfg, feature_dims = _WORKER["args"]
    rng = np.random.default_rng(np.random.SeedSequence(seed_key))
    return _assemble_unified_batch(dataset, cfg, feature_dims, idxs, rng,
                                   train)


class UnifiedTaskLoader:
    """Batches from one task dataset.

    ``num_workers`` > 0 builds batches in a spawn-based process pool with
    deterministic per-batch seeding (see InstSegLoader for the rationale);
    0 keeps the in-process sequential-rng path.  The pool path requires a
    picklable dataset — both HF and synthetic tokenizers are picklable
    module-level classes (data/tokenizers.py)."""

    def __init__(self, dataset, cfg: UnifiedPipelineConfig, batch_size: int,
                 train: bool, seed: int = 0,
                 feature_dims: Optional[Dict[str, int]] = None,
                 num_workers: int = 0):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.num_workers = num_workers
        self._pool = None   # epoch-persistent BatchPool (lazy)
        self.feature_dims = feature_dims or {"mv": 768, "voxel": 128}

    def __call__(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.dataset)) if self.train \
            else np.arange(len(self.dataset))
        bs = self.batch_size
        batches = [order[s:s + bs]
                   for s in range(0, len(order) - bs + 1, bs)]
        n_real = [bs] * len(batches)
        rem = len(order) - len(batches) * bs
        if rem and not self.train:
            # eval scores EVERY item: wrap-pad the final batch to full
            # size and mark n_real so evaluators skip the padding rows
            # (ref common/misc.py:103-117 gather_for_metrics truncation;
            # train keeps drop_last semantics)
            batches.append(np.concatenate(
                [order[-rem:], np.resize(order, bs - rem)]))
            n_real.append(rem)
        if self.num_workers <= 0:
            for idxs, nr in zip(batches, n_real):
                batch = _assemble_unified_batch(self.dataset, self.cfg,
                                                self.feature_dims, idxs,
                                                rng, self.train)
                batch["_meta"]["n_real"] = nr
                yield batch
            return
        if self._pool is None:
            from pq3d_tpu.data.pool import BatchPool
            self._pool = BatchPool(self.num_workers, _init_unified_worker,
                                   (self.dataset, self.cfg,
                                    self.feature_dims))
        for batch, nr in zip(self._pool.run(
                _unified_worker_batch,
                ((idxs, [self.seed, epoch, b], self.train)
                 for b, idxs in enumerate(batches))), n_real):
            batch["_meta"]["n_real"] = nr
            yield batch

    def close(self) -> None:
        """Shut the epoch-persistent worker pool down (workers hold a
        pickled dataset copy each; __del__ is only best-effort)."""
        if self._pool is not None:
            self._pool.close()
            self._pool = None


class MixedTaskLoader:
    """Train-time mixture over several task loaders (round-robin over a
    shuffled schedule; the reference concatenates datasets and shuffles,
    data/build.py:56-66)."""

    def __init__(self, loaders: List[UnifiedTaskLoader], seed: int = 0):
        self.loaders = loaders
        self.seed = seed

    def __call__(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        iters = [lo(epoch) for lo in self.loaders]
        counts = [len(lo.dataset) // lo.batch_size for lo in self.loaders]
        schedule = np.concatenate([np.full(c, i) for i, c in enumerate(counts)])
        rng = np.random.default_rng(self.seed + epoch)
        rng.shuffle(schedule)
        for i in schedule:
            try:
                yield next(iters[i])
            except StopIteration:
                continue
