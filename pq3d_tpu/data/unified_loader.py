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


class UnifiedTaskLoader:
    """Batches from one task dataset."""

    def __init__(self, dataset, cfg: UnifiedPipelineConfig, batch_size: int,
                 train: bool, seed: int = 0,
                 feature_dims: Optional[Dict[str, int]] = None):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.feature_dims = feature_dims or {"mv": 768, "voxel": 128}

    def __call__(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.dataset)) if self.train \
            else np.arange(len(self.dataset))
        bs = self.batch_size
        for start in range(0, len(order) - bs + 1, bs):
            idxs = order[start:start + bs]
            items = []
            metas: Dict[str, List] = {}
            for i in idxs:
                scene, lang = self.dataset.get_item(int(i))
                item = process_item(scene, lang, self.cfg, rng, self.train,
                                    self.feature_dims)
                for k in list(item.keys()):
                    if k.startswith("meta_"):
                        metas.setdefault(k[5:], []).append(item.pop(k))
                items.append(item)
            batch = collate_unified(items, self.cfg, self.feature_dims,
                                    train=self.train)
            batch["_meta"] = metas  # host-only side channel for evaluators
            yield batch


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
