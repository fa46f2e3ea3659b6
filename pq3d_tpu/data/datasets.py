"""Datasets: scene sources for the host pipeline.

Mirrors the reference's dataset layer (reference: data/datasets/
sceneverse_base.py, sceneverse_instseg.py) with a registry of scene sources.
``SceneVerseInstSeg`` reads the real SceneVerse layout (torch .pth scans +
segment jsons) when data is on disk; ``SyntheticInstSeg`` generates
procedural scenes for development, tests, and benchmarks.
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig,
                                            make_batch)
from pq3d_tpu.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register(name="SyntheticInstSeg")
class SyntheticInstSeg:
    """Procedural scenes, deterministic per (split, index)."""

    def __init__(self, cfg, split: str):
        data_cfg = cfg.data.get("synthetic", {}) or {}
        n = {"train": 32, "val": 8, "test": 8}[split]
        if cfg.get("debug", {}) and cfg.debug.get("flag"):
            n = min(n, int(cfg.debug.get("debug_size", 4)))
        self.num_scenes = int(data_cfg.get(f"num_{split}", n))
        self.n_points = int(data_cfg.get("n_points", 4000))
        self.n_instances = int(data_cfg.get("n_instances", 8))
        self.n_segments = int(data_cfg.get("n_segments", 64))
        self.split = split
        self.seed = {"train": 0, "val": 10_000, "test": 20_000}[split]

    def __len__(self):
        return self.num_scenes

    def get_scene(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed + idx)
        s = synthetic.make_scene(rng, n_points=self.n_points,
                                 n_instances=self.n_instances,
                                 n_segments=self.n_segments)
        s["inst_labels"] = np.minimum(s["inst_labels"], 199)
        s["scan_id"] = f"{self.split}_{idx:05d}"
        return s


@DATASET_REGISTRY.register(name="ScanNetInstSegSceneVerse")
class SceneVerseInstSeg:
    """Real SceneVerse ScanNet scans (ref data/datasets/sceneverse_base.py:
    106-134, sceneverse_instseg.py:64-118).  Requires
    ``cfg.data.scene_verse_base`` on disk; raises otherwise.

    Produces the scene dict consumed by ``instseg_pipeline.process_scene``:
    per-point continuous instance ids (−1 = background / not-an-object) and
    per-instance ScanNet200 class ids, with wall/floor (``filter_out_classes``)
    and unmappable instances dropped — matching the reference's
    ``extract_inst_info`` (sceneverse_instseg.py:64-118).
    """

    def __init__(self, cfg, split: str):
        import torch  # cpu torch for .pth scan payloads
        from pq3d_tpu.data.label_utils import LabelConverter
        base = cfg.data.get("scene_verse_base")
        if not base or not os.path.isdir(str(base)):
            raise FileNotFoundError(
                f"SceneVerse base dir not found: {base!r} — use the "
                f"SyntheticInstSeg dataset when no data is mounted")
        self.base = str(base)
        self.aux = str(cfg.data.get("scene_verse_aux") or self.base)
        self.split = split
        split_file = os.path.join(
            self.base, "ScanNet", "annotations", "splits",
            f"scannetv2_{'val' if split != 'train' else 'train'}.txt")
        with open(split_file) as f:
            self.scan_ids = [l.strip() for l in f if l.strip()]
        if cfg.get("debug", {}) and cfg.debug.get("flag"):
            self.scan_ids = self.scan_ids[:int(cfg.debug.get("debug_size", 4))]
        iopt = cfg.data.get("instseg_options", {}) or {}
        self.filter_out_classes = set(iopt.get("filter_out_classes", (0, 2)))
        self.ignore_label = int(iopt.get("ignore_label", -100))
        opts = cfg.data.get("load_scan_options", {}) or {}
        self.load_image_segment_feat = bool(
            opts.get("load_image_segment_feat", False))
        self.load_point_segment_feat = bool(
            opts.get("load_point_segment_feat", False))
        self.converter = LabelConverter(os.path.join(
            self.base, "ScanNet", "annotations", "meta_data",
            "scannetv2-labels.combined.tsv"))
        self._torch = torch

    def __len__(self):
        return len(self.scan_ids)

    def get_scene(self, idx: int) -> Dict[str, np.ndarray]:
        torch = self._torch
        scan_id = self.scan_ids[idx]
        sd = os.path.join(self.base, "ScanNet", "scan_data")
        pcds, colors, _, instance_labels = torch.load(
            os.path.join(sd, "pcd_with_global_alignment", f"{scan_id}.pth"),
            map_location="cpu", weights_only=False)
        segment_id = torch.load(
            os.path.join(sd, "segment_id", f"{scan_id}.pth"),
            map_location="cpu", weights_only=False)
        inst_to_label = torch.load(
            os.path.join(sd, "instance_id_to_label", f"{scan_id}.pth"),
            map_location="cpu", weights_only=False)
        instance_labels = np.asarray(instance_labels)

        # ScanNet200 semantic id per labeled instance; keep only instances
        # that (a) appear in inst_to_label, (b) have points, (c) map to a
        # valid class outside filter_out_classes
        # (ref sceneverse_instseg.py:64-118 extract_inst_info)
        # Unmappable names keep ignore_label (CE skips them, mask losses
        # still supervise — ref keeps them too); only filter_out_classes
        # (wall/floor) and empty instances are dropped.
        keep_ids, keep_labels = [], []
        for inst_id, name in inst_to_label.items():
            sem = self.converter.name_to_scannet200(str(name),
                                                    self.ignore_label)
            if sem in self.filter_out_classes:
                continue
            if not np.any(instance_labels == inst_id):
                continue
            keep_ids.append(int(inst_id))
            keep_labels.append(sem)
        remap = {v: i for i, v in enumerate(sorted(keep_ids))}
        order = np.argsort(keep_ids)
        inst = np.vectorize(lambda x: remap.get(int(x), -1))(instance_labels)
        scene = {
            "points": np.asarray(pcds, np.float32),
            "colors": np.asarray(colors, np.float32) / 127.5 - 1.0,
            "instance_labels": inst.astype(np.int64),
            "segment_id": np.asarray(segment_id, np.int64),
            "inst_labels": np.asarray(keep_labels, np.int64)[order],
            "scan_id": scan_id,
        }
        # offline per-segment features (ref sceneverse_base.py:225-231,
        # sceneverse_instseg.py:225-235)
        if self.load_image_segment_feat:
            d = torch.load(os.path.join(self.aux, "ScanNet", "image_seg_feat",
                                        f"{scan_id}.pth"), map_location="cpu",
                           weights_only=False)
            scene["mv_seg_fts"] = np.asarray(d["image_seg_feature"],
                                             np.float32)
        if self.load_point_segment_feat:
            d = torch.load(os.path.join(self.aux, "ScanNet", "point_seg_feat",
                                        f"{scan_id}.pth"), map_location="cpu",
                           weights_only=False)
            scene["pc_seg_fts"] = np.asarray(d["point_seg_feature"],
                                             np.float32)
        return scene


def _assemble_instseg_batch(dataset, pipe_cfg: InstSegPipelineConfig,
                            extra_features: Dict[str, int], idxs,
                            rng: np.random.Generator,
                            train: bool) -> Dict[str, np.ndarray]:
    """One batch: scenes -> host pipeline -> fixed arrays (+ offline
    per-segment features, random-projected synthetics when real feature
    files are absent)."""
    scenes = [dataset.get_scene(int(i)) for i in idxs]
    batch = make_batch(scenes, pipe_cfg, rng, train)
    S = pipe_cfg.max_segments
    for name, dim in extra_features.items():
        key = f"{name}_seg_fts"
        feats = [s.get(key) for s in scenes]
        if feats[0] is None:
            srng = np.random.default_rng(int(idxs[0]))
            batch[key] = srng.standard_normal(
                (len(idxs), S, dim)).astype(np.float32)
        else:
            batch[key] = np.stack([
                np.pad(f[:S], ((0, max(0, S - len(f))), (0, 0)))
                for f in feats])
        batch[f"{name}_seg_pad_masks"] = batch["seg_pad_masks"]
    return batch


# worker-process state for the multi-worker loader (set by the spawn
# initializer — the dataset is pickled ONCE per worker, not per batch)
_WORKER: Dict[str, object] = {}


def _init_instseg_worker(dataset, pipe_cfg, extra_features):
    _WORKER["args"] = (dataset, pipe_cfg, extra_features)


def _instseg_worker_batch(idxs, seed_key, train):
    dataset, pipe_cfg, extra = _WORKER["args"]
    rng = np.random.default_rng(np.random.SeedSequence(seed_key))
    return _assemble_instseg_batch(dataset, pipe_cfg, extra, idxs, rng, train)


class InstSegLoader:
    """Batch iterator: dataset scenes -> host pipeline -> fixed batches.
    Callable(epoch) so the trainer can reshuffle per epoch.

    ``num_workers`` > 0 builds batches in a spawn-based process pool (the
    TPU-native counterpart of the reference's torch DataLoader workers,
    ref data/build.py:70-80): batch order is deterministic and identical
    for any worker count (per-batch seeded rng), with a bounded in-flight
    window so device-side backpressure caps host memory.  The default 0
    keeps the exact in-process behavior (one sequential rng)."""

    def __init__(self, dataset, pipe_cfg: InstSegPipelineConfig,
                 batch_size: int, train: bool, seed: int = 0,
                 extra_features: Optional[Dict[str, int]] = None,
                 num_workers: int = 0):
        self.dataset = dataset
        self.pipe_cfg = pipe_cfg
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.num_workers = num_workers
        self._pool = None   # epoch-persistent BatchPool (lazy)
        # offline per-segment features (mv/pc) are random-projected synthetics
        # when real feature files are absent
        self.extra_features = extra_features or {"mv": 768, "pc": 768}

    def _batch_indices(self, epoch: int):
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.dataset)) if self.train \
            else np.arange(len(self.dataset))
        bs = self.batch_size
        batches = [order[s:s + bs]
                   for s in range(0, len(order) - bs + 1, bs)]
        n_real = [bs] * len(batches)
        rem = len(order) - len(batches) * bs
        if rem and not self.train:
            # eval must score EVERY item (the reference's distributed
            # sampler pads by wrap-around and gather_for_metrics truncates
            # the duplicates, common/misc.py:103-117); here the final batch
            # wraps to full size and carries n_real so evaluators skip the
            # padding rows (train keeps dropping the remainder — one batch
            # of a shuffled epoch, matching drop_last semantics)
            batches.append(np.concatenate(
                [order[-rem:], np.resize(order, bs - rem)]))
            n_real.append(rem)
        return batches, n_real, rng

    def __call__(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        batches, n_real, rng = self._batch_indices(epoch)
        if self.num_workers <= 0:
            for idxs, nr in zip(batches, n_real):
                batch = _assemble_instseg_batch(
                    self.dataset, self.pipe_cfg, self.extra_features,
                    idxs, rng, self.train)
                batch["_meta"]["n_real"] = nr
                yield batch
            return
        if self._pool is None:
            from pq3d_tpu.data.pool import BatchPool
            self._pool = BatchPool(self.num_workers, _init_instseg_worker,
                                   (self.dataset, self.pipe_cfg,
                                    self.extra_features))
        for batch, nr in zip(self._pool.run(
                _instseg_worker_batch,
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
