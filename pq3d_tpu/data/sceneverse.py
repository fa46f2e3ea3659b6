"""SceneVerse task datasets (real data on disk).

Implements the reference's SceneVerse family against the same disk layout
(reference: data/datasets/sceneverse_base.py:106-279, scanrefer.py,
referit3d.py, multi3drefer.py, scanqa.py, sqa3d.py, scan2cap.py): jsonl/json
annotation files under ``<base>/ScanNet/annotations`` and torch .pth scan
payloads under ``<base>/ScanNet/scan_data``.

Every dataset exposes the unified-loader protocol:
``__len__`` / ``get_item(idx) -> (scene_dict, lang_dict)`` with a tokenizer
callable (prompt text -> ids) supplied by the caller — HF CLIP/T5 tokenizers
when available, any callable otherwise.

These classes require data on disk; construction raises FileNotFoundError
otherwise (the synthetic datasets in unified_datasets.py cover the no-data
path).
"""
from __future__ import annotations

import json
import os
from collections import Counter
from functools import lru_cache
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from pq3d_tpu.data.unified_pipeline import (TASK_CAPTION, TASK_QA,
                                            TASK_REFER)
from pq3d_tpu.registry import DATASET_REGISTRY

VIEW_DEP_WORDS = {
    "front", "behind", "back", "right", "left", "facing", "leftmost",
    "rightmost", "looking", "across"}


def is_explicitly_view_dependent(tokens: List[str]) -> bool:
    """(ref data/data_utils.py is_explicitly_view_dependent)"""
    return len(set(tokens).intersection(VIEW_DEP_WORDS)) > 0


def _read_jsonl(path: str) -> List[Dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


class SceneVerseScans:
    """Shared scan payload cache: points/colors/instances/segments per scan
    (ref sceneverse_base.py SCAN_DATA process-global cache)."""

    _cache: Dict[str, Dict] = {}

    def __init__(self, base_dir: str):
        if not os.path.isdir(base_dir):
            raise FileNotFoundError(f"SceneVerse base not found: {base_dir}")
        self.base_dir = base_dir

    def split_scan_ids(self, split: str) -> List[str]:
        name = "val" if split != "train" else "train"
        path = os.path.join(self.base_dir, "ScanNet", "annotations", "splits",
                            f"scannetv2_{name}.txt")
        with open(path) as f:
            return [l.strip() for l in f if l.strip()]

    def load(self, scan_id: str) -> Dict:
        if scan_id in self._cache:
            return self._cache[scan_id]
        import torch
        sd = os.path.join(self.base_dir, "ScanNet", "scan_data")
        pcds, colors, _, instance_labels = torch.load(
            os.path.join(sd, "pcd_with_global_alignment", f"{scan_id}.pth"),
            map_location="cpu", weights_only=False)
        segment_id = torch.load(
            os.path.join(sd, "segment_id", f"{scan_id}.pth"),
            map_location="cpu", weights_only=False)
        inst_to_label = torch.load(
            os.path.join(sd, "instance_id_to_label", f"{scan_id}.pth"),
            map_location="cpu", weights_only=False)
        inst_ids = sorted(int(i) for i in np.unique(instance_labels)
                          if int(i) in inst_to_label)
        remap = {v: i for i, v in enumerate(inst_ids)}
        inst = np.vectorize(lambda x: remap.get(int(x), -1))(instance_labels)
        labels = [inst_to_label[i] for i in inst_ids]
        scene = {
            "points": np.asarray(pcds, np.float32),
            "colors": np.asarray(colors, np.float32) / 127.5 - 1.0,
            "instance_labels": inst.astype(np.int64),
            "segment_id": np.asarray(segment_id, np.int64),
            "inst_labels": np.zeros(len(inst_ids), np.int64),
            "inst_label_names": labels,
            "inst_raw_ids": inst_ids,
            "label_count": Counter(labels),
            "scan_id": scan_id,
        }
        self._cache[scan_id] = scene
        return scene


class _SceneVerseTask:
    task_id = TASK_REFER
    evaluator = "ScanReferEval"

    def __init__(self, cfg, split: str, tokenizer: Optional[Callable] = None,
                 gen_tokenizer: Optional[Callable] = None):
        if split == "test":
            split = "val"   # (ref scanrefer.py:12-14 hack)
        self.split = split
        self.cfg = cfg
        self.scans = SceneVerseScans(str(cfg.data.scene_verse_base))
        self.tokenizer = tokenizer or (lambda s: [ord(c) % 1000 for c in s][:32])
        self.gen_tokenizer = gen_tokenizer or self.tokenizer
        self.lang_data = self._load_lang()

    def _anno(self, *parts) -> str:
        return os.path.join(self.scans.base_dir, "ScanNet", "annotations",
                            *parts)

    def _load_lang(self) -> List[Dict]:
        raise NotImplementedError

    def __len__(self):
        return len(self.lang_data)

    def _target_local_id(self, scene: Dict, raw_target_id: int) -> int:
        try:
            return scene["inst_raw_ids"].index(int(raw_target_id))
        except ValueError:
            return 0

    def get_item(self, idx: int) -> Tuple[Dict, Dict]:
        raise NotImplementedError


@DATASET_REGISTRY.register(name="ScanReferSceneVerse")
class ScanReferSceneVerse(_SceneVerseTask):
    """(ref data/datasets/scanrefer.py:8-52)"""
    task_id = TASK_REFER
    evaluator = "ScanReferEval"

    def _load_lang(self):
        ids = set(self.scans.split_scan_ids(self.split))
        return [x for x in _read_jsonl(self._anno("refer", "scanrefer.jsonl"))
                if x["scan_id"] in ids]

    def get_item(self, idx):
        item = self.lang_data[idx]
        scene = self.scans.load(item["scan_id"])
        tgt = self._target_local_id(scene, item["target_id"])
        same = scene["label_count"][item["instance_type"]]
        return scene, {
            "task_id": TASK_REFER,
            "prompt_tokens": self.tokenizer(item["utterance"]),
            "tgt_object_ids": [tgt],
            "response_tokens": [],
            "meta_is_multiple": bool(same > 1),
            "meta_sentence": item["utterance"],
        }


class _ReferIt3D(_SceneVerseTask):
    """(ref data/datasets/referit3d.py:10-93)"""
    anno_name = "sr3d"
    task_id = TASK_REFER
    evaluator = "ReferIt3DEval"

    def _load_lang(self):
        ids = set(self.scans.split_scan_ids(self.split))
        data = [x for x in _read_jsonl(
                    self._anno("refer", f"{self.anno_name}.jsonl"))
                if x["scan_id"] in ids and len(x.get("tokens", [])) <= 24]
        node = self.cfg.data.get(type(self).__name__, {}) or {}
        if node.get("sr3d_plus_aug") and self.split == "train":
            data += [x for x in _read_jsonl(self._anno("refer", "sr3d+.jsonl"))
                     if x["scan_id"] in ids and len(x.get("tokens", [])) <= 24]
        return data

    def get_item(self, idx):
        item = self.lang_data[idx]
        scene = self.scans.load(item["scan_id"])
        tgt = self._target_local_id(scene, item["target_id"])
        count = scene["label_count"][item["instance_type"]]
        return scene, {
            "task_id": TASK_REFER,
            "prompt_tokens": self.tokenizer(item["utterance"]),
            "tgt_object_ids": [tgt],
            "response_tokens": [],
            "meta_is_hard": bool(count > 2),
            "meta_is_view_dependent":
                is_explicitly_view_dependent(item.get("tokens", [])),
            "meta_sentence": item["utterance"],
        }


@DATASET_REGISTRY.register(name="Sr3DSceneVerse")
class Sr3DSceneVerse(_ReferIt3D):
    anno_name = "sr3d"


@DATASET_REGISTRY.register(name="Nr3DSceneVerse")
class Nr3DSceneVerse(_ReferIt3D):
    anno_name = "nr3d"


@DATASET_REGISTRY.register(name="Multi3DReferSceneVerse")
class Multi3DReferSceneVerse(_SceneVerseTask):
    """(ref data/datasets/multi3drefer.py:8-47)"""
    task_id = TASK_REFER
    evaluator = "Multi3DReferEval"

    def _load_lang(self):
        ids = set(self.scans.split_scan_ids(self.split))
        path = self._anno("refer", f"multi3drefer_{self.split}.json")
        with open(path) as f:
            data = json.load(f)
        return [x for x in data if x["scene_id"] in ids]

    def get_item(self, idx):
        item = self.lang_data[idx]
        scene = self.scans.load(item["scene_id"])
        tgts = [self._target_local_id(scene, t)
                for t in item.get("object_ids", [])]
        return scene, {
            "task_id": TASK_REFER,
            "prompt_tokens": self.tokenizer(item["description"]),
            "tgt_object_ids": tgts,
            "response_tokens": [],
            "meta_eval_type": item.get("eval_type", "mt"),
            "meta_sentence": item["description"],
        }


@DATASET_REGISTRY.register(name="ScanQASceneVerse")
class ScanQASceneVerse(_SceneVerseTask):
    """(ref data/datasets/scanqa.py:11-96)"""
    task_id = TASK_QA
    evaluator = "ScanQAGenEval"

    def _load_lang(self):
        name = f"ScanQA_v1.0_{'train' if self.split == 'train' else 'val'}.json"
        with open(self._anno("qa", name)) as f:
            data = json.load(f)
        ids = set(self.scans.split_scan_ids(self.split))
        return [x for x in data if x["scene_id"] in ids]

    def get_item(self, idx):
        item = self.lang_data[idx]
        scene = self.scans.load(item["scene_id"])
        tgts = [self._target_local_id(scene, t)
                for t in item.get("object_ids", [])]
        answers = item.get("answers", [""])
        return scene, {
            "task_id": TASK_QA,
            "prompt_tokens": self.tokenizer(item["question"]),
            "tgt_object_ids": tgts,
            "response_tokens": self.gen_tokenizer(answers[0]),
            "meta_answers": answers,
            "meta_sentence": item["question"],
        }


@DATASET_REGISTRY.register(name="SQA3DSceneVerse")
class SQA3DSceneVerse(_SceneVerseTask):
    """(ref data/datasets/sqa3d.py:14-166)"""
    task_id = TASK_QA
    evaluator = "SQA3DGenEval"
    TYPES = ["what", "is", "how", "can", "which", "others"]

    def _load_lang(self):
        split = "train" if self.split == "train" else "val"
        with open(self._anno("sqa_task", "balanced",
                             f"v1_balanced_questions_{split}_scannetv2.json")) as f:
            questions = json.load(f)["questions"]
        with open(self._anno("sqa_task", "balanced",
                             f"v1_balanced_sqa_annotations_{split}_scannetv2.json")) as f:
            annos = {a["question_id"]: a
                     for a in json.load(f)["annotations"]}
        ids = set(self.scans.split_scan_ids(self.split))
        out = []
        for q in questions:
            if q["scene_id"] in ids and q["question_id"] in annos:
                q = dict(q)
                q["answers"] = [a["answer"]
                                for a in annos[q["question_id"]]["answers"]]
                out.append(q)
        return out

    def _qtype(self, question: str) -> int:
        first = question.lower().split()[0] if question else ""
        for i, t in enumerate(self.TYPES[:-1]):
            if first.startswith(t):
                return i
        return len(self.TYPES) - 1

    def get_item(self, idx):
        item = self.lang_data[idx]
        scene = self.scans.load(item["scene_id"])
        situation = item.get("situation", "")
        question = item["question"]
        prompt = f"{situation} {question}".strip()
        answers = item.get("answers", [""])
        return scene, {
            "task_id": TASK_QA,
            "prompt_tokens": self.tokenizer(prompt),
            "tgt_object_ids": [],
            "response_tokens": self.gen_tokenizer(answers[0]),
            "meta_answers": answers,
            "meta_sqa_type": self._qtype(question),
            "meta_sentence": prompt,
        }


@DATASET_REGISTRY.register(name="Scan2CapSceneVerse")
class Scan2CapSceneVerse(ScanReferSceneVerse):
    """Dense captioning over the ScanRefer corpus
    (ref data/datasets/scan2cap.py:4-34)."""
    task_id = TASK_CAPTION
    evaluator = "Scan2CapEval"

    def _load_lang(self):
        data = super()._load_lang()
        if self.split != "train":
            # dedup to unique objects for eval (ref scan2cap.py:10-24)
            seen = set()
            uniq = []
            for x in data:
                key = f"{x['scan_id']}|{x['target_id']}"
                if key not in seen:
                    seen.add(key)
                    uniq.append(x)
            data = uniq
        return data

    @lru_cache(maxsize=None)
    def _refs_for(self, scan_id: str, target_id: int) -> tuple:
        return tuple(x["utterance"] for x in self.lang_data
                     if x["scan_id"] == scan_id
                     and int(x["target_id"]) == int(target_id))

    def get_item(self, idx):
        item = self.lang_data[idx]
        scene = self.scans.load(item["scan_id"])
        tgt = self._target_local_id(scene, item["target_id"])
        return scene, {
            "task_id": TASK_CAPTION,
            "prompt_tokens": [],
            "tgt_object_ids": [tgt],
            "response_tokens": self.gen_tokenizer(item["utterance"]),
            "meta_caption": item["utterance"],
            "meta_corpus_key": f"{item['scan_id']}|{item['target_id']}",
            "meta_ref_captions": list(
                self._refs_for(item["scan_id"], int(item["target_id"]))),
        }
