"""Label conversion + answer vocabularies.

Mirrors the reference's LabelConverter and answer-vocab machinery
(reference: data/data_utils.py:99-138 LabelConverter, :269-312 answer
vocabs): ScanNet tsv label mapping (raw / nyu40 / scannet200) and
classifier-QA answer dictionaries built from annotation files.
"""
from __future__ import annotations

import csv
import json
import os
from collections import Counter
from typing import Dict, List, Optional

from pq3d_tpu.data.scannet200_constants import (CLASS_LABELS_200,
                                                RAW_ID_TO_200_ID,
                                                VALID_CLASS_IDS_200)


_SCANNET18 = {
    "cabinet": 0, "bed": 1, "chair": 2, "sofa": 3, "table": 4, "door": 5,
    "window": 6, "bookshelf": 7, "picture": 8, "counter": 9, "desk": 10,
    "curtain": 11, "refrigerator": 12, "shower curtain": 13, "toilet": 14,
    "sink": 15, "bathtub": 16, "others": 17}


class LabelConverter:
    """ScanNet label-space conversions from the combined tsv
    (ref data_utils.py:99-138).  Without the tsv on disk, the ScanNet200
    mapping from the benchmark constants still works (raw names matching a
    ScanNet200 class name map directly; everything else -> ignore)."""

    def __init__(self, tsv_path: Optional[str] = None):
        self.raw_name_to_id: Dict[str, int] = {}
        self.raw_name_to_scannet_raw_id: Dict[str, int] = {}
        self.scannet_raw_id_to_raw_name: Dict[int, str] = {}
        self.scannet_raw_id_to_nyu40_id: Dict[int, int] = {}
        self.nyu40id_to_id: Dict[int, int] = {}
        # row-index label (the reference's sequential "raw id") -> 18-class
        # benchmark id via nyu40 name (ref data_utils.py:120-127)
        self.id_to_scannetid: Dict[int, int] = {}
        self.has_tsv = bool(tsv_path and os.path.exists(tsv_path))
        if self.has_tsv:
            with open(tsv_path, encoding="utf-8") as f:
                rows = list(csv.reader(f, delimiter="\t", quotechar='"'))
            for i, row in enumerate(rows[1:]):
                rid = i          # sequential row id
                scannet_raw_id = int(row[0])
                raw_name = row[1]
                nyu40_id = int(row[4])
                nyu40_name = row[7]
                self.raw_name_to_id[raw_name] = rid
                self.raw_name_to_scannet_raw_id[raw_name] = scannet_raw_id
                self.scannet_raw_id_to_raw_name[scannet_raw_id] = raw_name
                self.scannet_raw_id_to_nyu40_id[scannet_raw_id] = nyu40_id
                self.nyu40id_to_id[nyu40_id] = rid
                self.id_to_scannetid[rid] = _SCANNET18.get(
                    nyu40_name, _SCANNET18["others"])
        self.scannet_raw_id_to_scannet200_id = dict(RAW_ID_TO_200_ID)
        self.scannet200_id_to_name = {i: n for i, n in
                                      enumerate(CLASS_LABELS_200)}

    def raw_to_scannet200(self, raw_id: int, ignore: int = -100) -> int:
        return self.scannet_raw_id_to_scannet200_id.get(int(raw_id), ignore)

    def name_to_scannet200(self, name: str, ignore: int = -100) -> int:
        """Raw category name -> ScanNet200 class id.  With the tsv this is
        name -> scannet raw id -> 200-id (ref sceneverse_instseg.py:73-80 +
        map_to_scannet200_id:238-243); without it, exact-name lookup in the
        benchmark class list."""
        if self.has_tsv:
            rid = self.raw_name_to_scannet_raw_id.get(name)
            if rid is None:
                return ignore
            return self.raw_to_scannet200(rid, ignore)
        try:
            return CLASS_LABELS_200.index(name)
        except ValueError:
            return ignore


class AnswerVocab:
    """Answer dictionary for classifier-style QA heads
    (ref data_utils.py ScanQAAnswer / SQA3DAnswer): answers sorted by
    frequency with stable itos/stoi."""

    def __init__(self, answers: List[str]):
        counts = Counter(answers)
        self.vocab = sorted(counts, key=lambda a: (-counts[a], a))
        self._stoi = {a: i for i, a in enumerate(self.vocab)}

    def __len__(self):
        return len(self.vocab)

    def stoi(self, answer: str) -> int:
        return self._stoi.get(answer, -1)

    def itos(self, idx: int) -> str:
        return self.vocab[idx] if 0 <= idx < len(self.vocab) else ""

    def multihot(self, answers: List[str]):
        import numpy as np
        v = np.zeros(len(self.vocab), np.float32)
        for a in answers:
            i = self.stoi(a)
            if i >= 0:
                v[i] = 1.0
        return v

    @classmethod
    def from_scanqa_train(cls, base_dir: str) -> "AnswerVocab":
        """(ref scanqa_eval.py:20-26)"""
        path = os.path.join(base_dir, "ScanNet", "annotations", "qa",
                            "ScanQA_v1.0_train.json")
        with open(path) as f:
            data = json.load(f)
        return cls([a for item in data for a in item.get("answers", [])])

    @classmethod
    def from_sqa3d_dict(cls, base_dir: str) -> "AnswerVocab":
        """(ref sqa3d_eval.py:18-26)"""
        path = os.path.join(base_dir, "ScanNet", "annotations", "sqa_task",
                            "answer_dict.json")
        with open(path) as f:
            data = json.load(f)[0]
        return cls(list(data.keys()))
