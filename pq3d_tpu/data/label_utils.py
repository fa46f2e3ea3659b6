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


class LabelConverter:
    """ScanNet label-space conversions from the combined tsv
    (ref data_utils.py:99-138).  Without the tsv on disk, the ScanNet200
    mapping from the benchmark constants still works."""

    def __init__(self, tsv_path: Optional[str] = None):
        self.raw_name_to_scannet_raw_id: Dict[str, int] = {}
        self.scannet_raw_id_to_nyu40_id: Dict[int, int] = {}
        self.id_to_scannetid: Dict[int, int] = {}
        if tsv_path and os.path.exists(tsv_path):
            with open(tsv_path) as f:
                for row in csv.DictReader(f, delimiter="\t"):
                    rid = int(row["id"])
                    self.raw_name_to_scannet_raw_id[row["raw_category"]] = rid
                    if row.get("nyu40id"):
                        self.scannet_raw_id_to_nyu40_id[rid] = int(row["nyu40id"])
        self.scannet_raw_id_to_scannet200_id = dict(RAW_ID_TO_200_ID)
        self.scannet200_id_to_name = {i: n for i, n in
                                      enumerate(CLASS_LABELS_200)}

    def raw_to_scannet200(self, raw_id: int, ignore: int = -100) -> int:
        return self.scannet_raw_id_to_scannet200_id.get(int(raw_id), ignore)

    def name_to_scannet200(self, name: str, ignore: int = -100) -> int:
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
