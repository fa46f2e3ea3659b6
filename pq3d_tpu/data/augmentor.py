"""Config-driven augmentation queue.

Equivalent of the reference's DataAugmentor (reference:
data/datasets/data_augmentor.py, registered but unused by the shipped
configs): a named pipeline of scene/object augmentations applied in order,
selected from a registry by config.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np

from pq3d_tpu.registry import Registry

AUGMENTOR_REGISTRY = Registry("augmentor")


@AUGMENTOR_REGISTRY.register(name="random_flip")
def random_flip(scene: Dict, rng: np.random.Generator, axes=(0, 1), p=0.5):
    pts = scene["points"]
    for ax in axes:
        if rng.random() < p:
            pts[:, ax] = pts[:, ax].max() - pts[:, ax]
    return scene


@AUGMENTOR_REGISTRY.register(name="random_rotate_z")
def random_rotate_z(scene: Dict, rng: np.random.Generator,
                    max_angle=2 * np.pi):
    theta = rng.uniform(0, max_angle)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    scene["points"] = scene["points"] @ rot.T
    return scene


@AUGMENTOR_REGISTRY.register(name="random_scale")
def random_scale(scene: Dict, rng: np.random.Generator, lo=0.9, hi=1.1):
    scene["points"] = scene["points"] * rng.uniform(lo, hi)
    return scene


@AUGMENTOR_REGISTRY.register(name="random_translate")
def random_translate(scene: Dict, rng: np.random.Generator, sigma=0.1):
    scene["points"] = scene["points"] + rng.normal(0, sigma, 3).astype(
        np.float32)
    return scene


@AUGMENTOR_REGISTRY.register(name="color_jitter")
def color_jitter(scene: Dict, rng: np.random.Generator, sigma=0.05):
    scene["colors"] = np.clip(
        scene["colors"] + rng.normal(0, sigma, scene["colors"].shape), -1, 1
    ).astype(np.float32)
    return scene


@AUGMENTOR_REGISTRY.register(name="point_dropout")
def point_dropout(scene: Dict, rng: np.random.Generator, p=0.05):
    keep = rng.random(len(scene["points"])) >= p
    for k in ("points", "colors", "instance_labels", "segment_id"):
        if k in scene:
            scene[k] = scene[k][keep]
    return scene


class DataAugmentor:
    """Apply a configured list of augmentations in order
    (ref data_augmentor.py).  Config entries: [{name: ..., args: {...}}]."""

    def __init__(self, aug_list: Sequence):
        self.steps: List = []
        for entry in aug_list or []:
            if isinstance(entry, str):
                name, args = entry, {}
            else:
                name = entry["name"] if isinstance(entry, dict) else entry.get("name")
                args = dict(entry.get("args", {}) or {})
            self.steps.append((AUGMENTOR_REGISTRY.get(name), args))

    def __call__(self, scene: Dict, rng: np.random.Generator) -> Dict:
        for fn, args in self.steps:
            scene = fn(scene, rng, **args)
        return scene
