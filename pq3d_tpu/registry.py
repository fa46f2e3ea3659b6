"""Name -> implementation registries.

The reference framework selects trainers / models / modules / datasets /
losses / evaluators by name from YAML configs through fvcore ``Registry``
objects (reference: trainer/build.py:26, model/build.py:6, modules/build.py:6-9,
data/build.py:7, optim/loss/loss.py:7, evaluator/build.py:10).  We provide the
same capability with a dependency-free implementation.
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, Optional


class Registry:
    """A string -> object mapping supporting decorator registration."""

    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    def register(self, obj: Optional[Any] = None, *, name: Optional[str] = None):
        if obj is None:  # used as @REG.register() or @REG.register(name=...)
            def deco(o):
                self._do_register(name or o.__name__, o)
                return o
            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._map and self._map[name] is not obj:
            raise KeyError(f"{name!r} already registered in registry {self._name!r}")
        self._map[name] = obj

    def get(self, name: str) -> Any:
        if name not in self._map:
            raise KeyError(
                f"{name!r} not found in registry {self._name!r}. "
                f"Available: {sorted(self._map)}")
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def __iter__(self) -> Iterator[str]:
        return iter(self._map)

    def keys(self):
        return self._map.keys()


# Global registries, one per extension point (mirrors the reference's set).
TRAINER_REGISTRY = Registry("trainer")
MODEL_REGISTRY = Registry("model")
VISION_REGISTRY = Registry("vision")
LANGUAGE_REGISTRY = Registry("language")
GROUNDING_REGISTRY = Registry("grounding")
HEADS_REGISTRY = Registry("heads")
DATASET_REGISTRY = Registry("dataset")
DATASETWRAPPER_REGISTRY = Registry("dataset_wrapper")
LOSS_REGISTRY = Registry("loss")
OPTIM_REGISTRY = Registry("optim")
EVALUATOR_REGISTRY = Registry("evaluator")

_MODULE_REGISTRIES = (
    VISION_REGISTRY, LANGUAGE_REGISTRY, GROUNDING_REGISTRY, HEADS_REGISTRY,
)


def find_module(name: str) -> Any:
    """Look a module class up across all module registries.

    Mirrors the reference's build_module_by_name which scans its four module
    registries (reference: modules/build.py:24-31).
    """
    for reg in _MODULE_REGISTRIES:
        if name in reg:
            return reg.get(name)
    raise KeyError(f"module {name!r} not found in any module registry")
