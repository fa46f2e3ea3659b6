"""Minimal OmegaConf-style configuration system.

The reference uses Hydra + OmegaConf: YAML files with ``${a.b.c}``
interpolation, dotted CLI overrides, and attribute access (reference:
run.py:12-13, configs/*.yaml).  Neither library is available here, so this
module provides the same surface on top of PyYAML:

- ``Config``: dict-backed node with attribute access, ``get``, ``update``
- ``${path.to.key}`` string interpolation (full-string and embedded)
- dotted overrides ``a.b.c=value`` with YAML-typed values
- round-trips to plain dicts / YAML for checkpoint snapshots
"""
from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, Iterator, List, Mapping, Optional

import yaml

_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


class Config(Mapping):
    """A nested, attribute-accessible config node."""

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self._data[k] = _wrap(v)

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key) -> bool:
        return key in self._data

    # -- attribute access --------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(f"config has no key {key!r}") from e

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key not in self._data:
            self._data[key] = _wrap(default)
        return self._data[key]

    def update(self, other: Mapping) -> None:
        """Recursive merge: dict values merge, scalars/lists overwrite."""
        for k, v in other.items():
            if k in self._data and isinstance(self._data[k], Config) and isinstance(v, Mapping):
                self._data[k].update(v)
            else:
                self._data[k] = _wrap(v)

    def to_dict(self) -> Dict[str, Any]:
        return {k: (v.to_dict() if isinstance(v, Config) else copy.deepcopy(v))
                for k, v in self._data.items()}

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def clone(self) -> "Config":
        return Config(self.to_dict())

    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, Config) and part in node:
                node = node[part]
            elif isinstance(node, list) and part.isdigit() and int(part) < len(node):
                node = node[int(part)]
            else:
                return default
        return node

    def set_dotted(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, Config):
                nxt = Config()
                node[part] = nxt
            node = nxt
        node[parts[-1]] = value

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config(dict(value))
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def _resolve_node(value: Any, root: Config) -> Any:
    if isinstance(value, Config):
        for k in list(value.keys()):
            value[k] = _resolve_node(value[k], root)
        return value
    if isinstance(value, list):
        return [_resolve_node(v, root) for v in value]
    if isinstance(value, str):
        full = _INTERP_RE.fullmatch(value)
        if full:  # full-string interpolation preserves the referenced type
            ref = root.select(full.group(1), default=_MISSING)
            if ref is _MISSING:
                raise KeyError(f"interpolation {value!r} not found")
            return _resolve_node(copy.deepcopy(ref) if isinstance(ref, (Config, list)) else ref, root)

        def sub(m):
            ref = root.select(m.group(1), default=_MISSING)
            if ref is _MISSING:
                raise KeyError(f"interpolation {m.group(0)!r} not found")
            return str(ref)
        return _INTERP_RE.sub(sub, value)
    return value


class _Missing:
    pass


_MISSING = _Missing()


def default_config_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "configs")


def _parse_override_value(raw: str) -> Any:
    try:
        val = yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw
    if isinstance(val, str):
        # YAML 1.1 misses bare scientific notation like "1e-4"
        try:
            return float(val)
        except ValueError:
            return val
    return val


def load_config(path: str, overrides: Optional[List[str]] = None,
                resolve: bool = True) -> Config:
    """Load a YAML config, apply ``key.path=value`` overrides, interpolate.

    ``path`` may be an absolute/relative file path or a bare config name
    looked up in the packaged ``configs/`` directory.
    """
    if not os.path.exists(path):
        candidate = os.path.join(default_config_dir(), path)
        if not candidate.endswith((".yaml", ".yml")):
            candidate += ".yaml"
        if os.path.exists(candidate):
            path = candidate
        else:
            raise FileNotFoundError(f"config not found: {path}")
    with open(path) as f:
        cfg = Config(yaml.safe_load(f) or {})
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must look like key=value, got {ov!r}")
        key, raw = ov.split("=", 1)
        cfg.set_dotted(key.strip(), _parse_override_value(raw))
    if resolve:
        _resolve_node(cfg, cfg)
    return cfg
