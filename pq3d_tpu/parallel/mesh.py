"""Mesh construction and sharding rules.

Design (jax-ml scaling-book recipe): pick a mesh, annotate shardings on the
inputs/params, let XLA insert the collectives.

Axes:
  data  — batch (scenes); gradient psum rides ICI (DDP parity with the
          reference's Accelerate/NCCL allreduce, trainer/build.py:123-129)
  fsdp  — optional parameter/optimizer sharding (ZeRO-3 style): large 2D+
          params are sharded on their largest dim and all-gathered by XLA
          just-in-time
  tp    — reserved tensor-parallel axis for the decoder FFN/attention
          (hidden 768 is small; tp>1 is for scale-out experiments)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1          # -1: all remaining devices
    fsdp: int = 1
    tp: int = 1
    fsdp_min_size: int = 2 ** 16   # only shard params at least this big


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    dp = cfg.data if cfg.data > 0 else n // (cfg.fsdp * cfg.tp)
    assert dp * cfg.fsdp * cfg.tp == n, \
        f"mesh {dp}x{cfg.fsdp}x{cfg.tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, cfg.fsdp, cfg.tp)
    return Mesh(arr, axis_names=("data", "fsdp", "tp"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array in the batch pytree along its leading (scene) dim."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


# Megatron-style tensor-parallel rules keyed on flax param-path fragments.
# Column-parallel (shard output features): attention q/k/v projections and
# FFN up-projections.  Row-parallel (shard input features): attention output
# projections and FFN down-projections.  XLA's SPMD partitioner inserts the
# all-reduce after each row-parallel matmul automatically.
_TP_COL = ("q_proj/", "k_proj/", "v_proj/", "w_qs/", "w_ks/", "w_vs/",
           "/q/", "/k/", "/v/", "/wi/", "FFNLayer_0/Dense_0/",
           "Dense_0/kernel")   # FFN up (anonymous first Dense in FFNLayer)
_TP_ROW = ("out_proj/", "/o/", "/wo/", "Dense_1/kernel")


def tp_spec(path: str, x: jax.Array, cfg: MeshConfig) -> Optional[P]:
    """Tensor-parallel spec for a param path, or None if no rule matches."""
    if cfg.tp <= 1 or x.ndim == 0:
        return None
    is_col = any(f in path for f in _TP_COL)
    is_row = any(f in path for f in _TP_ROW)
    if not (is_col or is_row):
        return None
    if x.ndim == 1:  # bias
        if is_col and x.shape[0] % cfg.tp == 0:
            return P("tp")
        return P()
    axis = x.ndim - 1 if is_col else x.ndim - 2
    if x.shape[axis] % cfg.tp != 0:
        return None
    spec = [None] * x.ndim
    spec[axis] = "tp"
    return P(*spec)


def param_spec(path: str, x: jax.Array, cfg: MeshConfig) -> P:
    """Combined sharding rule: TP where a Megatron rule matches, then FSDP
    (shard the largest unsharded dim of big params); replicated otherwise.
    (With fsdp=tp=1 this is pure DP.)"""
    tp = tp_spec(path, x, cfg)
    spec = list(tp) if tp is not None else []
    spec += [None] * (x.ndim - len(spec))   # P() is shorter than ndim
    if x.ndim < 1 or x.size < cfg.fsdp_min_size or cfg.fsdp <= 1:
        return P(*spec) if tp is not None else P()
    dims = [(-1 if spec[i] is not None else x.shape[i])
            for i in range(x.ndim)]
    axis = int(np.argmax(dims))
    if spec[axis] is None and x.shape[axis] % cfg.fsdp == 0:
        spec[axis] = "fsdp"
    return P(*spec)


def path_name(path) -> str:
    """Flatten a tree path to 'a/b/c' (DictKey-aware)."""
    return "/".join(getattr(p, "key", str(p)) for p in path)


def shard_params(params: Any, mesh: Mesh, cfg: MeshConfig) -> Any:
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, x in flat:
        spec = param_spec(path_name(path) + "/", x, cfg)
        out.append(jax.device_put(x, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
