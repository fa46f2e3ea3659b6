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


def param_spec(path: str, x: jax.Array, cfg: MeshConfig) -> P:
    """FSDP rule: shard the largest dim of big params over 'fsdp';
    everything else replicated.  (With fsdp=1 this is pure DP.)"""
    if cfg.fsdp <= 1 or x.ndim < 1 or x.size < cfg.fsdp_min_size:
        return P()
    dims = list(x.shape)
    axis = int(np.argmax(dims))
    if dims[axis] % cfg.fsdp != 0:
        return P()
    spec = [None] * x.ndim
    spec[axis] = "fsdp"
    return P(*spec)


def shard_params(params: Any, mesh: Mesh, cfg: MeshConfig) -> Any:
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, x in flat:
        name = "/".join(str(p) for p in path)
        spec = param_spec(name, x, cfg)
        out.append(jax.device_put(x, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
