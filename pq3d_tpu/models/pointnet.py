"""PointNet++ set-abstraction encoder (flax linen).

Re-design of the reference's PointNetPP (reference:
modules/layers/pointnet.py:22-63 and the CUDA-backed
modules/third_party/pointnet2/pointnet2_modules.py:26-161) on the JAX
sampling substrate (:mod:`pq3d_tpu.ops.sampling`): FPS -> ball query ->
grouping -> shared MLP -> max-pool, finishing with a global stage.

Input: (B, N, 3+C) per-object point clouds (xyz + features); output (B, D).
All ops vmapped over the object batch; shapes static.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.ops import sampling

conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class SharedMLP(nn.Module):
    """Per-point MLP: Dense + BN + ReLU stack (ref pytorch_utils.py:12-36
    SharedMLP = Conv2d(1x1) + BatchNorm2d + ReLU)."""
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, kernel_init=conv_init,
                         name=f"dense{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        return x


class PointnetSAModule(nn.Module):
    """One set-abstraction stage (ref pointnet2_modules.py:26-161).

    npoint=None -> global stage (group all points, single max-pool).
    """
    mlp: Sequence[int]
    npoint: Optional[int] = None
    radius: float = 0.2
    nsample: int = 32
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 train: bool = False):
        if self.npoint is not None:
            centers_idx = sampling.furthest_point_sample_batched(
                xyz, self.npoint)
            centers = sampling.gather_centers_batched(xyz, centers_idx)
            grouped = sampling.query_and_group_batched(
                xyz, centers, feats, self.radius, self.nsample,
                self.use_xyz)                # (B, M, S, C')
        else:
            centers = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            g = xyz[:, None, :, :] if feats is None else (
                jnp.concatenate([xyz, feats], axis=-1)[:, None, :, :]
                if self.use_xyz else feats[:, None, :, :])
            grouped = g                       # (B, 1, N, C')
        h = SharedMLP(self.mlp, name="mlp")(grouped, train)
        pooled = h.max(axis=2)                # (B, M, C_out)
        return centers, pooled


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (ref
    pointnet2_modules.py:78-161 PointnetSAModuleMSG): one FPS center set,
    grouped at several (radius, nsample) scales, each scale through its
    own shared MLP, features concatenated across scales."""
    mlps: Sequence[Sequence[int]]
    npoint: int = 128
    radii: Sequence[float] = (0.2, 0.4)
    nsamples: Sequence[int] = (16, 32)
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 train: bool = False):
        if not (len(self.mlps) == len(self.radii) == len(self.nsamples)):
            # zip() would silently drop the extra scales
            raise ValueError(
                f"MSG scale specs disagree: {len(self.mlps)} mlps, "
                f"{len(self.radii)} radii, {len(self.nsamples)} nsamples")
        centers_idx = sampling.furthest_point_sample_batched(
            xyz, self.npoint)
        centers = sampling.gather_centers_batched(xyz, centers_idx)
        outs = []
        for i, (r, ns, mlp) in enumerate(zip(self.radii, self.nsamples,
                                             self.mlps)):
            grouped = sampling.query_and_group_batched(
                xyz, centers, feats, r, ns, self.use_xyz)  # (B, M, S, C')
            h = SharedMLP(tuple(mlp), name=f"mlp{i}")(grouped, train)
            outs.append(h.max(axis=2))                     # (B, M, C_i)
        return centers, jnp.concatenate(outs, axis=-1)


class PointNetPP(nn.Module):
    """3-stage SA encoder with fixed spec (ref object_encoder.py:22-28 /
    pointnet.py:22-63): 32/16/global points, radii 0.2/0.4, MLPs ending 768.
    (B, N, 3+C) -> (B, mlps[-1][-1])."""
    sa_n_points: Sequence[Optional[int]] = (32, 16, None)
    sa_n_samples: Sequence[int] = (32, 32, 32)
    sa_radii: Sequence[float] = (0.2, 0.4, 100.0)
    sa_mlps: Sequence[Sequence[int]] = (
        (64, 64, 128), (128, 128, 256), (256, 512, 768))

    @nn.compact
    def __call__(self, pts: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        train = not deterministic
        xyz, feats = pts[..., :3], pts[..., 3:]
        if feats.shape[-1] == 0:
            feats = None
        for i, (np_, ns, r, mlp) in enumerate(zip(
                self.sa_n_points, self.sa_n_samples, self.sa_radii,
                self.sa_mlps)):
            xyz, feats = PointnetSAModule(
                mlp=tuple(mlp), npoint=np_, radius=r, nsample=ns,
                name=f"sa{i}")(xyz, feats, train)
        return feats[:, 0, :]  # global stage -> (B, D)
