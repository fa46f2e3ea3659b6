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


class PointnetSAModuleVotes(nn.Module):
    """VoteNet-style set abstraction: returns the FPS indices (for GT vote
    lookup), accepts externally-supplied indices, and supports max/avg/rbf
    pooling + radius-normalized local XYZ
    (ref pointnet2_modules.py:164-271 PointnetSAModuleVotes).

    Returns ``(new_xyz (B, M, 3), new_feats (B, M, C_out), inds (B, M))``;
    with ``ret_unique_cnt`` also the per-center count of distinct grouped
    neighbors (ref QueryAndGroup ret_unique_cnt, pointnet2_utils.py:291+).
    """
    mlp: Sequence[int]
    npoint: int = 256
    radius: float = 0.3
    nsample: int = 16
    use_xyz: bool = True
    pooling: str = "max"            # 'max' | 'avg' | 'rbf'
    sigma: Optional[float] = None   # rbf width (default radius/2)
    normalize_xyz: bool = False
    ret_unique_cnt: bool = False

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 inds: Optional[jnp.ndarray] = None, train: bool = False):
        if inds is None:
            inds = sampling.furthest_point_sample_batched(xyz, self.npoint)
        new_xyz = sampling.gather_centers_batched(xyz, inds)
        idx = sampling.ball_query_batched(xyz, new_xyz, self.radius,
                                          self.nsample)       # (B, M, S)
        b, n, _ = xyz.shape
        m = idx.shape[1]
        off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
        fi = (idx + off).reshape(-1)
        gx = sampling._flat_gather(xyz.reshape(b * n, 3), fi
                                   ).reshape(b, m, self.nsample, 3)
        grouped_xyz = gx - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if feats is not None:
            c = feats.shape[-1]
            gf = sampling._flat_gather(feats.reshape(b * n, c), fi
                                       ).reshape(b, m, self.nsample, c)
            grouped = (jnp.concatenate([grouped_xyz, gf], axis=-1)
                       if self.use_xyz else gf)
        else:
            grouped = grouped_xyz
        h = SharedMLP(tuple(self.mlp), name="mlp")(grouped, train)
        if self.pooling == "max":
            pooled = h.max(axis=2)
        elif self.pooling == "avg":
            pooled = h.mean(axis=2)
        elif self.pooling == "rbf":
            sigma = self.sigma if self.sigma is not None else self.radius / 2
            rbf = jnp.exp(-jnp.sum(grouped_xyz ** 2, -1)
                          / (sigma ** 2) / 2)          # (B, M, S)
            pooled = jnp.sum(h * rbf[..., None], axis=2) / float(self.nsample)
        else:
            raise NotImplementedError(f"pooling {self.pooling!r}")
        if not self.ret_unique_cnt:
            return new_xyz, pooled, inds
        # distinct grouped indices per center (CUDA ball query fills the
        # ragged tail by repeating the first hit)
        srt = jnp.sort(idx, axis=-1)
        uniq = 1 + jnp.sum(srt[..., 1:] != srt[..., :-1], axis=-1)
        return new_xyz, pooled, inds, uniq.astype(jnp.int32)


class PointnetSAModuleMSGVotes(nn.Module):
    """Multi-scale VoteNet set abstraction: one (optionally external) FPS
    index set, per-scale grouping + MLP, concat across scales, indices
    returned (ref pointnet2_modules.py:274-354)."""
    mlps: Sequence[Sequence[int]]
    npoint: int = 256
    radii: Sequence[float] = (0.2, 0.4)
    nsamples: Sequence[int] = (16, 32)
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 inds: Optional[jnp.ndarray] = None, train: bool = False):
        if not (len(self.mlps) == len(self.radii) == len(self.nsamples)):
            raise ValueError(
                f"MSG scale specs disagree: {len(self.mlps)} mlps, "
                f"{len(self.radii)} radii, {len(self.nsamples)} nsamples")
        if inds is None:
            inds = sampling.furthest_point_sample_batched(xyz, self.npoint)
        new_xyz = sampling.gather_centers_batched(xyz, inds)
        outs = []
        for i, (r, ns, mlp) in enumerate(zip(self.radii, self.nsamples,
                                             self.mlps)):
            grouped = sampling.query_and_group_batched(
                xyz, new_xyz, feats, r, ns, self.use_xyz)
            h = SharedMLP(tuple(mlp), name=f"mlp{i}")(grouped, train)
            outs.append(h.max(axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds
