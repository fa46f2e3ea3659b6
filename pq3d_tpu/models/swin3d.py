"""Swin3D-style sparse window-attention U-Net (flax linen).

TPU-native stand-in for the ``Swin3DUNet`` backbone the reference's
``PCDMask3DSwin3DEncoder`` expects but does not vendor
(modules/vision/pcd_mask3d_encoder.py:65-112 — the backbone is an external
dependency there).  Rather than porting the CUDA ragged-window kernels of
the Swin3D paper, windows are **dense** ``window^3`` cell grids built on the
host (:mod:`pq3d_tpu.ops.window_maps`): attention over a window is one
batched MXU attention over ``window^3`` tokens with an occupancy mask, and
the regular/shifted partitions are two different host-built packs (sparse
partitions need no cyclic shift).

Topology mirrors the Res16UNet contract so it is a drop-in backbone for
``SegVoxelEncoder``: stem conv at level 0, four stride-2 encoder stages of
Swin blocks at levels 1-4, a transpose-conv decoder with skip fusion, Swin
blocks on the way up, and the same ``(final, [L4, L3, L2, L1, L0])``
flat-layout outputs.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models.layers import MaskedBatchNorm
from pq3d_tpu.models.sparse_unet import (SparseConv, SparseConvTranspose,
                                         conv_init, flatten_maps,
                                         offset_scene_indices)
from pq3d_tpu.ops import window_maps
from pq3d_tpu.ops.sparse import fast_row_gather


def flatten_window_maps(maps: Dict[str, jnp.ndarray],
                        levels: Sequence[int]) -> Dict[str, jnp.ndarray]:
    """Batch (B, ...) window maps -> flat-layout maps (see flatten_maps).

    ``c2v`` entries index level-l rows -> offset by ``scene * P_l``;
    ``slot`` entries index window cells -> offset by
    ``scene * n_win_pad * w3``; -1 stays -1.

    Flat-packed batches (InstSegPipelineConfig.flat_pack) ship the packs
    already concatenated with offsets applied (collate_flat) — pass through.
    """
    if maps[f"win{levels[0]}s0_c2v"].ndim == 1:
        return {f"win{l}s{j}_{t}": maps[f"win{l}s{j}_{t}"]
                for l in levels for j in (0, 1) for t in ("c2v", "slot")}
    out: Dict[str, jnp.ndarray] = {}
    # all window maps are (B, n): the shared rebase flattens to (B*n,)
    off = offset_scene_indices

    for l in levels:
        p_l = maps[f"valid_{l}"].shape[1]
        for j in (0, 1):
            c2v = maps[f"win{l}s{j}_c2v"]
            slot = maps[f"win{l}s{j}_slot"]
            out[f"win{l}s{j}_c2v"] = off(c2v, p_l)
            out[f"win{l}s{j}_slot"] = off(slot, c2v.shape[1])
    return out


class WindowAttention(nn.Module):
    """Multi-head attention over dense window cells with occupancy masking
    and a learned relative-position bias (Swin3D's cRSE simplified to a
    per-offset table; offsets span (2*window-1)^3)."""
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, xw: jnp.ndarray, occ: jnp.ndarray) -> jnp.ndarray:
        nw, w3, c = xw.shape
        h = self.num_heads
        hd = self.dim // h
        rel_idx = jnp.asarray(window_maps.relative_position_index(self.window))
        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 3, h))
        qkv = nn.Dense(3 * self.dim, kernel_init=conv_init, name="qkv")(xw)
        qkv = qkv.reshape(nw, w3, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (nw, h, w3, hd)
        attn = jnp.einsum("nhqd,nhkd->nhqk", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        bias = table[rel_idx]                      # (w3, w3, h)
        attn = attn + bias.transpose(2, 0, 1)[None]
        attn = jnp.where(occ[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1).astype(xw.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, w3, self.dim)
        return nn.Dense(self.dim, kernel_init=conv_init, name="proj")(out)


class SwinBlock(nn.Module):
    """One sparse Swin block in flat layout: gather voxels into window
    cells -> LN -> window attention -> scatter back -> residual; then
    LN -> MLP -> residual on the flat tokens."""
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, c2v: jnp.ndarray, slot: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
        w3 = self.window ** 3
        occ = (c2v >= 0).reshape(-1, w3)
        xw = fast_row_gather(x, jnp.maximum(c2v, 0))
        xw = jnp.where((c2v >= 0)[:, None], xw, 0).reshape(-1, w3, self.dim)
        xw = nn.LayerNorm(name="norm1")(xw)
        aw = WindowAttention(self.dim, self.num_heads, self.window,
                             name="attn")(xw, occ)
        back = fast_row_gather(aw.reshape(-1, self.dim), jnp.maximum(slot, 0))
        back = jnp.where((slot >= 0)[:, None] & valid[:, None], back, 0)
        x = x + back
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(4 * self.dim, kernel_init=conv_init, name="mlp1")(y)
        y = nn.Dense(self.dim, kernel_init=conv_init, name="mlp2")(
            jax.nn.gelu(y))
        x = x + y
        return jnp.where(valid[:, None], x, 0)


class SwinStage(nn.Module):
    """``depth`` Swin blocks alternating regular / shifted partitions.

    ``remat=True`` checkpoints each block: the (nw, h, w3, w3) f32
    attention logits are the dominant training activation (GBs at the
    L1 voxel counts — full-scale training OOMs a 16 GB v5e without this)
    and are cheap to recompute in the backward."""
    dim: int
    depth: int
    num_heads: int
    window: int
    remat: bool = False

    @nn.compact
    def __call__(self, x, packs, valid):
        block_cls = nn.remat(SwinBlock) if self.remat else SwinBlock
        for i in range(self.depth):
            c2v, slot = packs[i % 2]
            x = block_cls(self.dim, self.num_heads, self.window,
                          name=f"block{i}")(x, c2v, slot, valid)
        return x


class Swin3DUNet(nn.Module):
    """Sparse Swin U-Net over host-built hierarchy + window maps.

    Same I/O contract as :class:`pq3d_tpu.models.sparse_unet.Res16UNet`:
    ``(x (B, P0, Cin), maps) -> (final (B, P0, out_channels),
    [L4, L3, L2, L1, L0] flat feature maps)``.  ``maps`` must additionally
    contain ``win{l}s{j}_c2v`` / ``win{l}s{j}_slot`` for l in 1..4
    (:func:`pq3d_tpu.ops.window_maps.build_swin_packs`).
    """
    out_channels: int = 200
    channels: Sequence[int] = (48, 96, 192, 384)   # stages at L1..L4
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    stem_dim: int = 48
    window: int = 4
    bn_momentum: float = 0.02
    grad_mode: str = "native"
    accum: str = "float32"
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, maps: Dict[str, jnp.ndarray],
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        flat_in = x.ndim == 2            # flat-packed layout
        if flat_in:
            b, (p0, cin) = 1, x.shape
        else:
            b, p0, cin = x.shape
        fm = flatten_maps(maps)
        wm = flatten_window_maps(maps, levels=(1, 2, 3, 4))
        v = [fm[f"valid_{l}"] for l in range(5)]
        x = x.reshape(b * p0, cin)
        if flat_in:
            p0 = fm["valid_0"].shape[0]
            x = jnp.pad(x, ((0, p0 - x.shape[0]), (0, 0))) \
                if x.shape[0] != p0 else x
        bn = lambda name: MaskedBatchNorm(self.bn_momentum, name=name)
        gm = self.grad_mode

        # stem: one 3^3 sparse conv at level 0
        out = SparseConv(self.stem_dim, accum=self.accum, grad_mode=gm,
                         name="stem")(x, fm["nbr3_0"], v[0])
        out = jax.nn.relu(bn("stem_bn")(out, v[0], not train))
        skips = [out]

        # encoder: stride-2 down conv then a Swin stage per level
        for i in range(4):
            l = i + 1
            out = SparseConv(self.channels[i], accum=self.accum, grad_mode=gm,
                             name=f"down{l}")(
                out, fm[f"child_{i}"], v[l],
                fm[f"parent_{i}"], fm[f"parent_off_{i}"], v[i])
            out = jax.nn.relu(bn(f"down{l}_bn")(out, v[l], not train))
            packs = [(wm[f"win{l}s{j}_c2v"], wm[f"win{l}s{j}_slot"])
                     for j in (0, 1)]
            out = SwinStage(self.channels[i], self.depths[i],
                            self.num_heads[i], self.window, self.remat,
                            name=f"stage{l}")(out, packs, v[l])
            skips.append(out)

        feature_maps = [out]  # L4

        # decoder: transpose conv up, fuse skip, one Swin block per level
        for i in range(4):
            lvl = 3 - i
            cdec = self.channels[lvl - 1] if lvl >= 1 else self.stem_dim
            out = SparseConvTranspose(cdec, grad_mode=gm, name=f"up{lvl}")(
                out, fm[f"parent_{lvl}"], fm[f"parent_off_{lvl}"], v[lvl],
                fm[f"child_{lvl}"], v[lvl + 1])
            out = jax.nn.relu(bn(f"up{lvl}_bn")(out, v[lvl], not train))
            skip = nn.Dense(cdec, use_bias=False, kernel_init=conv_init,
                            name=f"skip{lvl}")(skips[lvl])
            out = out + skip
            if lvl >= 1:
                packs = [(wm[f"win{lvl}s{j}_c2v"], wm[f"win{lvl}s{j}_slot"])
                         for j in (0, 1)]
                out = SwinStage(cdec, 1, self.num_heads[lvl - 1],
                                self.window, self.remat,
                                name=f"dec{lvl}")(out, packs, v[lvl])
            else:
                out = SparseConv(cdec, accum=self.accum, grad_mode=gm,
                                 name="dec0")(out, fm["nbr3_0"], v[0])
                out = jax.nn.relu(bn("dec0_bn")(out, v[0], not train))
            feature_maps.append(out)

        final = nn.Dense(self.out_channels, kernel_init=conv_init,
                         name="final")(out)
        final = jnp.where(v[0][:, None], final, 0)
        return final.reshape(b, p0, self.out_channels), feature_maps
