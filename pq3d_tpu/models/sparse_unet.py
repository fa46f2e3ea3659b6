"""Sparse residual U-Net over host-built kernel maps (flax linen).

TPU-native re-design of the Minkowski ``Res16UNet34C`` backbone the reference
uses for voxels (reference: modules/third_party/mask3d/res16unet.py:9-314,
390-391; resnet_block.py BasicBlock).  Identical topology — conv0 (5^3) ->
4x stride-2 encoder ladder -> 4x transpose-conv decoder with skip concats ->
final 1x1 conv — but every sparse conv is a gather->GEMM over precomputed
neighbor maps (:mod:`pq3d_tpu.ops.kernel_maps`).

Performance-critical layout decision: the batch of scenes is **flattened**
into one (B*P_l, C) array per level, with neighbor indices offset per scene
on device.  A single large 2D gather stays on the TPU fast-gather path;
vmapping the conv over scenes instead produces batched-gather HLO that is
~3x slower (measured on v5e).  Batch norm and segment pooling operate on
the flat layout directly.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.ops import pallas_zt, sparse
from pq3d_tpu.models.layers import MaskedBatchNorm

conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def offset_scene_indices(idx: jnp.ndarray, target_p: int) -> jnp.ndarray:
    """Batch->flat index rebase: ``idx`` (B, P, ...) holds indices into a
    per-scene array of size ``target_p``; add ``scene * target_p`` and
    flatten the batch dim.  -1 (padding) stays -1.  Shared by the conv maps
    (flatten_maps below) and the swin window maps
    (models/swin3d.flatten_window_maps)."""
    b = idx.shape[0]
    shift = (jnp.arange(b, dtype=jnp.int32) * target_p).reshape(
        (b,) + (1,) * (idx.ndim - 1))
    return jnp.where(idx >= 0, idx + shift, -1).reshape(
        (-1,) + idx.shape[2:])


def flatten_maps(maps: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """(B, P_l, ...) index maps -> flat maps over B*P_l rows.

    Neighbor/child/parent indices get a per-scene offset; -1 stays -1.
    The ancestor table becomes absolute flat indices per level.
    """
    if maps["valid_0"].ndim == 1:
        # flat-packed layout (InstSegPipelineConfig.flat_pack): the host
        # already concatenated scenes and applied offsets
        return maps
    out: Dict[str, jnp.ndarray] = {}
    b = maps["valid_0"].shape[0]
    off = offset_scene_indices

    for l in range(5):
        p_l = maps[f"valid_{l}"].shape[1]
        out[f"valid_{l}"] = maps[f"valid_{l}"].reshape(-1)
        out[f"nbr3_{l}"] = off(maps[f"nbr3_{l}"], p_l)
        if f"zt{l}_base" in maps:
            # z-run bases are always >= 0 (non-neighbor slots are masked by
            # the codes), so every row gets the scene offset
            zb = maps[f"zt{l}_base"]
            shift = (jnp.arange(b, dtype=jnp.int32) * p_l).reshape(b, 1, 1)
            out[f"zt{l}_base"] = (zb + shift).reshape(-1, zb.shape[-1])
            out[f"zt{l}_code"] = maps[f"zt{l}_code"].reshape(
                (-1,) + maps[f"zt{l}_code"].shape[2:])
    if "nbr5_0" in maps:
        out["nbr5_0"] = off(maps["nbr5_0"], maps["valid_0"].shape[1])
    for l in range(4):
        p_l = maps[f"valid_{l}"].shape[1]
        p_next = maps[f"valid_{l+1}"].shape[1]
        out[f"child_{l}"] = off(maps[f"child_{l}"], p_l)
        out[f"parent_{l}"] = off(maps[f"parent_{l}"], p_next)
        out[f"parent_off_{l}"] = maps[f"parent_off_{l}"].reshape(-1)
    # ancestor: (B, 5, P0) -> per level (B*P0,) flat absolute index
    for l in range(5):
        p_l = maps[f"valid_{l}"].shape[1]
        out[f"ancestor_{l}"] = off(maps["ancestor"][:, l, :], p_l)
    if "stem_dense" in maps:
        # dense-block stem pack (ops/sparse.conv0_dense_block): blocks are
        # flat rows, cell slots offset by scene * nb * block^3, c2v (voxel
        # ids) by scene * P0
        nb = maps["stem_nbrblk"].shape[1]
        cells = maps["stem_c2v"].shape[1]
        out["stem_dense"] = maps["stem_dense"].reshape(
            b * nb, -1)
        out["stem_nbrblk"] = off(maps["stem_nbrblk"], nb)
        out["stem_slot"] = off(maps["stem_slot"], cells)
        out["stem_c2v"] = off(maps["stem_c2v"], maps["valid_0"].shape[1])
    return out


class SparseConv(nn.Module):
    """Kernel-map sparse conv layer; kernel volume inferred from the map.

    grad_mode 'scatter_free' switches training to the custom-VJP convs
    (ops/sparse.py): dx runs as a transpose-map gather-GEMM instead of the
    default XLA scatter-add, and the K x N x C gathered activations are
    recomputed in the backward rather than stored.  Down convs additionally
    need the dual (parent, parent_off, in_valid) maps.
    """
    out_channels: int
    use_bias: bool = False
    accum: str = "float32"   # 'float32' | 'bfloat16' (inference-only option)
    grad_mode: str = "native"  # 'native' | 'scatter_free'
    sorted_gather: bool = False  # monotonize maps + indices_are_sorted hint
    #   — chip-measured WASH (PERF.md round-2 ladder: 431.7 vs 424.7 ms
    #   base); kept only for A/B reruns, off in every shipped config
    int8_gather: bool = False  # int8-quantized tap gathers (inference lever;
    #   applies to the padded AND compact forward paths; ignored on the
    #   scatter_free training backward) — chip-measured WASH at C<=96 rows
    #   (PERF.md round-3: int8 rows < the 128 B lane granule, fetch count
    #   not bytes bounds it); kept only for A/B reruns

    @nn.compact
    def __call__(self, x, nbr, valid, parent=None, parent_off=None,
                 in_valid=None, zplan=None, pzt=None):
        if isinstance(nbr, dict):
            # tap-compacted plan (flat_pack + compact_conv); symmetric
            # stencils get the scatter-free compact backward under
            # grad_mode='scatter_free'
            k = nbr["in_idx"].shape[0]
            w = self.param("kernel", conv_init,
                           (k, x.shape[-1], self.out_channels))
            if self.grad_mode == "scatter_free":
                y = sparse.sparse_conv_compact_sym(
                    x, nbr, w, valid, accum_dtype=jnp.dtype(self.accum))
            else:
                y = sparse.sparse_conv_compact(
                    x, nbr, w, valid, accum_dtype=jnp.dtype(self.accum),
                    int8_gather=self.int8_gather)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.out_channels,))
                y = jnp.where(valid[..., None], y + b, 0)
            return y
        k = nbr.shape[-1]
        w = self.param("kernel", conv_init, (k, x.shape[-1], self.out_channels))
        acc = jnp.dtype(self.accum)
        sg = self.sorted_gather
        if (pzt is not None and k == 27 and parent is None
                and pallas_zt.pallas_zt_applicable(
                    nbr.shape[0], x.shape[-1], self.out_channels)):
            # windowed pallas conv: streaming-DMA windows + MXU one-hot
            # gather, breaking the random-fetch floor (chip_runs/0819d).
            # Always the custom-VJP form — autodiff cannot differentiate
            # through the manual-DMA kernel, and the symmetric-stencil
            # backward is the fast path anyway.
            import os as _os
            interp = bool(_os.environ.get("PQ3D_PALLAS_INTERPRET"))

            # device plans compact exceptions into exc_cap slots PER COLUMN;
            # a scene that overflows one column would silently lose conv
            # contributions, so route that (rare: cap is ~n/64, measured
            # exceptions are ~1%) batch through the baseline gather conv —
            # lax.cond executes only the taken branch at runtime
            def _pallas(ops):
                xx, ww = ops
                return pallas_zt.pallas_zt_conv_sym(xx, ww, pzt, valid,
                                                    interpret=interp)

            def _baseline(ops):
                xx, ww = ops
                return sparse.sparse_conv_sym(xx, nbr, ww, valid,
                                              accum_dtype=acc)

            y = jax.lax.cond(pzt["exc_dropped"] > 0, _baseline, _pallas,
                             (x, w))
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.out_channels,))
                y = jnp.where(valid[..., None], y + b, 0)
            return y
        if (zplan is not None and k == 27 and parent is None
                and sparse.ztriple_applicable(nbr.shape[0], x.shape[-1],
                                              self.out_channels)):
            # z-run fetch plan (9 wide gathers instead of 27; chip-tuned
            # predicate keeps the baseline where the plan loses)
            zb, zc = zplan
            if self.grad_mode == "scatter_free":
                y = sparse.sparse_conv_ztriple_sym(x, zb, zc, w, valid,
                                                   accum_dtype=acc)
            else:
                y = sparse.sparse_conv_ztriple(x, zb, zc, w, valid,
                                               accum_dtype=acc)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.out_channels,))
                y = jnp.where(valid[..., None], y + b, 0)
            return y
        if self.grad_mode == "scatter_free" and parent is not None:
            y = sparse.sparse_conv_down(x, nbr, w, parent, parent_off,
                                        valid, in_valid, accum_dtype=acc,
                                        sorted_maps=sg)
        elif self.grad_mode == "scatter_free":
            y = sparse.sparse_conv_sym(x, nbr, w, valid, accum_dtype=acc,
                                       sorted_maps=sg)
        else:
            y = sparse.sparse_conv(x, nbr, w, None, valid, accum_dtype=acc,
                                   sorted_maps=sg,
                                   int8_gather=self.int8_gather)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = jnp.where(valid[..., None], y + b, 0)
        return y


class DenseStemConv(nn.Module):
    """conv0 as a dense block conv (ops/sparse.conv0_dense_block).

    Same param name/shape as the gathered stem ("kernel", (k^3, Cin, Cout))
    so checkpoints are interchangeable between stem modes.
    """
    out_channels: int
    kernel: int = 5
    block: int = 8
    accum: str = "float32"

    @nn.compact
    def __call__(self, dense_in, nbr_win, slot, c2v, valid):
        cin = dense_in.shape[1] // self.block ** 3
        w = self.param("kernel", conv_init,
                       (self.kernel ** 3, cin, self.out_channels))
        return sparse.conv0_dense_block(
            dense_in, nbr_win, slot, c2v, w, valid,
            block=self.block, kernel=self.kernel,
            accum_dtype=jnp.dtype(self.accum))


class SparseConvTranspose(nn.Module):
    out_channels: int
    grad_mode: str = "native"
    sorted_gather: bool = False
    int8_gather: bool = False

    @nn.compact
    def __call__(self, x, parent, parent_off, valid, child=None,
                 in_valid=None):
        w = self.param("kernel", conv_init, (8, x.shape[-1], self.out_channels))
        if self.grad_mode == "scatter_free" and child is not None:
            return sparse.sparse_conv_transpose_gf(
                x, parent, parent_off, w, child, valid, in_valid,
                sorted_maps=self.sorted_gather)
        return sparse.sparse_conv_transpose(x, parent, parent_off, w, valid,
                                            int8_gather=self.int8_gather)


class BasicBlock(nn.Module):
    """conv3 -> BN -> ReLU -> conv3 -> BN -> (+residual) -> ReLU
    (ref resnet_block.py:7-70).  ``train`` is a construction-time flag so the
    call signature stays all-array for nn.remat."""
    planes: int
    bn_momentum: float = 0.02
    train: bool = False
    accum: str = "float32"
    grad_mode: str = "native"
    sorted_gather: bool = False
    int8_gather: bool = False

    @nn.compact
    def __call__(self, x, nbr, valid, zplan=None, pzt=None):
        train = self.train
        gm = self.grad_mode
        sg = self.sorted_gather
        i8 = self.int8_gather
        residual = x
        out = SparseConv(self.planes, accum=self.accum, grad_mode=gm,
                         sorted_gather=sg, int8_gather=i8,
                         name="conv1")(x, nbr, valid, zplan=zplan, pzt=pzt)
        out = MaskedBatchNorm(self.bn_momentum, name="norm1")(out, valid, not train)
        out = jax.nn.relu(out)
        out = SparseConv(self.planes, accum=self.accum, grad_mode=gm,
                         sorted_gather=sg, int8_gather=i8,
                         name="conv2")(out, nbr, valid, zplan=zplan, pzt=pzt)
        out = MaskedBatchNorm(self.bn_momentum, name="norm2")(out, valid, not train)
        if x.shape[-1] != self.planes:
            residual = nn.Dense(self.planes, use_bias=False, kernel_init=conv_init,
                                name="downsample_conv")(x)
            residual = MaskedBatchNorm(self.bn_momentum, name="downsample_norm")(
                residual, valid, not train)
        out = jax.nn.relu(out + residual)
        return jnp.where(valid[..., None], out, 0)


class ResStage(nn.Module):
    """Stack of BasicBlocks; each block is rematerialized in training so the
    backward pass recomputes the 27-offset gathers instead of storing them
    (full-scale bwd OOMs otherwise: ~1.4 GB of gathered activations/conv).

    remat_policy: 'full' (save nothing), 'dots' (save matmul outputs),
    'gather_only' (save everything EXCEPT the named per-tap gather
    residuals — backward redoes one gather per conv and nothing else),
    'none'."""
    planes: int
    layers: int
    bn_momentum: float = 0.02
    remat_policy: str = "full"
    accum: str = "float32"
    grad_mode: str = "native"
    sorted_gather: bool = False
    int8_gather: bool = False

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool, zplan=None, pzt=None):
        block_cls = remat_block_cls(BasicBlock, self.remat_policy, train)
        for i in range(self.layers):
            x = block_cls(self.planes, self.bn_momentum, train, self.accum,
                          self.grad_mode, self.sorted_gather,
                          self.int8_gather,
                          name=f"block{i}")(x, nbr, valid, zplan, pzt)
        return x


def remat_block_cls(cls, remat_policy: str, train: bool):
    """Module class wrapped per the rematerialization policy."""
    if not train or remat_policy == "none":
        return cls
    if remat_policy == "full":
        return nn.remat(cls)
    if remat_policy == "dots":
        return nn.remat(cls, policy=jax.checkpoint_policies.dots_saveable)
    if remat_policy == "gather_only":
        return nn.remat(cls, policy=jax.checkpoint_policies.
                        save_anything_except_these_names("conv_gather"))
    raise ValueError(f"unknown remat_policy {remat_policy!r}")


class Res16UNet(nn.Module):
    """Res16UNet34C-equivalent sparse U-Net (flat-batch layout).

    Input ``x`` is (B, P0, Cin) with the batched ``maps`` dict from
    ``SparseHierarchy.device_arrays()``; internally everything runs on
    (B*P_l, C) arrays.  Returns (out (B, P0, Cout), feature_maps) with
    feature_maps = flat [L4, L3, L2, L1, L0] arrays like the reference's
    out_fpn path (res16unet.py:241-314).
    """
    out_channels: int = 200
    init_dim: int = 32
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    conv1_kernel_size: int = 5
    bn_momentum: float = 0.02
    remat_policy: str = "full"
    accum: str = "float32"
    grad_mode: str = "native"   # 'scatter_free' = transpose-map backward
    sorted_gather: bool = False  # sorted-index gather hint (see ops/sparse)
    int8_gather: bool = False   # int8 tap gathers on the 3^3 convs
    #   (inference only; silently off in train mode)
    pallas_conv: bool = False   # windowed pallas conv on the fetch-floor
    #   3^3 shapes (ops/pallas_zt; per-shape routing via
    #   pallas_zt_applicable).  Plans are built on device from the shipped
    #   neighbor maps — no extra host work or transfer.

    @nn.compact
    def __call__(self, x: jnp.ndarray, maps: Dict[str, jnp.ndarray],
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        P = self.planes
        gm = self.grad_mode
        sg = self.sorted_gather
        i8 = self.int8_gather and not train
        flat_in = x.ndim == 2            # flat-packed layout
        if flat_in:
            b, (p0, cin) = 1, x.shape
        else:
            b, p0, cin = x.shape
        fm = flatten_maps(maps)
        v = [fm[f"valid_{l}"] for l in range(5)]
        if "cmp0_in" in fm:
            n = [{"in_idx": fm[f"cmp{l}_in"], "out_idx": fm[f"cmp{l}_out"],
                  "slots_a": fm[f"cmp{l}_sa"], "slots_b": fm[f"cmp{l}_sb"],
                  "src": fm[f"cmp{l}_src"]}
                 for l in range(5)]
        else:
            n = [fm[f"nbr3_{l}"] for l in range(5)]
        zp = [(fm[f"zt{l}_base"], fm[f"zt{l}_code"])
              if f"zt{l}_base" in fm else None for l in range(5)]
        # device-built windowed-conv plans for levels where some 3^3 conv
        # can route to the pallas kernel (channel check happens per conv in
        # SparseConv; the n-gates here match pallas_zt_applicable)
        pzt = [None] * 5
        if self.pallas_conv and "cmp0_in" not in fm:
            for l in range(5):
                n_l = fm[f"valid_{l}"].shape[0]
                # probe with (96, 128) — the widest-reach channel pair of
                # the topology: captures the n/backend/env gates; exact
                # channels re-checked per conv
                if pallas_zt.pallas_zt_applicable(n_l, 96, 128):
                    pzt[l] = pallas_zt.device_zt_plan(fm[f"nbr3_{l}"])
        x = x.reshape(b * p0, cin)
        bn = lambda name: MaskedBatchNorm(self.bn_momentum, name=name)
        if flat_in:
            p0 = fm["valid_0"].shape[0]
            x = jnp.pad(x, ((0, p0 - x.shape[0]), (0, 0))) \
                if x.shape[0] != p0 else x
        # ladder convs share the stage remat policy so their per-tap gather
        # residuals are not stored either (e.g. conv1s2 at 64k voxels would
        # otherwise save 27 x N x C activations)
        conv_cls = remat_block_cls(SparseConv, self.remat_policy, train)

        # stem (level 0): dense-block MXU path when the pipeline shipped a
        # stem pack (InstSegPipelineConfig.stem_mode='dense_block'),
        # otherwise the 125-tap gathered conv
        if "stem_dense" in fm:
            block = round(
                (fm["stem_c2v"].shape[0] // fm["stem_nbrblk"].shape[0])
                ** (1 / 3))
            out = DenseStemConv(self.init_dim, self.conv1_kernel_size,
                                block, self.accum, name="conv0")(
                fm["stem_dense"], fm["stem_nbrblk"], fm["stem_slot"],
                fm["stem_c2v"], v[0])
        else:
            out = conv_cls(self.init_dim, accum=self.accum, grad_mode=gm,
                           sorted_gather=sg, name="conv0")(x, fm["nbr5_0"],
                                                           v[0])
        out_p1 = jax.nn.relu(bn("bn0")(out, v[0], not train))

        # encoder ladder: stride-2 conv then residual stage
        skips = [out_p1]
        out = out_p1
        enc_planes = [P[0], P[1], P[2], P[3]]
        for l in range(4):
            out = conv_cls(out.shape[-1], accum=self.accum, grad_mode=gm,
                           sorted_gather=sg, int8_gather=i8,
                           name=f"conv{l+1}s2")(
                out, fm[f"child_{l}"], v[l + 1],
                fm[f"parent_{l}"], fm[f"parent_off_{l}"], v[l])
            out = jax.nn.relu(bn(f"bn{l+1}")(out, v[l + 1], not train))
            out = ResStage(enc_planes[l], self.layers[l], self.bn_momentum,
                           self.remat_policy, self.accum, gm, sg, i8,
                           name=f"stage{l+1}")(out, n[l + 1], v[l + 1], train,
                                               zp[l + 1], pzt[l + 1])
            skips.append(out)

        feature_maps = [out]  # L4 (flat)

        # decoder ladder: transpose conv, concat skip, residual stage
        dec_planes = [P[4], P[5], P[6], P[7]]
        for i in range(4):
            lvl = 3 - i  # output level of this upsample
            out = SparseConvTranspose(dec_planes[i], grad_mode=gm,
                                      sorted_gather=sg, int8_gather=i8,
                                      name=f"convtr{i+4}")(
                out, fm[f"parent_{lvl}"], fm[f"parent_off_{lvl}"], v[lvl],
                fm[f"child_{lvl}"], v[lvl + 1])
            out = jax.nn.relu(bn(f"bntr{i+4}")(out, v[lvl], not train))
            out = jnp.concatenate([out, skips[lvl]], axis=-1)
            out = ResStage(dec_planes[i], self.layers[i + 4], self.bn_momentum,
                           self.remat_policy, self.accum, gm, sg, i8,
                           name=f"stage{i+5}")(out, n[lvl], v[lvl], train,
                                               zp[lvl], pzt[lvl])
            feature_maps.append(out)

        final = nn.Dense(self.out_channels, kernel_init=conv_init,
                         name="final")(out)
        final = jnp.where(v[0][..., None], final, 0)
        return final.reshape(b, p0, self.out_channels), feature_maps
