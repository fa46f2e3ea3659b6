"""Vision / memory encoders (flax linen).

Re-designs of the reference's encoders:
- SegVoxelEncoder  <- PCDMask3DSegLevelEncoder (modules/vision/pcd_mask3d_encoder.py:115-154)
- ObjectEncoder    <- modules/vision/object_encoder.py:14-79
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.ops import segment
from pq3d_tpu.models.layers import dense_init
from pq3d_tpu.models.sparse_unet import Res16UNet
from pq3d_tpu.registry import VISION_REGISTRY


class ProjectLN(nn.Module):
    """Linear + LayerNorm (+ Dropout) projection block used all over the
    reference (e.g. object_encoder.py:34, pcd_mask3d_encoder.py:125-130)."""
    hidden_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_size, kernel_init=dense_init)(x)
        x = nn.LayerNorm()(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)


@VISION_REGISTRY.register(name="PCDMask3DSegLevelEncoder")
class SegVoxelEncoder(nn.Module):
    """Voxel U-Net -> per-scale segment-pooled features.

    For each hlevel the decoder feature map is mean-pooled onto segments
    and projected (ref pcd_mask3d_encoder.py:133-154, which broadcasts with
    a chained MinkowskiPoolingTranspose then scatter-means).  Here the
    broadcast+scatter is algebraically collapsed into a count-matrix matmul
    at the coarse level — see the inline comment.  Output: list over
    hlevels+[final] of (B, max_seg, hidden).
    """
    hidden_size: int = 768
    hlevels: Sequence[int] = (0, 1, 2, 3)
    dropout: float = 0.1
    freeze_backbone: bool = False
    backbone_out_channels: int = 200
    bn_momentum: float = 0.02
    conv1_kernel_size: int = 5
    remat_policy: str = "full"
    accum: str = "float32"
    grad_mode: str = "native"
    # 'res16unet' (reference Res16UNet34C parity) or 'swin3d' (TPU-native
    # window-attention backbone; the reference's PCDMask3DSwin3DEncoder
    # counterpart whose Swin3DUNet it does not vendor,
    # pcd_mask3d_encoder.py:65-112).  'swin3d' needs window packs in maps
    # (InstSegPipelineConfig.swin_window > 0).
    backbone: str = "res16unet"
    swin_window: int = 4   # swin3d only; must match the host window packs
    sorted_gather: bool = False
    int8_gather: bool = False
    pallas_conv: bool = False   # windowed pallas conv (ops/pallas_zt)

    @nn.compact
    def __call__(self, voxel_feats: jnp.ndarray, maps: Dict[str, jnp.ndarray],
                 voxel2segment: jnp.ndarray, max_seg: int,
                 train: bool = False, deterministic: bool = True
                 ) -> List[jnp.ndarray]:
        from pq3d_tpu.models.sparse_unet import flatten_maps

        if self.backbone == "swin3d":
            from pq3d_tpu.models.swin3d import Swin3DUNet
            # swin has no conv-gather levers; say so at init rather than
            # silently dropping an explicitly-enabled lever
            dropped = [n for n, on in (
                ("sorted_gather", self.sorted_gather),
                ("int8_gather", self.int8_gather),
                ("pallas_conv", self.pallas_conv)) if on]
            if dropped and self.is_initializing():
                print(f"[SegVoxelEncoder] swin3d backbone has no "
                      f"{'/'.join(dropped)} — option(s) ignored")
            backbone = Swin3DUNet(out_channels=self.backbone_out_channels,
                                  window=self.swin_window,
                                  bn_momentum=self.bn_momentum,
                                  accum=self.accum,
                                  grad_mode=self.grad_mode,
                                  # any non-'none' policy checkpoints the
                                  # Swin blocks (the (nw,h,w3,w3) attention
                                  # logits OOM full-scale training)
                                  remat=self.remat_policy != "none",
                                  name="backbone")
        else:
            backbone = Res16UNet(out_channels=self.backbone_out_channels,
                                 bn_momentum=self.bn_momentum,
                                 conv1_kernel_size=self.conv1_kernel_size,
                                 remat_policy=self.remat_policy,
                                 accum=self.accum,
                                 grad_mode=self.grad_mode,
                                 sorted_gather=self.sorted_gather,
                                 int8_gather=self.int8_gather,
                                 pallas_conv=self.pallas_conv,
                                 name="backbone")
        bb_train = train and not self.freeze_backbone
        # feature_maps are FLAT (B*P_l, C) arrays, [L4, L3, L2, L1, L0]
        _, feature_maps = backbone(voxel_feats, maps, train=bb_train)
        if self.freeze_backbone:
            feature_maps = [jax.lax.stop_gradient(f) for f in feature_maps]

        fm = flatten_maps(maps)  # XLA dedups with the backbone's copy
        flat_in = maps["valid_0"].ndim == 1
        if flat_in:
            # flat-packed layout: scene ids / local ancestors / rect
            # gathers come from the host (instseg_pipeline.collate_flat)
            b = maps["rect_0"].shape[0]
            p0 = maps["valid_0"].shape[0]
            scene = maps["voxel_scene"]
        else:
            b, p0 = maps["valid_0"].shape
            scene = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p0)
        valid0 = fm["valid_0"]
        # flat per-scene segment ids: b*S + seg (trash bucket -> B*S)
        v2s = voxel2segment.reshape(-1)
        flat_seg = jnp.where(v2s < max_seg, scene * max_seg + v2s,
                             b * max_seg)
        # per-segment level-0 voxel count (shared by every scale's mean)
        n_s = segment.segment_sum(jnp.ones(flat_seg.shape, jnp.float32),
                                  flat_seg, b * max_seg)
        n_s = jnp.maximum(n_s, 1.0).reshape(b, max_seg, 1)

        # Pooling a coarse level onto segments: the reference broadcasts
        # coarse features to every level-0 voxel (MinkowskiPoolingTranspose
        # chain) and scatter-means (ref pcd_mask3d_encoder.py:131-152).
        # Equivalent and ~50x cheaper on TPU:
        #   mean[s] = (counts @ feat)[s] / n_s,
        #   counts[j, s] = #level-0 voxels with ancestor j and segment s
        # counts is built with ONE scalar scatter over the 262k level-0
        # voxels (no C-wide gather/scatter traffic), the contraction runs
        # on the MXU at the coarse level's row count.
        s1 = max_seg + 1
        sl = jnp.minimum(v2s, max_seg)           # local seg id, trash = S
        cdt = jnp.bfloat16 if self.accum == "bfloat16" else jnp.float32

        out: List[jnp.ndarray] = []
        for i, hlevel in enumerate(list(self.hlevels) + [4]):
            feat = feature_maps[hlevel]          # (B*P_{4-hlevel}, C)
            lvl = 4 - hlevel
            if lvl > 0:
                if flat_in:
                    # rectangularize the flat coarse level with one gather
                    # so the count-matrix contraction stays per-scene
                    rect = maps[f"rect_{lvl}"]          # (B, Pmax_l)
                    p_l = rect.shape[1]
                    from pq3d_tpu.ops.sparse import fast_row_gather
                    featr = fast_row_gather(feat, jnp.maximum(
                        rect.reshape(-1), 0))
                    featr = jnp.where((rect.reshape(-1) >= 0)[:, None],
                                      featr, 0)
                    anc = (scene.astype(jnp.int32) * p_l
                           + maps["anc_local"][lvl])
                    feat_b = featr.reshape(b, p_l, -1)
                else:
                    p_l = maps[f"valid_{lvl}"].shape[1]
                    anc = jnp.maximum(fm[f"ancestor_{lvl}"], 0)
                    feat_b = feat.reshape(b, p_l, -1)
                key = anc * s1 + sl              # (B*P0,) pair ids
                counts = segment.segment_sum(
                    jnp.ones((key.shape[0],), jnp.float32), key,
                    b * p_l * s1)
                counts = counts.reshape(b, p_l, s1)[:, :, :max_seg]
                seg_sum = jnp.einsum(
                    "bjs,bjc->bsc", counts.astype(cdt),
                    feat_b.astype(cdt),
                    preferred_element_type=jnp.float32)
                seg_feat = seg_sum / n_s
            else:
                feat = jnp.where(valid0[:, None], feat, 0)
                seg_feat = segment.segment_mean(feat, flat_seg, b * max_seg)
                seg_feat = seg_feat.reshape(b, max_seg, -1)
            seg_feat = ProjectLN(self.hidden_size, self.dropout,
                                 name=f"feat_proj_{i}")(seg_feat, deterministic)
            out.append(seg_feat)
        return out


@VISION_REGISTRY.register(name="PCDMask3DSwin3DEncoder")
class SegVoxelSwinEncoder(SegVoxelEncoder):
    """Registry alias: the reference's Swin3D seg-level encoder
    (pcd_mask3d_encoder.py:65-112) — SegVoxelEncoder with the TPU-native
    window-attention backbone selected."""
    backbone: str = "swin3d"


@VISION_REGISTRY.register(name="PCDMask3DEncoder")
class VoxelLevelEncoder(nn.Module):
    """Voxel-level Mask3D encoder: U-Net -> mask features at level-0 voxels
    plus multi-scale decomposed per-level features (ref
    modules/vision/pcd_mask3d_encoder.py:20-112 — the registered
    non-segment-level variant; shipped configs use the SegLevel one).

    Returns (mask_feature (B, P0, hidden), multi_scale: list over hlevels of
    (B, P_l, hidden) features with their validity masks from ``maps``).
    """
    hidden_size: int = 768
    hlevels: Sequence[int] = (0, 1, 2, 3)
    dropout: float = 0.1
    freeze_backbone: bool = False
    backbone_out_channels: int = 200
    bn_momentum: float = 0.02
    conv1_kernel_size: int = 5
    remat_policy: str = "full"
    accum: str = "float32"
    grad_mode: str = "native"

    @nn.compact
    def __call__(self, voxel_feats: jnp.ndarray, maps: Dict[str, jnp.ndarray],
                 train: bool = False, deterministic: bool = True):
        backbone = Res16UNet(out_channels=self.backbone_out_channels,
                             bn_momentum=self.bn_momentum,
                             conv1_kernel_size=self.conv1_kernel_size,
                             remat_policy=self.remat_policy,
                             accum=self.accum,
                             grad_mode=self.grad_mode,
                             name="backbone")
        bb_train = train and not self.freeze_backbone
        # feature_maps are FLAT (B*P_l, C) arrays, [L4, L3, L2, L1, L0]
        _, feature_maps = backbone(voxel_feats, maps, train=bb_train)
        if self.freeze_backbone:
            feature_maps = [jax.lax.stop_gradient(f) for f in feature_maps]

        b, p0 = maps["valid_0"].shape
        mask_feat = ProjectLN(self.hidden_size, self.dropout,
                              name="mask_proj")(
            feature_maps[4].reshape(b, p0, -1), deterministic)
        multi_scale: List[jnp.ndarray] = []
        for i, hlevel in enumerate(self.hlevels):
            lvl = 4 - hlevel
            feat = feature_maps[hlevel]
            pl = maps[f"valid_{lvl}"].shape[1]
            feat = ProjectLN(self.hidden_size, self.dropout,
                             name=f"scale_proj_{i}")(
                feat.reshape(b, pl, -1), deterministic)
            multi_scale.append(feat)
        return mask_feat, multi_scale


@VISION_REGISTRY.register(name="SemanticEncoder")
class SemanticEncoder(nn.Module):
    """Label-embedding encoder with prediction-mixup curriculum
    (ref object_encoder.py:82-117; registered-but-unused by the shipped
    reference configs, provided for parity).  The semantic embedding table
    (GloVe/CLIP label vectors) is a fixed buffer supplied at init."""
    hidden_size: int = 768
    embed_dim: int = 300
    num_classes: int = 607
    use_matmul_label: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, cls_logits_list, obj_labels=None, mixup_ratio=0.0,
                 deterministic: bool = True):
        table = self.variable(
            "buffers", "semantic_embedding",
            lambda: nn.initializers.normal(0.02)(
                self.make_rng("params"), (self.num_classes, self.embed_dim),
                jnp.float32)).value
        logits = sum(cls_logits_list) / len(cls_logits_list)
        probs = jax.lax.stop_gradient(jax.nn.softmax(logits, axis=-1))
        if obj_labels is not None and mixup_ratio > 0:
            probs = mixup_predictions(probs, obj_labels, mixup_ratio)
        if self.use_matmul_label:
            embeds = probs @ table
        else:
            embeds = jnp.take(table, jnp.argmax(probs, axis=-1), axis=0)
        embeds = ProjectLN(self.hidden_size, self.dropout,
                           name="sem_emb_proj")(embeds, deterministic)
        return embeds, logits


def mixup_predictions(probs: jnp.ndarray, labels: jnp.ndarray,
                      ratio) -> jnp.ndarray:
    """Blend predicted class distributions with one-hot GT at ``ratio``
    (ref modules/utils.py:128-167 AllMixup/LinearDecayMixup)."""
    valid = labels >= 0
    onehot = jax.nn.one_hot(jnp.maximum(labels, 0), probs.shape[-1])
    mixed = jnp.where(valid[..., None], onehot, probs)
    return probs * (1 - ratio) + mixed * ratio


def linear_decay_mixup_ratio(step, total_steps, stage1: float, stage2: float):
    """Curriculum: 1.0 until stage1*total, linear decay to 0 at stage2*total
    (ref modules/utils.py:142-167)."""
    s1, s2 = stage1 * total_steps, stage2 * total_steps
    return jnp.clip((s2 - step) / jnp.maximum(s2 - s1, 1), 0.0, 1.0)


@VISION_REGISTRY.register(name="ObjectEncoder")
class ObjectEncoder(nn.Module):
    """Per-object/segment feature projection, optional PointNet++ backbone
    (ref object_encoder.py:14-79)."""
    hidden_size: int = 768
    input_feat_size: int = 768
    use_projection: bool = True
    dropout: float = 0.1
    backbone: str = "none"          # 'none' | 'pointnet++'
    freeze_backbone: bool = False
    use_cls_head: bool = False
    tgt_cls_num: int = 607

    @nn.compact
    def __call__(self, obj_feats: jnp.ndarray, deterministic: bool = True,
                 flat_slot: jnp.ndarray = None):
        if flat_slot is not None and self.backbone != "pointnet++":
            # the flat layout ships raw (F, P, 6) point clouds — only a
            # point backbone can digest them; without one the scatter
            # below would emit rank-4 (B, O, P, *) memory features
            raise ValueError(
                "flat_obj requires backbone='pointnet++' on the pc "
                f"encoder (got backbone={self.backbone!r})")
        if self.backbone == "pointnet++":
            from pq3d_tpu.models.pointnet import PointNetPP
            # a frozen backbone runs in BN-eval mode (running stats), like
            # the reference's backbone.eval() (ref object_encoder.py:56-59)
            bb_det = deterministic or self.freeze_backbone
            if flat_slot is not None and not bb_det:
                # train-mode BN would take batch statistics over the flat
                # (F, ...) layout — real rows plus a per-batch-varying
                # number of zero bucket-pad rows — silently diverging from
                # the padded layout the equivalence tests pin
                raise ValueError(
                    "flat_obj with an unfrozen PointNet++ backbone is not "
                    "supported in training: BN batch stats over the flat "
                    "layout differ from the padded layout; set "
                    "freeze_backbone=True or unset flat_obj")
            if flat_slot is not None:
                # flat-object layout: obj_feats is (F, P, 6) — the
                # concatenated REAL objects of the batch (no pad clouds),
                # so PointNet++ skips pad work (~2x on real scans at
                # max_obj_len=80, ~10x on the synthetic bench).
                pts = obj_feats
            else:
                b, o = obj_feats.shape[:2]
                pts = obj_feats.reshape((b * o,) + obj_feats.shape[2:])
            feats = PointNetPP(name="backbone")(pts, deterministic=bb_det)
            if self.freeze_backbone:
                feats = jax.lax.stop_gradient(feats)
            obj_feats = (feats if flat_slot is not None
                         else feats.reshape(b, o, -1))
        if flat_slot is not None:
            # scatter flat rows back to the padded (B, O) layout:
            # flat_slot indexes rows of obj_feats; pad slots hold F and
            # pick up the appended zero row
            obj_feats = jnp.concatenate(
                [obj_feats, jnp.zeros_like(obj_feats[:1])], axis=0)
            obj_feats = obj_feats[flat_slot]
        out = obj_feats
        if self.use_projection:
            out = nn.Dense(self.hidden_size, kernel_init=dense_init,
                           name="input_feat_proj")(out)
            out = nn.LayerNorm()(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        if self.use_cls_head:
            from pq3d_tpu.models.layers import MLPHead
            logits = MLPHead(self.input_feat_size // 2, self.tgt_cls_num,
                             dropout=0.3, name="cls_head")(obj_feats, deterministic)
            return out, logits
        return out


def check_swin_window(model, pipe_cfg) -> None:
    """Validate that the host window packs match the swin3d attention grid.

    The window packs the pipeline builds (InstSegPipelineConfig.swin_window)
    and the windows SwinBlock reshapes into (VoxelEncoderCfg.swin_window)
    must agree; a mismatch computes attention over arbitrary cell groups
    with the wrong relative-bias table, SILENTLY whenever the bucketed pack
    length happens to divide the model window volume.  Called from every
    entry point that pairs a model with a pipeline config (training
    builder, serving, export drivers).
    """
    venc = getattr(model, "voxel_enc", None)
    if venc is None or getattr(venc, "backbone", None) != "swin3d":
        return
    win = int(getattr(pipe_cfg, "swin_window", 0) or 0)
    if win != venc.swin_window:
        raise ValueError(
            f"swin window mismatch: pipeline swin_window={win} but the "
            f"swin3d backbone expects {venc.swin_window} (model "
            f"voxel_encoder backbone.config.window) — set them equal")
