"""Query3DUnified — the promptable unified 3D VL model (flax linen).

Re-design of the reference's single model (reference:
model/query3d_unified.py:29-238).  Data flow:

  query_locs -> positional queries (Fourier PE or coord+box embedding)
  memories (voxel / mv / pc / prompt) -> (feat, attend_mask, pos) triples
  mask head bound with segment features
  unified query decoder (num_blocks x num_layers, optional self-masking)
  task heads: mask (instseg), ground (visual grounding), generation (T5)

Everything consumes a flat ``batch`` dict of fixed-shape arrays (the typed
replacement for the reference's data_dict, SURVEY.md §7.1), with **True =
valid/attend** mask convention throughout.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pq3d_tpu.models import heads as heads_lib
from pq3d_tpu.models.encoders import ObjectEncoder, SegVoxelEncoder
from pq3d_tpu.models.posembed import CoordinateEncoder
from pq3d_tpu.models.query_encoder import QueryMaskEncoder
from pq3d_tpu.models.layers import dense_init
from pq3d_tpu.ops.pairwise import calc_pairwise_locs
from pq3d_tpu.registry import MODEL_REGISTRY

# prompt type ids (ref data/datasets/constant.py:628-631)
PROMPT_TXT = 1
PROMPT_IMAGE = 2
PROMPT_LOC = 3


@dataclasses.dataclass(frozen=True)
class UnifiedEncoderCfg:
    num_layers: int = 4
    num_blocks: int = 1
    num_attention_heads: int = 12
    structure: str = "parallel"
    spatial_selfattn: bool = True
    use_self_mask: bool = False
    memory_dropout: float = 0.0
    drop_memories_test: Tuple[str, ...] = ()


@dataclasses.dataclass(frozen=True)
class EncoderCfg:
    input_feat_size: int = 768
    use_projection: bool = True
    dropout: float = 0.1
    backbone: str = "none"
    freeze_backbone: bool = False


@dataclasses.dataclass(frozen=True)
class VoxelEncoderCfg:
    hlevels: Tuple[int, ...] = (0, 1, 2, 3)
    dropout: float = 0.1
    freeze_backbone: bool = False
    out_channels: int = 200
    bn_momentum: float = 0.02
    conv1_kernel_size: int = 5
    remat_policy: str = "full"   # 'full' | 'dots' | 'gather_only' | 'none'
    accum: str = "float32"       # conv accumulation dtype (bf16 = inference opt)
    grad_mode: str = "native"    # 'scatter_free' = transpose-map backward
    backbone: str = "res16unet"  # 'res16unet' | 'swin3d' (window attention)
    swin_window: int = 4         # swin3d cell-grid size; MUST match the
                                 # pipeline's data.instseg_options.swin_window
    sorted_gather: bool = False  # sorted-index conv gathers (ops/sparse)
    int8_gather: bool = False    # int8-quantized tap gathers (inference)
    pallas_conv: bool = False    # windowed pallas conv (ops/pallas_zt)
    # DEVICE-BUILT kernel maps (ops/device_maps.build_batch_maps): the
    # static per-level caps the jitted forward builds the hierarchy with —
    # MUST equal the pipeline's level_caps when
    # data.instseg_options.device_maps is set.  The batch then carries only
    # 'vox_coords'/'n_voxels' (~0.8 MB) instead of 60-100 MB of int32 maps.
    device_maps: Optional[Tuple[int, ...]] = None
    # with device_maps: stem map source ('dense_block' builds the stem pack
    # on device, 'gather' builds nbr5_0 on device) and the static occupied-
    # block cap (None derives the pipeline's stem_pad_blocks default)
    device_stem: str = "dense_block"
    device_stem_blocks: Optional[int] = None
    device_ztriple: bool = False  # build z-run conv plans on device too
    # DEVICE-BUILT FLAT maps (ops/device_flat_maps.build_flat_maps): the
    # static flat shape lock as a hashable tuple of (name, size) pairs —
    # MUST equal the pipeline's flat_shape_caps when device_maps +
    # flat_pack are set there.  The batch then carries only flat
    # 'vox_coords' (tot_0, 3) + 'n_voxels' (B,) + flat features, and the
    # jitted forward builds the flat hierarchy + swin/stem packs itself —
    # composing the device-maps transfer win with the flat layout's
    # compute win (flat_swin).  Build with
    # ``tuple(sorted(flat_shape_caps.items()))``.
    device_flat_caps: Optional[Tuple[Tuple[str, int], ...]] = None


@dataclasses.dataclass(frozen=True)
class MaskHeadCfg:
    num_targets: int = 201
    filter_out_classes: Tuple[int, ...] = (0, 2)
    memories_for_match: Tuple[str, ...] = ("voxel", "mv", "pc")


@dataclasses.dataclass(frozen=True)
class GroundHeadCfg:
    hidden_size: int = 384
    dropout: float = 0.3


@dataclasses.dataclass(frozen=True)
class TxtEncoderCfg:
    kind: str = "clip"              # 'clip' | 'bert'
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    use_projection: bool = True
    projection_type: str = "mlp"
    num_projection_layers: int = 1
    freeze_backbone: bool = True
    compute_dtype: str = "float32"  # 'bfloat16' = fast frozen-tower mode


@dataclasses.dataclass(frozen=True)
class GenerationHeadCfg:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    max_new_tokens: int = 50
    use_projection: bool = True
    # stop decoding once every row has emitted EOS (token-exact with the
    # fixed-length scan; serving lever — see t5.py:decode)
    early_exit: bool = False
    # eval returns generation_enc(+_mask) instead of tokens; the caller runs
    # generation.decode_states as a SEPARATE jit (bf16 serving lever: fused
    # into the big jit the bf16 decode loop schedules ~2.5x slower)
    two_phase: bool = False


@MODEL_REGISTRY.register(name="Query3DUnified")
class Query3DUnified(nn.Module):
    memories: Tuple[str, ...] = ("voxel", "mv", "pc")
    heads: Tuple[str, ...] = ("mask",)
    hidden_size: int = 768
    dim_loc: int = 3
    spatial_dim: int = 5
    pairwise_rel_type: str = "center"
    use_offline_voxel_fts: bool = False
    use_offline_attn_mask: bool = False
    skip_query_encoder_mask_pred: bool = False
    unified: UnifiedEncoderCfg = UnifiedEncoderCfg()
    mv_enc: EncoderCfg = EncoderCfg()
    pc_enc: EncoderCfg = EncoderCfg()
    voxel_obj_enc: EncoderCfg = EncoderCfg(input_feat_size=128)
    voxel_enc: VoxelEncoderCfg = VoxelEncoderCfg()
    mask_head_cfg: Optional[MaskHeadCfg] = MaskHeadCfg()
    ground_head_cfg: GroundHeadCfg = GroundHeadCfg()
    generation_head_cfg: GenerationHeadCfg = GenerationHeadCfg()
    txt_cfg: TxtEncoderCfg = TxtEncoderCfg()
    qa_num_answers: int = 8864  # ScanQA answer vocab size

    def _loc_embed(self, locs, coord_min, coord_max, coord_encoder,
                   box_encoder):
        """Location -> hidden embedding; Fourier for dim_loc==3, coord+box
        Linear/LN pair for dim_loc==6 (ref query3d_unified.py:58-72,113-132)."""
        if self.dim_loc > 3:
            return coord_encoder(locs[..., :3]) + box_encoder(locs[..., 3:6])
        return coord_encoder(locs[..., :3], input_range=(coord_min, coord_max))

    @nn.compact
    def __call__(self, batch: Dict[str, Any], train: bool = False
                 ) -> Dict[str, Any]:
        deterministic = not train
        out: Dict[str, Any] = {}

        # ---- location encoders ------------------------------------------
        if self.dim_loc > 3:
            # explicit child names: these land in the parent scope and the
            # checkpoint importer keys off them (ref query3d_unified.py:63-71
            # coord_encoder/box_encoder Linear+LN pairs)
            coord_encoder = nn.Sequential(
                [nn.Dense(self.hidden_size, kernel_init=dense_init,
                          name="coord_dense"),
                 nn.LayerNorm(name="coord_ln")])
            box_encoder = nn.Sequential(
                [nn.Dense(self.hidden_size, kernel_init=dense_init,
                          name="box_dense"),
                 nn.LayerNorm(name="box_ln")])
        else:
            coord_encoder = CoordinateEncoder(self.hidden_size,
                                              name="coord_encoder")
            box_encoder = None
        coord_min = batch.get("coord_min")
        coord_max = batch.get("coord_max")

        # ---- queries ------------------------------------------------------
        query_locs = batch["query_locs"][..., :self.dim_loc]
        query_valid = batch["query_pad_masks"]
        query_pos = self._loc_embed(query_locs, coord_min, coord_max,
                                    coord_encoder, box_encoder)
        inputs: Dict[str, Tuple] = {
            "query": (jnp.zeros_like(query_pos), query_valid, query_pos)}

        # ---- memory encoders ----------------------------------------------
        fts_locs = batch["seg_center"]
        fts_pos = self._loc_embed(fts_locs[..., :self.dim_loc], coord_min,
                                  coord_max, coord_encoder, box_encoder)
        if self.dim_loc > 3:
            # the reference adds the box embedding to memory positions TWICE
            # (query3d_unified.py:126-133: once in the coord+box sum, then
            # again unconditionally) — replicated so imported reference
            # checkpoints reproduce (pinned by test_full_model_parity)
            fts_pos = fts_pos + box_encoder(fts_locs[..., 3:6])
        seg_valid = batch["seg_pad_masks"]

        voxel_multi_scale = None
        for mem in self.memories:
            if mem == "mv":
                feat = ObjectEncoder(
                    hidden_size=self.hidden_size,
                    input_feat_size=self.mv_enc.input_feat_size,
                    use_projection=self.mv_enc.use_projection,
                    dropout=self.mv_enc.dropout, name="mv_encoder")(
                        batch["mv_seg_fts"], deterministic)
                inputs[mem] = (feat, batch["mv_seg_pad_masks"], fts_pos)
            elif mem == "pc":
                enc = ObjectEncoder(
                    hidden_size=self.hidden_size,
                    input_feat_size=self.pc_enc.input_feat_size,
                    use_projection=self.pc_enc.use_projection,
                    dropout=self.pc_enc.dropout,
                    backbone=self.pc_enc.backbone,
                    freeze_backbone=self.pc_enc.freeze_backbone,
                    name="pc_encoder")
                if "pc_obj_flat" in batch:
                    # flat-object layout (UnifiedPipelineConfig.flat_obj):
                    # backbone sees only the real objects of the batch
                    feat = enc(batch["pc_obj_flat"], deterministic,
                               flat_slot=batch["pc_flat_slot"])
                else:
                    feat = enc(batch["pc_seg_fts"], deterministic)
                inputs[mem] = (feat, batch["pc_seg_pad_masks"], fts_pos)
            elif mem == "voxel":
                if self.use_offline_voxel_fts:
                    feat = ObjectEncoder(
                        hidden_size=self.hidden_size,
                        input_feat_size=self.voxel_obj_enc.input_feat_size,
                        use_projection=self.voxel_obj_enc.use_projection,
                        dropout=self.voxel_obj_enc.dropout,
                        name="voxel_encoder")(batch["voxel_seg_fts"],
                                              deterministic)
                    inputs[mem] = (feat, batch["voxel_seg_pad_masks"], fts_pos)
                else:
                    if self.voxel_enc.device_flat_caps is not None:
                        # device-built FLAT maps: flat coords + per-scene
                        # counts in, the whole flat hierarchy + swin/stem
                        # packs built inside the jit
                        # (ops/device_flat_maps; composes the transfer win
                        # with the flat_swin compute win)
                        from pq3d_tpu.ops import device_flat_maps as _dfm
                        if batch["vox_coords"].ndim != 2:
                            raise ValueError(
                                "voxel_enc.device_flat_caps is set but the "
                                "batch ships rectangular vox_coords — set "
                                "data.instseg_options.flat_pack=True with "
                                "device_maps=True")
                        is_swin = self.voxel_enc.backbone == "swin3d"
                        vmaps = _dfm.build_flat_maps(
                            batch["vox_coords"], batch["n_voxels"],
                            dict(self.voxel_enc.device_flat_caps),
                            swin_window=(self.voxel_enc.swin_window
                                         if is_swin else 0),
                            # the swin backbone's stem conv runs off
                            # nbr3_0 alone (pipeline stem_mode='none')
                            stem_mode=("none" if is_swin
                                       else self.voxel_enc.device_stem),
                            voxel_feats=batch["voxel_feats"],
                            ztriple=self.voxel_enc.device_ztriple)
                    elif self.voxel_enc.device_maps is not None:
                        # device-built kernel maps: the batch ships only the
                        # biased voxel coords; the hierarchy / stem pack /
                        # z-run plans are built here, inside the jit
                        # (ops/device_maps; serving transfer-killer)
                        from pq3d_tpu.ops import device_maps as _dm
                        vmaps = _dm.build_batch_maps(
                            batch["vox_coords"], batch["n_voxels"],
                            batch["voxel_feats"],
                            level_caps=self.voxel_enc.device_maps,
                            conv0_kernel=self.voxel_enc.conv1_kernel_size,
                            stem_mode=self.voxel_enc.device_stem,
                            stem_blocks=self.voxel_enc.device_stem_blocks,
                            ztriple=self.voxel_enc.device_ztriple)
                    else:
                        vmaps = batch["maps"]
                    scales = SegVoxelEncoder(
                        hidden_size=self.hidden_size,
                        hlevels=self.voxel_enc.hlevels,
                        dropout=self.voxel_enc.dropout,
                        freeze_backbone=self.voxel_enc.freeze_backbone,
                        backbone_out_channels=self.voxel_enc.out_channels,
                        bn_momentum=self.voxel_enc.bn_momentum,
                        conv1_kernel_size=self.voxel_enc.conv1_kernel_size,
                        remat_policy=self.voxel_enc.remat_policy,
                        accum=self.voxel_enc.accum,
                        grad_mode=self.voxel_enc.grad_mode,
                        backbone=self.voxel_enc.backbone,
                        swin_window=self.voxel_enc.swin_window,
                        sorted_gather=self.voxel_enc.sorted_gather,
                        int8_gather=self.voxel_enc.int8_gather,
                        pallas_conv=self.voxel_enc.pallas_conv,
                        name="voxel_encoder")(
                            batch["voxel_feats"], vmaps,
                            batch["voxel2segment"],
                            max_seg=fts_locs.shape[1],
                            train=train, deterministic=deterministic)
                    voxel_multi_scale = scales
                    inputs[mem] = (scales, seg_valid, fts_pos)
            elif mem == "prompt":
                feat, mask = self._encode_prompt(batch, coord_encoder,
                                                 box_encoder, deterministic)
                inputs[mem] = (feat, mask, None)
            else:
                raise NotImplementedError(f"unknown memory {mem}")

        # ---- mask head binding ---------------------------------------------
        offline_attn = None
        if self.use_offline_attn_mask:
            offline_attn = batch.get("offline_attn_mask")
            if offline_attn is None:
                # falling back to predicted self-masks here would silently
                # run a different model variant (the GT-mask experiment
                # would report results from the wrong configuration)
                raise ValueError(
                    "use_offline_attn_mask=True but the batch has no "
                    "'offline_attn_mask' — set data.instseg_options."
                    "offline_mask_source='gt' (or unset the model flag)")
        mask_head = None
        if self.mask_head_cfg is not None and "mask" in self.heads:
            seg_fts_for_match = []
            for mem in self.memories:
                if mem in ("voxel", "mv", "pc") and mem in inputs:
                    feat, mask, _ = inputs[mem]
                    if isinstance(feat, (list, tuple)):
                        feat = feat[-1]  # final voxel scale for matching
                    seg_fts_for_match.append((feat, mask))
            mh = heads_lib.MaskHeadSegLevel(
                hidden_size=self.hidden_size,
                num_targets=self.mask_head_cfg.num_targets,
                num_memories=len(seg_fts_for_match),
                filter_out_classes=self.mask_head_cfg.filter_out_classes,
                name="mask_head")

            def mask_head(query, skip=self.skip_query_encoder_mask_pred):
                return mh(query, seg_fts_for_match, seg_valid,
                          offline_attn_masks=offline_attn,
                          skip_prediction=skip, deterministic=deterministic)

        # ---- spatial attention features -------------------------------------
        pairwise_locs = None
        if self.unified.spatial_selfattn:
            pairwise_locs = calc_pairwise_locs(
                query_locs[..., :3], None,
                pairwise_rel_type=self.pairwise_rel_type,
                spatial_dist_norm=True, spatial_dim=self.spatial_dim)

        # ---- unified decoding ------------------------------------------------
        query, predictions_class, predictions_mask = QueryMaskEncoder(
            hidden_size=self.hidden_size,
            num_attention_heads=self.unified.num_attention_heads,
            num_layers=self.unified.num_layers,
            num_blocks=self.unified.num_blocks,
            memories=self.memories,
            structure=self.unified.structure,
            spatial_selfattn=self.unified.spatial_selfattn,
            use_self_mask=self.unified.use_self_mask,
            memory_dropout=self.unified.memory_dropout,
            drop_memories_test=self.unified.drop_memories_test,
            name="unified_encoder")(
                inputs, pairwise_locs, mask_head=mask_head, train=train,
                deterministic=deterministic)
        out["query"] = query

        # ---- task heads --------------------------------------------------------
        for head in self.heads:
            if head == "mask":
                if self.skip_query_encoder_mask_pred:
                    predictions_class, predictions_mask = [], []
                cls_logits, mask_logits, _ = mask_head(query, skip=False)
                predictions_class = predictions_class + [cls_logits]
                predictions_mask = predictions_mask + [mask_logits]
                out["predictions_class"] = predictions_class
                out["predictions_mask"] = predictions_mask
            elif head == "ground":
                logits = heads_lib.GroundHead(
                    hidden_size=self.ground_head_cfg.hidden_size,
                    dropout=self.ground_head_cfg.dropout,
                    name="ground_head")(query, query_valid, deterministic)
                out["ground_logits"] = logits
                out["og3d_logits"] = logits
            elif head == "qa":
                # classifier QA answer head (ref aux_head.py ClsHead +
                # unifiedtask_wrapper.py:34-35 'qa' hook); pools valid queries
                pooled = (query * query_valid[..., None]).sum(1) / \
                    jnp.maximum(query_valid.sum(-1, keepdims=True), 1)
                out["answer_scores"] = heads_lib.ClsHead(
                    hidden_size=self.hidden_size,
                    num_classes=self.qa_num_answers,
                    name="qa_head")(pooled, deterministic)
                out["qa_logits"] = out["answer_scores"]
            elif head == "generation":
                from pq3d_tpu.models.generation import T5GenerationHead
                gen = T5GenerationHead(cfg=self.generation_head_cfg,
                                       name="generation_head")
                if train:
                    out["generation_logits"] = gen(
                        query, query_valid, labels=batch["response"],
                        deterministic=deterministic)
                else:
                    # teacher-forced logits only when a response exists;
                    # gen(labels=None) returns token ids, not logits
                    if batch.get("response") is not None:
                        out["generation_logits"] = gen(
                            query, query_valid, labels=batch["response"],
                            deterministic=True)
                    if self.generation_head_cfg.two_phase \
                            and not self.is_initializing():
                        # serving split (see generation.decode_states):
                        # states out, caller decodes in its own jit
                        out["generation_enc"] = gen(
                            query, query_valid, labels=None,
                            deterministic=True)
                        out["generation_enc_mask"] = query_valid
                    else:
                        out["generation_tokens"] = gen(
                            query, query_valid, labels=None,
                            deterministic=True)
            else:
                raise NotImplementedError(f"unknown head {head}")
        return out

    def _encode_prompt(self, batch, coord_encoder, box_encoder,
                       deterministic):
        """Route the prompt batch by type (TXT -> text encoder, LOC ->
        location embedding); both paths are computed on static shapes and
        selected per sample (ref query3d_unified.py:80-108)."""
        prompt = batch["prompt"]                  # (B, L) float
        valid = batch["prompt_pad_masks"]         # (B, L) True=valid
        ptype = batch["prompt_type"]              # (B,)

        # text path
        tc = self.txt_cfg
        if tc.kind == "clip":
            from pq3d_tpu.models.clip_text import CLIPTextEncoder
            txt_feat = CLIPTextEncoder(
                output_dim=self.hidden_size, vocab_size=tc.vocab_size,
                width=tc.width, tower_heads=tc.heads, tower_layers=tc.layers,
                freeze_backbone=tc.freeze_backbone,
                use_projection=tc.use_projection,
                projection_type=tc.projection_type,
                num_projection_layers=tc.num_projection_layers,
                compute_dtype=tc.compute_dtype,
                name="txt_encoder")(
                prompt.astype(jnp.int32), valid, deterministic=deterministic)
        else:
            from pq3d_tpu.models.clip_text import BERTTextEncoder
            txt_feat = BERTTextEncoder(
                hidden_size=self.hidden_size, vocab_size=tc.vocab_size,
                num_heads=tc.heads, num_layers=tc.layers,
                name="txt_encoder")(
                prompt.astype(jnp.int32), valid, deterministic=deterministic)

        # location path: first dim_loc floats hold the target box
        loc = prompt[:, :max(self.dim_loc, 1)]
        if self.dim_loc > 3:
            loc_feat = (coord_encoder(loc[:, None, :3]) +
                        box_encoder(loc[:, None, 3:6]))
        else:
            loc_feat = coord_encoder(
                loc[:, None, :3],
                input_range=(batch["coord_min"], batch["coord_max"]))
        loc_feat = jnp.pad(loc_feat,
                           ((0, 0), (0, prompt.shape[1] - 1), (0, 0)))
        loc_valid = jnp.zeros_like(valid).at[:, 0].set(True)

        is_txt = (ptype == PROMPT_TXT)[:, None]
        feat = jnp.where(is_txt[..., None], txt_feat, loc_feat)
        mask = jnp.where(is_txt, valid, loc_valid)

        # image path (BEYOND the reference: PromptType.IMAGE is declared at
        # data/datasets/constant.py:628-631 but never implemented there).
        # Rows of type IMAGE carry precomputed image features in
        # batch["prompt_img_fts"] (B, L, D_img) — e.g. CLIP vision-tower
        # tokens — projected into the decoder width.  NOTE: flax creates
        # img_encoder params only when this branch traces, so a model that
        # will serve IMAGE prompts must also be init'd on a batch carrying
        # prompt_img_fts (same rule as any optional input).
        if "prompt_img_fts" in batch:
            img_feat = ObjectEncoder(
                hidden_size=self.hidden_size,
                input_feat_size=batch["prompt_img_fts"].shape[-1],
                use_projection=True, dropout=0.0, name="img_encoder")(
                batch["prompt_img_fts"], deterministic)
            is_img = (ptype == PROMPT_IMAGE)[:, None]
            # validity comes from the image tokens, NOT the text pad mask
            # (an IMAGE row's text field is naturally empty/all-padding):
            # optional batch["prompt_img_masks"], else every token real
            img_valid = batch.get("prompt_img_masks")
            if img_valid is None:
                img_valid = jnp.ones_like(valid)
            feat = jnp.where(is_img[..., None], img_feat, feat)
            mask = jnp.where(is_img, img_valid.astype(bool), mask)
        return feat, mask


def build_model(cfg) -> Query3DUnified:
    """Construct the model from a YAML config (reference config schema,
    e.g. configs/instseg_sceneverse.yaml / unified_tasks_sceneverse.yaml)."""
    m = cfg.model
    ue = m.unified_encoder.args

    def enc_cfg(node, default_in=768):
        if node is None:
            return EncoderCfg(input_feat_size=default_in)
        a = node.args
        return EncoderCfg(
            input_feat_size=a.get("input_feat_size", default_in),
            use_projection=a.get("use_projection", True),
            dropout=a.get("dropout", 0.1),
            backbone=a.get("backbone", "none"),
            freeze_backbone=a.get("freeze_backbone", False))

    use_offline_voxel = m.get("use_offline_voxel_fts", False)
    voxel_node = m.get("voxel_encoder")
    if use_offline_voxel or voxel_node is None:
        voxel_enc = VoxelEncoderCfg()
        voxel_obj_enc = enc_cfg(voxel_node, default_in=128)
    else:
        a = voxel_node.args
        bk = a.get("backbone_kwargs", {})
        bk_cfg = bk.get("config", {}) if bk else {}
        voxel_enc = VoxelEncoderCfg(
            hlevels=tuple(a.get("hlevels", [0, 1, 2, 3])),
            dropout=a.get("dropout", 0.1),
            freeze_backbone=a.get("freeze_backbone", False),
            out_channels=bk.get("out_channels", 200) if bk else 200,
            bn_momentum=bk_cfg.get("bn_momentum", 0.02) if bk_cfg else 0.02,
            conv1_kernel_size=bk_cfg.get("conv1_kernel_size", 5) if bk_cfg else 5,
            # scatter-free transpose-map backward is the fast training path
            # (1.46x vs full-remat scatter backward, measured on v5e)
            remat_policy=a.get("remat_policy", "none"),
            grad_mode=a.get("grad_mode", "scatter_free"),
            # the reference's PCDMask3DSwin3DEncoder selects the (unvendored)
            # Swin3DUNet backbone; here it selects the TPU-native
            # window-attention U-Net (models/swin3d.py)
            backbone=("swin3d" if voxel_node.name == "PCDMask3DSwin3DEncoder"
                      else a.get("backbone", "res16unet")),
            swin_window=int(bk_cfg.get("window",
                                       a.get("swin_window", 4)) or 4),
            sorted_gather=a.get("sorted_gather", False),
            int8_gather=a.get("int8_gather", False),
            pallas_conv=a.get("pallas_conv", False))
        voxel_obj_enc = EncoderCfg(input_feat_size=128)

    mask_head_cfg = None
    if m.get("mask_head") is not None:
        a = m.mask_head.args
        mask_head_cfg = MaskHeadCfg(
            num_targets=a.num_targets,
            filter_out_classes=tuple(a.get("filter_out_classes") or ()),
            memories_for_match=tuple(a.get("memories_for_match", m.memories)))

    gh = GroundHeadCfg()
    if m.get("ground_head") is not None:
        a = m.ground_head.args
        gh = GroundHeadCfg(hidden_size=a.get("hidden_size", 384),
                           dropout=a.get("dropout", 0.3))

    gen = GenerationHeadCfg()
    if m.get("generation_head") is not None:
        a = m.generation_head.args
        gen = GenerationHeadCfg(
            vocab_size=a.get("vocab_size", 32128),
            d_model=a.get("d_model", 512),
            d_kv=a.get("d_kv", 64),
            d_ff=a.get("d_ff", 2048),
            num_layers=a.get("num_layers", 6),
            num_heads=a.get("num_heads", 8),
            max_new_tokens=a.get("max_new_tokens", 50),
            use_projection=a.get("use_projection", True),
            early_exit=a.get("early_exit", False))

    txt_cfg = TxtEncoderCfg()
    if m.get("txt_encoder") is not None:
        ta = m.txt_encoder.get("args", {}) or {}
        tower = m.get("txt_tower", {}) or {}
        kind = "bert" if "BERT" in m.txt_encoder.get("name", "") else "clip"
        txt_cfg = TxtEncoderCfg(
            kind=kind,
            vocab_size=tower.get("vocab_size", 49408),
            width=tower.get("width", 768),
            layers=tower.get("layers", 12),
            heads=tower.get("heads", 12),
            use_projection=ta.get("use_projection", True),
            projection_type=ta.get("projection_type", "mlp"),
            num_projection_layers=ta.get("num_projection_layers", 1),
            freeze_backbone=ta.get("freeze_backbone", True),
            compute_dtype=ta.get("compute_dtype", "float32"))

    qa_head = m.get("qa_head", {}) or {}
    qa_args = qa_head.get("args", {}) if hasattr(qa_head, "get") else {}
    return Query3DUnified(
        memories=tuple(m.memories),
        heads=tuple(m.heads),
        qa_num_answers=int(qa_args.get("num_answers",
                                       m.get("qa_num_answers", 8864))),
        hidden_size=m.hidden_size,
        dim_loc=m.obj_loc.dim_loc,
        spatial_dim=m.obj_loc.spatial_dim,
        pairwise_rel_type=m.obj_loc.pairwise_rel_type,
        use_offline_voxel_fts=use_offline_voxel,
        use_offline_attn_mask=m.get("use_offline_attn_mask", False),
        skip_query_encoder_mask_pred=m.get("skip_query_encoder_mask_pred", False),
        unified=UnifiedEncoderCfg(
            num_layers=ue.num_layers,
            num_blocks=ue.get("num_blocks", 1),
            num_attention_heads=ue.num_attention_heads,
            structure=ue.structure,
            spatial_selfattn=ue.get("spatial_selfattn", True),
            use_self_mask=ue.get("use_self_mask", False),
            memory_dropout=ue.get("memory_dropout", 0.0),
            drop_memories_test=tuple(ue.get("drop_memories_test") or ())),
        mv_enc=enc_cfg(m.get("mv_encoder")),
        pc_enc=enc_cfg(m.get("pc_encoder")),
        voxel_obj_enc=voxel_obj_enc,
        voxel_enc=voxel_enc,
        mask_head_cfg=mask_head_cfg,
        ground_head_cfg=gh,
        generation_head_cfg=gen,
        txt_cfg=txt_cfg,
    )
