"""Import HuggingFace torch checkpoints into native flax modules.

The reference loads pretrained HF torch weights for CLIP text
(openai/clip-vit-large-patch14) and T5 (t5-small) (reference:
modules/language/clip.py:16, modules/heads/generation_head.py:11).  We ship
native flax implementations; this module maps HF ``state_dict`` tensors onto
their parameter trees so real checkpoints can be imported when available
(and so parity tests can validate the native code against torch).

All inputs are ``dict[str, np.ndarray]`` (call ``.numpy()`` on torch tensors
first or pass a torch state_dict — tensors are converted on the fly).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def import_t5_decoder(sd: Dict[str, Any], num_layers: int) -> Dict:
    """HF T5ForConditionalGeneration state_dict -> params for
    :class:`pq3d_tpu.models.t5.T5Decoder` (decoder side + shared embedding)."""
    p: Dict[str, Any] = {}
    p["embed"] = {"embedding": _np(sd["shared.weight"])}
    for i in range(num_layers):
        base = f"decoder.block.{i}.layer"
        blk: Dict[str, Any] = {}
        blk["self_attn"] = {
            "q": {"kernel": _np(sd[f"{base}.0.SelfAttention.q.weight"]).T},
            "k": {"kernel": _np(sd[f"{base}.0.SelfAttention.k.weight"]).T},
            "v": {"kernel": _np(sd[f"{base}.0.SelfAttention.v.weight"]).T},
            "o": {"kernel": _np(sd[f"{base}.0.SelfAttention.o.weight"]).T},
        }
        if i == 0:
            blk["self_attn"]["relative_attention_bias"] = {
                "embedding": _np(
                    sd[f"{base}.0.SelfAttention.relative_attention_bias.weight"])}
        blk["ln_self"] = {"weight": _np(sd[f"{base}.0.layer_norm.weight"])}
        blk["cross_attn"] = {
            "q": {"kernel": _np(sd[f"{base}.1.EncDecAttention.q.weight"]).T},
            "k": {"kernel": _np(sd[f"{base}.1.EncDecAttention.k.weight"]).T},
            "v": {"kernel": _np(sd[f"{base}.1.EncDecAttention.v.weight"]).T},
            "o": {"kernel": _np(sd[f"{base}.1.EncDecAttention.o.weight"]).T},
        }
        blk["ln_cross"] = {"weight": _np(sd[f"{base}.1.layer_norm.weight"])}
        blk["wi"] = {"kernel": _np(sd[f"{base}.2.DenseReluDense.wi.weight"]).T}
        blk["wo"] = {"kernel": _np(sd[f"{base}.2.DenseReluDense.wo.weight"]).T}
        blk["ln_ff"] = {"weight": _np(sd[f"{base}.2.layer_norm.weight"])}
        p[f"block{i}"] = blk
    p["ln_final"] = {"weight": _np(sd["decoder.final_layer_norm.weight"])}
    return p


def import_clip_text_tower(sd: Dict[str, Any], num_layers: int) -> Dict:
    """HF CLIPTextModelWithProjection state_dict -> params for
    :class:`pq3d_tpu.models.clip_text.CLIPTextTower`."""
    def lin(prefix):
        return {"kernel": _np(sd[f"{prefix}.weight"]).T,
                "bias": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"])}

    p: Dict[str, Any] = {
        "token_embedding": {"embedding": _np(
            sd["text_model.embeddings.token_embedding.weight"])},
        "positional_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]),
        "ln_final": ln("text_model.final_layer_norm"),
        "text_projection": _np(sd["text_projection.weight"]).T,
    }
    for i in range(num_layers):
        base = f"text_model.encoder.layers.{i}"
        p[f"block{i}"] = {
            "attn": {
                "q_proj": lin(f"{base}.self_attn.q_proj"),
                "k_proj": lin(f"{base}.self_attn.k_proj"),
                "v_proj": lin(f"{base}.self_attn.v_proj"),
                "out_proj": lin(f"{base}.self_attn.out_proj"),
            },
            "ln_1": ln(f"{base}.layer_norm1"),
            "ln_2": ln(f"{base}.layer_norm2"),
            "fc1": lin(f"{base}.mlp.fc1"),
            "fc2": lin(f"{base}.mlp.fc2"),
        }
    return p


# ---------------------------------------------------------------------------
# full-model import: reference PQ3D torch checkpoints -> Query3DUnified flax
# (ref trainer/build.py:176-186 non-strict load; module namings cited below)
# ---------------------------------------------------------------------------

def _lin_w(sd, key):
    return _np(sd[key]).T


def _split_in_proj(sd, base, part):
    """nn.MultiheadAttention packed in_proj -> q/k/v slice
    (torch layout rows [q; k; v])."""
    w = _np(sd[f"{base}.in_proj_weight"])
    d = w.shape[0] // 3
    i = {"q": 0, "k": 1, "v": 2}[part]
    return w[i * d:(i + 1) * d]


def _resolve_query3d_leaf(path: str, collection: str, memories):
    """flax param path -> (torch_key_fn(sd) -> np.ndarray) | None.

    Torch-side names follow the reference modules:
    - unified encoder: modules/grounding/query_encoder.py:96-181 (layers.{i}
      .self_attn/.cross_attn_list.{j}/.ffn/.gate_proj)
    - spatial attention: modules/layers/transformers.py:158-240
    - mask head: modules/heads/mask_head.py (cls_head Sequential 0/2/4,
      mask_pred_list.{j}.{q,k}_proj)
    - ground head: modules/heads/grounding_head.py:46-55
    - object encoders: modules/vision/object_encoder.py:34
      (input_feat_proj Sequential Linear+LN)
    - voxel seg-level encoder: modules/vision/pcd_mask3d_encoder.py:115-154
      (feat_proj_list.{k}, backbone = mask3d/res16unet.py Res16UNet34C)
    - PointNet++: modules/layers/pointnet.py + third_party/pointnet2
    - CLIP text / T5: handled by import_clip_text_tower / import_t5_decoder
    - coord/box encoders: model/query3d_unified.py:63-71
    """
    import re
    p = path

    def lin(tbase):
        if p.endswith("/kernel"):
            return lambda sd: _lin_w(sd, f"{tbase}.weight")
        return lambda sd: _np(sd[f"{tbase}.bias"])

    def ln(tbase):
        if p.endswith("/scale") or p.endswith("/weight"):
            return lambda sd: _np(sd[f"{tbase}.weight"])
        return lambda sd: _np(sd[f"{tbase}.bias"])

    def bn(tbase):
        if collection == "batch_stats":
            stat = "running_mean" if p.endswith("/mean") else "running_var"
            return lambda sd: _np(sd[f"{tbase}.{stat}"])
        return ln(tbase)

    # ---- unified encoder ------------------------------------------------
    m = re.match(r"unified_encoder/layer(\d+)/(.*)", p)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        t = f"unified_encoder.unified_encoder.{i}"
        mm = re.match(r"cross_attns_(\w+)/(.*)", rest)
        if mm:
            mem, sub = mm.group(1), mm.group(2)
            j = list(memories).index(mem)
            tb = f"{t}.cross_attn_list.{j}"
            if sub.startswith("LayerNorm_0/"):
                return ln(f"{tb}.norm")
            a = f"{tb}.multihead_attn"
            mq = re.match(r"MultiHeadAttention_0/(q|k|v)_proj/(kernel|bias)",
                          sub)
            if mq:
                part, kind = mq.group(1), mq.group(2)
                if kind == "kernel":
                    return lambda sd: _split_in_proj(sd, a, part).T
                d = {"q": 0, "k": 1, "v": 2}[part]
                return lambda sd: np.split(
                    _np(sd[f"{a}.in_proj_bias"]), 3)[d]
            if "out_proj" in sub:
                return lin(f"{a}.out_proj")
        if rest.startswith("ffn/Dense_0/"):
            return lin(f"{t}.ffn.linear1")
        if rest.startswith("ffn/Dense_1/"):
            return lin(f"{t}.ffn.linear2")
        if rest.startswith("ffn/LayerNorm_0/"):
            return ln(f"{t}.ffn.norm")
        if rest.startswith("gate_proj/"):
            return lin(f"{t}.gate_proj")
        if rest.startswith("self_attn/LayerNorm_0/"):
            return ln(f"{t}.self_attn.norm")
        ms = re.match(r"self_attn/MultiHeadAttentionSpatial_0/(\w+)/"
                      r"(kernel|bias)", rest)
        if ms:
            return lin(f"{t}.self_attn.self_attn.{ms.group(1)}")
        mn = re.match(r"self_attn/MultiHeadAttention_0/(q|k|v|out)_proj/"
                      r"(kernel|bias)", rest)
        if mn:
            part, kind = mn.group(1), mn.group(2)
            a = f"{t}.self_attn.self_attn"
            if part == "out":
                return lin(f"{a}.out_proj")
            if kind == "kernel":
                return lambda sd: _split_in_proj(sd, a, part).T
            d = {"q": 0, "k": 1, "v": 2}[part]
            return lambda sd: np.split(_np(sd[f"{a}.in_proj_bias"]), 3)[d]
        return None

    # ---- heads ----------------------------------------------------------
    mlp_heads = {"mask_head/cls_head": "mask_head.cls_head",
                 "ground_head/og3d_head": "ground_head.og3d_head",
                 "txt_encoder/projection": "txt_encoder.projection",
                 "qa_head/mlp": "qa_head.mlp"}
    for fb, tb in mlp_heads.items():
        if p.startswith(fb + "/"):
            sub = p[len(fb) + 1:]
            if sub.startswith("Dense_0/"):
                return lin(f"{tb}.0")
            if sub.startswith("LayerNorm_0/"):
                return ln(f"{tb}.2")
            if sub.startswith("Dense_1/"):
                return lin(f"{tb}.4")
    m = re.match(r"mask_head/mask_pred_(\d+)/(q_proj|k_proj)/", p)
    if m:
        return lin(f"mask_head.mask_pred_list.{m.group(1)}.{m.group(2)}")

    # ---- object encoders (mv / pc / voxel-offline) ------------------------
    m = re.match(r"(mv|pc|voxel)_encoder/(input_feat_proj|LayerNorm_0)/", p)
    if m:
        enc = f"{m.group(1)}_encoder"
        return (lin(f"{enc}.input_feat_proj.0")
                if m.group(2) == "input_feat_proj"
                else ln(f"{enc}.input_feat_proj.1"))

    # PointNet++ backbone: torch SharedMLP Conv2d(out,in,1,1)+BN2d per SA
    # stage (pointnet2_modules.py:26-161, pytorch_utils.py:12-36)
    m = re.match(r"pc_encoder/backbone/sa(\d)/mlp/(dense|bn)(\d)/", p)
    if m:
        s, kind, j = int(m.group(1)), m.group(2), int(m.group(3))
        tb = f"pc_encoder.backbone.sa{s+1}.mlp_module.layer{j}"
        if kind == "dense":
            return lambda sd: _np(sd[f"{tb}.conv.weight"])[:, :, 0, 0].T
        return bn(f"{tb}.normlayer.bn")

    # ---- voxel seg-level encoder ------------------------------------------
    m = re.match(r"voxel_encoder/feat_proj_(\d+)/(Dense_0|LayerNorm_0)/", p)
    if m:
        tb = f"voxel_encoder.feat_proj_list.{m.group(1)}"
        return lin(f"{tb}.0") if m.group(2) == "Dense_0" else ln(f"{tb}.1")

    # U-Net backbone (res16unet.py naming; ME kernels are (K, Cin, Cout)
    # with the same lexicographic offset order as ops/kernel_maps)
    m = re.match(r"voxel_encoder/backbone/(.*)", p)
    if m:
        rest = m.group(1)
        tb = "voxel_encoder.backbone"
        if rest.startswith("conv0/kernel"):
            return lambda sd: _np(sd[f"{tb}.conv0p1s1.kernel"])
        mm = re.match(r"conv(\d)s2/kernel", rest)
        if mm:
            l = int(mm.group(1))
            pitch = 2 ** (l - 1)
            return lambda sd: _np(sd[f"{tb}.conv{l}p{pitch}s2.kernel"])
        mm = re.match(r"bn(\d)/", rest)
        if mm:
            return bn(f"{tb}.bn{mm.group(1)}")
        mm = re.match(r"convtr(\d)/kernel", rest)
        if mm:
            k = int(mm.group(1))
            pitch = 2 ** (8 - k)
            return lambda sd: _np(sd[f"{tb}.convtr{k}p{pitch}s2.kernel"])
        mm = re.match(r"bntr(\d)/", rest)
        if mm:
            return bn(f"{tb}.bntr{mm.group(1)}")
        mm = re.match(r"stage(\d)/block(\d+)/(conv1|conv2|norm1|norm2|"
                      r"downsample_conv|downsample_norm)/", rest)
        if mm:
            s, bidx, layer = int(mm.group(1)), mm.group(2), mm.group(3)
            blk = s if s <= 4 else s  # blocks named block1..block8 in order
            tbb = f"{tb}.block{blk}.{bidx}"
            if layer in ("conv1", "conv2"):
                return lambda sd: _np(sd[f"{tbb}.{layer}.kernel"])
            if layer in ("norm1", "norm2"):
                return bn(f"{tbb}.{layer}")
            if layer == "downsample_conv":
                # ME 1x1 conv kernel (Cin, Cout) -> Dense kernel directly
                return lambda sd: np.squeeze(
                    _np(sd[f"{tbb}.downsample.0.kernel"]))
            return bn(f"{tbb}.downsample.1")
        if rest.startswith("final/kernel"):
            return lambda sd: np.squeeze(_np(sd[f"{tb}.final.kernel"]))
        if rest.startswith("final/bias"):
            return lambda sd: _np(sd[f"{tb}.final.bias"])
        return None

    # ---- location encoders -------------------------------------------------
    simple = {
        "coord_dense/": "coord_encoder.0", "coord_ln/": "coord_encoder.1",
        "box_dense/": "box_encoder.0", "box_ln/": "box_encoder.1",
        "generation_head/input_proj/": "generation_head.input_proj.0",
        "generation_head/LayerNorm_0/": "generation_head.input_proj.1",
    }
    for fb, tb in simple.items():
        if p.startswith(fb):
            return ln(tb) if ("ln" in fb.lower() or "LayerNorm" in fb) \
                else lin(tb)
    if p == "coord_encoder/pos_enc/gauss_B":
        # Fourier PE buffer (mask3d position_embedding.py gauss_B)
        return lambda sd: _np(sd["coord_encoder.pos_enc.gauss_B"])
    # dim_loc=3 Fourier coordinate encoder projection
    # (ref mask3d position_embedding PositionEmbeddingCoordsSine has no
    # params; the reference CoordinateEncoder wraps a Linear+LN)
    m = re.match(r"coord_encoder/(Dense_0|LayerNorm_0)/", p)
    if m:
        return (lin("coord_encoder.feat_proj.0")
                if m.group(1) == "Dense_0"
                else ln("coord_encoder.feat_proj.1"))
    return None


def import_query3d(sd, variables, memories=("mv", "pc", "voxel", "prompt"),
                   t5_layers=None, clip_layers=None):
    """Map a reference PQ3D torch ``state_dict`` onto Query3DUnified flax
    ``variables`` (params + batch_stats).  Non-strict like the reference
    (trainer/build.py:176-186): unmatched/shape-mismatched tensors are
    reported, not fatal.

    Returns ``(new_variables, report)`` where report lists ``loaded``,
    ``missing`` (flax leaves with no torch source) and ``unused`` (torch
    keys never read).
    """
    import jax
    # canonicalize torch key spellings: strip DDP's 'module.' prefix and
    # accept the flat 'unified_encoder.layers.{i}' alias for the reference's
    # layer_repeat nesting 'unified_encoder.unified_encoder.{i}'
    # (actual reference naming: query_encoder.py layer_repeat ModuleList)
    canon = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        k = k.replace("unified_encoder.layers.",
                      "unified_encoder.unified_encoder.")
        canon[k] = v
    sd = canon
    used = set()

    class _Recording(dict):
        def __getitem__(self, key):
            used.add(key)
            return dict.__getitem__(self, key)

    sd = _Recording(sd)
    report = {"loaded": [], "missing": [], "mismatched": []}

    # sub-model imports for the HF towers (exact layouts)
    def try_subtree(prefix, import_fn, torch_prefix, n_layers):
        keys = [k for k in sd if k.startswith(torch_prefix)]
        if not keys:
            return None
        sub_sd = {k[len(torch_prefix):]: sd[k] for k in keys}
        try:
            out = import_fn(sub_sd, n_layers)
            used.update(keys)
            return out
        except KeyError:
            return None

    new_vars = {}
    for collection in variables:
        flat = {}
        leaves, treedef = jax.tree_util.tree_flatten_with_path(
            variables[collection])
        for kp, leaf in leaves:
            path = "/".join(str(k.key) for k in kp)
            fn = _resolve_query3d_leaf(path, collection, memories)
            src = None
            if fn is not None:
                try:
                    src = fn(sd)
                except KeyError:
                    src = None
            if src is not None:
                if tuple(src.shape) == tuple(np.shape(leaf)):
                    flat[path] = np.asarray(src, dtype=leaf.dtype
                                            if hasattr(leaf, "dtype")
                                            else np.float32)
                    report["loaded"].append(path)
                else:
                    report["mismatched"].append(
                        (path, tuple(np.shape(leaf)), tuple(src.shape)))
                    flat[path] = leaf
            else:
                if not (path.startswith("txt_encoder/tower")
                        or path.startswith("generation_head/decoder")):
                    report["missing"].append(f"{collection}:{path}")
                flat[path] = leaf
        rebuilt = jax.tree_util.tree_unflatten(
            treedef, [flat["/".join(str(k.key) for k in kp)]
                      for kp, _ in leaves])
        new_vars[collection] = rebuilt

    # HF towers (value layouts handled by the dedicated importers)
    params = new_vars.get("params", {})
    if "txt_encoder" in params and "tower" in params["txt_encoder"]:
        n = max(clip_layers or 0,
                len([k for k in params["txt_encoder"]["tower"]
                     if str(k).startswith("block")]))
        tower = try_subtree("txt_encoder/tower", import_clip_text_tower,
                            "txt_encoder.model.", n)
        if tower is not None:
            _merge_matching(params["txt_encoder"]["tower"], tower, report,
                            "txt_encoder/tower")
    if "generation_head" in params and "decoder" in params["generation_head"]:
        n = max(t5_layers or 0,
                len([k for k in params["generation_head"]["decoder"]
                     if str(k).startswith("block")]))
        dec = try_subtree("generation_head/decoder", import_t5_decoder,
                          "generation_head.model.", n)
        if dec is not None:
            _merge_matching(params["generation_head"]["decoder"], dec,
                            report, "generation_head/decoder")

    report["unused"] = sorted(k for k in sd if k not in used)
    return new_vars, report


def _merge_matching(dst, src, report, prefix):
    """Recursively copy matching-shaped arrays from src into dst (both
    nested dicts), recording loads/mismatches."""
    for k, v in src.items():
        if k not in dst:
            continue
        if isinstance(v, dict) and isinstance(dst[k], dict):
            _merge_matching(dst[k], v, report, f"{prefix}/{k}")
        elif not isinstance(v, dict):
            if tuple(np.shape(v)) == tuple(np.shape(dst[k])):
                dst[k] = np.asarray(v, dtype=getattr(dst[k], "dtype",
                                                     np.float32))
                report["loaded"].append(f"{prefix}/{k}")
            else:
                report["mismatched"].append(
                    (f"{prefix}/{k}", tuple(np.shape(dst[k])),
                     tuple(np.shape(v))))
