"""bf16 inference fast paths stay numerically close to f32.

compute_dtype='bfloat16' runs the frozen CLIP tower's matmuls in bf16
(PERF.md: the tower is ~5 ms of the 26.5 ms unified inference step in f32);
parameters and the trainable projection stay f32.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.models.clip_text import CLIPTextEncoder
import pytest


def test_clip_bf16_tower_close_to_f32():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 1000, (2, 16)), jnp.int32)
    mask = jnp.asarray(rng.random((2, 16)) < 0.9)
    kw = dict(output_dim=64, width=64, tower_heads=4, tower_layers=2)
    enc32 = CLIPTextEncoder(**kw)
    encbf = CLIPTextEncoder(compute_dtype="bfloat16", **kw)
    variables = enc32.init(jax.random.key(0), ids, mask)
    o32 = np.asarray(enc32.apply(variables, ids, mask))
    obf = np.asarray(encbf.apply(variables, ids, mask))
    # same params, same output up to bf16 rounding through 2 blocks
    assert np.abs(o32 - obf).max() < 0.05
    assert np.abs(o32 - obf).mean() < 0.005
    assert obf.dtype == np.float32  # trainable projection output stays f32


@pytest.mark.slow
def test_bf16_param_cast_instseg_swin_close():
    """Whole-model bf16 cast on the instseg flat_swin serving path (the
    round-4 chip winner: 164 -> 109 ms, chip_runs/0820a/bf16_fwd.log —
    the swin attention/matmuls otherwise run f32).  Class predictions must
    stay close to f32 and decided argmaxes agree."""
    from pq3d_tpu.data import synthetic
    from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig,
                                                make_batch)
    from pq3d_tpu.models.query3d import (EncoderCfg, MaskHeadCfg,
                                         Query3DUnified, UnifiedEncoderCfg,
                                         VoxelEncoderCfg)
    from pq3d_tpu.utils.inference import cast_batch_bf16, cast_params_bf16

    rng = np.random.default_rng(0)
    scenes = [synthetic.make_scene(rng, n_points=n, n_instances=3,
                                   n_segments=16) for n in (700, 1000)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    cfg = InstSegPipelineConfig(
        voxel_size=0.15, num_queries=8, max_segments=32, max_instances=8,
        voxel_bucket=128, use_aug=False, stem_mode="none", flat_pack=True,
        swin_window=4)
    b = make_batch(scenes, cfg, np.random.default_rng(1), train=False)
    r = np.random.default_rng(5)
    B, S = b["seg_pad_masks"].shape
    b["mv_seg_fts"] = r.standard_normal((B, S, 16)).astype(np.float32)
    b["mv_seg_pad_masks"] = b["seg_pad_masks"]
    b["pc_seg_fts"] = r.standard_normal((B, S, 16)).astype(np.float32)
    b["pc_seg_pad_masks"] = b["seg_pad_masks"]
    b = jax.tree.map(jnp.asarray,
                     {k: v for k, v in b.items() if not k.startswith("_")})
    model = Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=32,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        mv_enc=EncoderCfg(input_feat_size=16),
        pc_enc=EncoderCfg(input_feat_size=16),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20,
                                  backbone="swin3d"),
        mask_head_cfg=MaskHeadCfg(num_targets=21, filter_out_classes=(0, 2)))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        b, train=False)
    out32 = model.apply(variables, b, train=False)
    outbf = model.apply(cast_params_bf16(variables), cast_batch_bf16(b),
                        train=False)
    c32 = np.asarray(out32["predictions_class"][-1], np.float32)
    cbf = np.asarray(outbf["predictions_class"][-1], np.float32)
    scale = np.abs(c32).max() + 1e-6
    assert np.abs(c32 - cbf).max() / scale < 0.1
    srt = np.sort(c32, -1)
    decided = (srt[..., -1] - srt[..., -2]) / scale > 0.03
    assert (c32.argmax(-1) == cbf.argmax(-1))[decided].all()
    m32 = np.asarray(out32["predictions_mask"][-1], np.float32)
    mbf = np.asarray(outbf["predictions_mask"][-1], np.float32)
    mscale = np.abs(m32).max() + 1e-6
    # mask logits gate through sigmoid>0.5; bf16 noise stays well inside
    assert np.abs(m32 - mbf).max() / mscale < 0.1


@pytest.mark.slow
def test_bf16_param_cast_unified_forward_close():
    """Whole-model bf16 param cast (utils/inference.py): the unified
    forward's outputs stay close to f32 and grounding rankings agree."""
    from pq3d_tpu.data.unified_datasets import SyntheticRefer
    from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.config import Config
    from pq3d_tpu.models.query3d import (Query3DUnified, UnifiedEncoderCfg,
                                         EncoderCfg, GroundHeadCfg,
                                         GenerationHeadCfg, TxtEncoderCfg)
    from pq3d_tpu.utils.inference import cast_batch_bf16, cast_params_bf16

    cfg = Config({"data": {"synthetic": {"num_train": 2, "n_points": 600,
                                         "n_instances": 4}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=8, num_points=64,
                                 prompt_len=12, response_len=8)
    loader = UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                               batch_size=2, train=False,
                               feature_dims={"mv": 32, "voxel": 16})
    batch = next(iter(loader(0)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not k.startswith("_")}
    model = Query3DUnified(
        memories=("mv", "voxel", "prompt"), heads=("ground", "generation"),
        hidden_size=64, dim_loc=6, use_offline_voxel_fts=True,
        skip_query_encoder_mask_pred=True, mask_head_cfg=None,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4, structure="mixed"),
        mv_enc=EncoderCfg(input_feat_size=32),
        voxel_obj_enc=EncoderCfg(input_feat_size=16),
        ground_head_cfg=GroundHeadCfg(hidden_size=32),
        generation_head_cfg=GenerationHeadCfg(
            vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=1,
            num_heads=4, max_new_tokens=4),
        txt_cfg=TxtEncoderCfg(vocab_size=200, width=32, layers=1, heads=4))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    out32 = model.apply(variables, batch, train=False)
    outbf = model.apply(cast_params_bf16(variables), cast_batch_bf16(batch),
                        train=False)
    g32 = np.asarray(out32["ground_logits"], np.float32)
    gbf = np.asarray(outbf["ground_logits"], np.float32)
    scale = np.abs(g32).max() + 1e-6
    assert np.abs(g32 - gbf).max() / scale < 0.1
    # top-1 grounding choice agrees wherever f32 isn't a near-tie: with
    # random-init weights two objects can land within bf16 rounding of each
    # other, and which one wins then depends on the host's rounding — only
    # rows whose top-2 margin exceeds the bf16 noise floor are stable
    srt = np.sort(g32, -1)
    decided = (srt[:, -1] - srt[:, -2]) / scale > 0.03
    assert (g32.argmax(-1) == gbf.argmax(-1))[decided].all()
