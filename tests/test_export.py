"""AOT export (pq3d_tpu/export.py): serialized StableHLO artifacts
round-trip and reproduce the live model bit-exactly, and cross-lower for
TPU from a CPU host."""
import numpy as np
import jax

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.export import export_forward, exported_platforms, load_forward
from pq3d_tpu.models.query3d import (EncoderCfg, MaskHeadCfg, Query3DUnified,
                                     UnifiedEncoderCfg, VoxelEncoderCfg)
import pytest

pytestmark = pytest.mark.slow  # >=~1 min on the 1-core box (fast tier: -m "not slow")


def _setup():
    rng = np.random.default_rng(0)
    pipe = InstSegPipelineConfig(
        voxel_size=0.15, num_queries=8, max_segments=32, max_instances=8,
        voxel_bucket=128, use_aug=False,
        level_caps=[512, 256, 128, 128, 128])
    scenes = [synthetic.make_scene(rng, n_points=600, n_instances=3,
                                   n_segments=16) for _ in range(2)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    batch = make_batch(scenes, pipe, rng, train=False)
    S = pipe.max_segments
    for name in ("mv", "pc"):
        batch[f"{name}_seg_fts"] = rng.standard_normal(
            (2, S, 16)).astype(np.float32)
        batch[f"{name}_seg_pad_masks"] = batch["seg_pad_masks"]
    batch = {k: v for k, v in batch.items() if not k.startswith("_")}

    model = Query3DUnified(
        memories=("voxel", "mv", "pc"), heads=("mask",), hidden_size=32,
        dim_loc=3,
        unified=UnifiedEncoderCfg(num_layers=1, num_blocks=1,
                                  num_attention_heads=4,
                                  structure="parallel",
                                  spatial_selfattn=True, use_self_mask=True),
        mv_enc=EncoderCfg(input_feat_size=16),
        pc_enc=EncoderCfg(input_feat_size=16),
        voxel_enc=VoxelEncoderCfg(hlevels=(0, 1), out_channels=20),
        mask_head_cfg=MaskHeadCfg(num_targets=21,
                                  filter_out_classes=(0, 2)))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    return model, variables, batch


def test_export_roundtrip_bitexact():
    model, variables, batch = _setup()
    blob = export_forward(
        model, variables, batch,
        outputs=("predictions_class", "predictions_mask"),
        platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000
    fn = load_forward(blob)
    got = fn(batch)
    assert set(got) == {"predictions_class", "predictions_mask"}
    # compare against the JITTED forward: the artifact embeds the jitted
    # computation, which differs from eager apply by fusion rounding
    ref = jax.jit(lambda b: model.apply(variables, b, train=False))(batch)
    np.testing.assert_array_equal(
        np.asarray(got["predictions_class"][-1]),
        np.asarray(ref["predictions_class"][-1]))
    np.testing.assert_array_equal(
        np.asarray(got["predictions_mask"][-1]),
        np.asarray(ref["predictions_mask"][-1]))


def test_export_cross_lowers_for_tpu():
    """A CPU host can build a TPU-targeted artifact (deploy-time story)."""
    model, variables, batch = _setup()
    blob = export_forward(model, variables, batch,
                          outputs=("predictions_class",),
                          platforms=("cpu", "tpu"))
    assert set(exported_platforms(blob)) == {"cpu", "tpu"}
    # and the dual-platform artifact still runs on this (CPU) backend
    out = load_forward(blob)(batch)
    assert np.isfinite(np.asarray(out["predictions_class"][-1])).all()


def test_export_unified_with_generation():
    """The stage-2 unified model — CLIP-style prompt routing, mixed fusion,
    grounding head, and the KV-cached T5 greedy decode (lax.scan) — exports
    and reproduces the jitted forward bit-exactly."""
    from test_model_unified import unified_model, B, S, Q, L, RESP
    from pq3d_tpu.models.query3d import PROMPT_TXT, PROMPT_LOC
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b = {
        "query_locs": rng.standard_normal((B, Q, 6)).astype(np.float32),
        "query_pad_masks": np.ones((B, Q), bool),
        "seg_center": rng.standard_normal((B, S, 6)).astype(np.float32),
        "seg_pad_masks": np.ones((B, S), bool),
        "coord_min": np.full((B, 3), -1, np.float32),
        "coord_max": np.full((B, 3), 1, np.float32),
        "mv_seg_fts": rng.standard_normal((B, S, 16)).astype(np.float32),
        "mv_seg_pad_masks": np.ones((B, S), bool),
        "pc_seg_fts": rng.standard_normal((B, S, 16)).astype(np.float32),
        "pc_seg_pad_masks": np.ones((B, S), bool),
        "voxel_seg_fts": rng.standard_normal((B, S, 8)).astype(np.float32),
        "voxel_seg_pad_masks": np.ones((B, S), bool),
        "prompt": rng.integers(0, 64, (B, L)).astype(np.float32),
        "prompt_pad_masks": np.ones((B, L), bool),
        "prompt_type": np.array([PROMPT_TXT, PROMPT_TXT, PROMPT_LOC,
                                 PROMPT_TXT]),
    }
    batch = jax.tree.map(jnp.asarray, b)
    model = unified_model()
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)

    blob = export_forward(model, variables, batch,
                          outputs=("ground_logits", "generation_tokens"),
                          platforms=("cpu",))
    got = load_forward(blob)(batch)
    ref = jax.jit(lambda bb: model.apply(variables, bb, train=False))(batch)
    np.testing.assert_array_equal(np.asarray(got["ground_logits"]),
                                  np.asarray(ref["ground_logits"]))
    np.testing.assert_array_equal(np.asarray(got["generation_tokens"]),
                                  np.asarray(ref["generation_tokens"]))
