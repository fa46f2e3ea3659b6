"""END-TO-END forward parity against the ACTUAL reference torch model.

Builds the reference ``Query3DUnified`` (model/query3d_unified.py) on CPU
torch with a stage-2-style config (mv + pc memories, CLIP text + LOC
prompts, ground + mask heads, mixed fusion, dim_loc=6), exports its
``state_dict``, imports it into the flax model with
``utils.hf_import.import_query3d``, and asserts the two forwards agree on
the same batch.  This is the strongest checkpoint-compatibility artifact:
it pins the full composition (prompt router, double box-embedding add,
memory encoders, unified encoder, mask + ground heads) to the reference
implementation itself.

External deps the reference files import but this path never executes
(fvcore registries, MinkowskiEngine, CUDA PointNet++) are stubbed;
``from_pretrained`` is patched to construct small local HF models
(zero-egress image).
"""
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

B, Q, S, LP, D, HEADS, FEAT = 2, 6, 12, 8, 64, 4, 32
LT, GVOCAB = 5, 100
VOCAB, TOWER_LAYERS = 512, 2
MEMORIES = ["mv", "pc", "prompt"]


class Node(types.SimpleNamespace):
    """Config node: attribute access + .get + dict() conversion (covers the
    reference's mixed omegaconf access styles with the stubbed cfg2dict)."""

    def get(self, k, d=None):
        return getattr(self, k, d)

    def keys(self):
        return self.__dict__.keys()

    def __getitem__(self, k):
        return self.__dict__[k]


def _install_stubs():
    from _ref_stubs import install
    install()


def _patch_from_pretrained():
    from transformers import (CLIPTextConfig, CLIPTextModelWithProjection,
                              T5Config, T5ForConditionalGeneration)
    cfg = CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=D, intermediate_size=4 * D,
        num_hidden_layers=TOWER_LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=77, projection_dim=D)
    CLIPTextModelWithProjection.from_pretrained = classmethod(
        lambda cls, *a, **k: cls(cfg))
    t5cfg = T5Config(vocab_size=GVOCAB, d_model=32, d_kv=8, d_ff=64,
                     num_layers=1, num_heads=4, dropout_rate=0.0,
                     decoder_start_token_id=0)
    T5ForConditionalGeneration.from_pretrained = classmethod(
        lambda cls, *a, **k: cls(t5cfg))


def _build_ref(structure="mixed", dim_loc=6, self_mask=False,
               memories=None):
    memories = memories or MEMORIES
    _install_stubs()
    _patch_from_pretrained()
    import importlib
    # import the module files so their registry decorators run
    for m in ("modules.vision.object_encoder", "modules.language.clip",
              "modules.grounding.query_encoder",
              "modules.heads.grounding_head", "modules.heads.mask_head",
              "modules.heads.generation_head"):
        importlib.import_module(m)
    q3d = importlib.import_module("model.query3d_unified")

    mcfg = Node(
        memories=memories, heads=["ground", "generation", "mask"],
        hidden_size=D,
        use_offline_voxel_fts=False, use_offline_attn_mask=False,
        skip_query_encoder_mask_pred=not self_mask,
        obj_loc=Node(dim_loc=dim_loc, spatial_dim=5,
                     pairwise_rel_type="center"),
        unified_encoder=Node(name="QueryMaskEncoder", args=Node(**{
            "memories": memories, "hidden_size": D,
            "num_attention_heads": HEADS, "num_layers": 1,
            "structure": structure, "spatial_selfattn": True,
            "memory_dropout": 0.0, "num_blocks": 2 if self_mask else 1,
            "use_self_mask": self_mask})),
        mv_encoder=Node(name="ObjectEncoder", args=Node(**{
            "backbone": "none", "input_feat_size": FEAT, "hidden_size": D,
            "use_projection": True, "use_cls_head": False, "dropout": 0.0})),
        pc_encoder=Node(name="ObjectEncoder", args=Node(**{
            "backbone": "none", "input_feat_size": FEAT, "hidden_size": D,
            "use_projection": True, "use_cls_head": False, "dropout": 0.0})),
        txt_encoder=Node(name="CLIPLanguageEncoder", args=Node(**{
            "output_dim": D, "use_projection": True,
            "projection_type": "mlp", "dropout": 0.0})),
        ground_head=Node(name="GroundHead", args=Node(**{
            "input_size": D, "hidden_size": 32, "dropout": 0.0})),
        generation_head=Node(name="T5", args=Node(**{
            "input_size": D, "use_projection": True})),
        mask_head=Node(name="MaskHeadSegLevel", args=Node(**{
            "hidden_size": D, "num_targets": 21,
            "memories_for_match": ["mv", "pc"],
            "filter_out_classes": [0, 2], "dropout": 0.0})))
    cfg = Node(model=mcfg)
    torch.manual_seed(0)
    model = q3d.Query3DUnified(cfg)
    model.eval()
    return model


def _batch(rng, dim_loc=6):
    dl = dim_loc
    prompt = np.zeros((B, LP), np.float32)
    prompt[0] = rng.integers(1, VOCAB, LP)            # item 0: TXT
    prompt[1, :6] = rng.standard_normal(6)            # item 1: LOC box
    prompt_type = np.array([1, 3], np.int64)          # TXT, LOC
    prompt_masks = np.ones((B, LP), bool)
    prompt_masks[0, 6:] = False
    seg_center = rng.standard_normal((B, S, dl)).astype(np.float32)
    return {
        "query_locs": rng.standard_normal((B, Q, dl)).astype(np.float32),
        "query_pad_masks": np.tile([True] * (Q - 1) + [False], (B, 1)),
        "coord_min": np.full((B, 3), -2, np.float32),
        "coord_max": np.full((B, 3), 2, np.float32),
        "seg_center": seg_center,
        "seg_pad_masks": np.tile([True] * (S - 2) + [False, False], (B, 1)),
        "mv_seg_fts": rng.standard_normal((B, S, FEAT)).astype(np.float32),
        "mv_seg_pad_masks": np.tile([True] * (S - 1) + [False], (B, 1)),
        "pc_seg_fts": rng.standard_normal((B, S, FEAT)).astype(np.float32),
        "pc_seg_pad_masks": np.tile([True] * (S - 2) + [False, False],
                                    (B, 1)),
        "prompt": prompt,
        "prompt_pad_masks": prompt_masks,
        "prompt_type": prompt_type,
        "tgt_object_id": np.zeros((B,), np.int64),
        "response": rng.integers(2, GVOCAB, (B, LT)).astype(np.int64),
    }


@pytest.mark.parametrize("structure,dim_loc,self_mask", [
    ("mixed", 6, False), ("sequential", 6, False), ("gate", 6, False),
    ("mixed", 3, False),
    # stage-1-style iterative decoder: per-round mask predictions feed the
    # sigmoid<0.5 cross-attention masks (ref query_encoder.py:69-94)
    ("parallel", 3, True)])
def test_full_model_forward_parity(structure, dim_loc, self_mask):
    from pq3d_tpu.models.query3d import (EncoderCfg, GroundHeadCfg,
                                         MaskHeadCfg, Query3DUnified,
                                         TxtEncoderCfg, UnifiedEncoderCfg)
    from pq3d_tpu.utils.hf_import import import_query3d

    memories = ["mv", "pc"] if self_mask else MEMORIES
    ref_model = _build_ref(structure, dim_loc, self_mask, memories)
    rng = np.random.default_rng(0)
    batch_np = _batch(rng, dim_loc)

    # ---- reference forward -------------------------------------------------
    # copies: the reference prompt router mutates prompt_pad_masks in place
    tdict = {k: torch.from_numpy(np.asarray(v).copy())
             for k, v in batch_np.items()}
    cap = {}
    hook = ref_model.unified_encoder.register_forward_hook(
        lambda m, i, o: cap.update(q=o[0]))
    with torch.no_grad():
        tout = ref_model(dict(tdict))
        # eval-mode reference runs generate(); teacher-forced logits come
        # from driving its generation head directly on the captured query
        # (the unified encoder has a hard-wired 0.1 dropout in train mode,
        # query_encoder.py:97, so train-mode comparison is impossible)
        ref_gen = ref_model.generation_head(
            cap["q"], torch.from_numpy(batch_np["query_pad_masks"].copy()),
            torch.from_numpy(batch_np["response"].copy())).numpy()
    hook.remove()
    ref_ground = tout["ground_logits"].numpy()
    ref_cls = tout["predictions_class"][-1].detach().numpy()
    ref_mask = tout["predictions_mask"][-1].detach().numpy()
    n_rounds_ref = len(tout["predictions_class"])

    # ---- flax model with imported weights ---------------------------------
    from pq3d_tpu.models.query3d import GenerationHeadCfg
    model = Query3DUnified(
        memories=tuple(memories), heads=("ground", "generation", "mask"),
        hidden_size=D,
        dim_loc=dim_loc, skip_query_encoder_mask_pred=not self_mask,
        unified=UnifiedEncoderCfg(num_layers=1,
                                  num_blocks=2 if self_mask else 1,
                                  num_attention_heads=HEADS,
                                  structure=structure, spatial_selfattn=True,
                                  use_self_mask=self_mask),
        mv_enc=EncoderCfg(input_feat_size=FEAT),
        pc_enc=EncoderCfg(input_feat_size=FEAT),
        mask_head_cfg=MaskHeadCfg(num_targets=21,
                                  filter_out_classes=(0, 2),
                                  memories_for_match=("mv", "pc")),
        ground_head_cfg=GroundHeadCfg(hidden_size=32),
        generation_head_cfg=GenerationHeadCfg(
            vocab_size=GVOCAB, d_model=32, d_kv=8, d_ff=64, num_layers=1,
            num_heads=4, max_new_tokens=4, use_projection=True),
        txt_cfg=TxtEncoderCfg(kind="clip", vocab_size=VOCAB, width=D,
                              layers=TOWER_LAYERS, heads=HEADS,
                              use_projection=True, projection_type="mlp"))
    jbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jbatch, train=False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables, report = import_query3d(sd, variables,
                                       memories=tuple(memories),
                                       clip_layers=TOWER_LAYERS, t5_layers=1)
    assert not report["mismatched"], report["mismatched"][:5]
    missing = [m for m in report["missing"]
               if "num_batches_tracked" not in m]
    assert not missing, missing[:8]

    out = model.apply(variables, jbatch, train=False)
    assert len(out["predictions_class"]) == n_rounds_ref
    got_gen = np.asarray(out["generation_logits"], np.float32)
    got_ground = np.asarray(out["ground_logits"], np.float32)
    got_cls = np.asarray(out["predictions_class"][-1], np.float32)
    got_mask = np.asarray(out["predictions_mask"][-1], np.float32)

    qv = batch_np["query_pad_masks"]
    np.testing.assert_allclose(got_ground[qv], ref_ground[qv],
                               rtol=1e-3, atol=5e-3)
    # cls logits: filtered classes are -inf on both sides
    keep = np.ones(21, bool)
    keep[[0, 2]] = False
    np.testing.assert_allclose(got_cls[qv][:, keep], ref_cls[qv][:, keep],
                               rtol=1e-3, atol=5e-3)
    # ours masks filtered classes with -1e9 (TPU-safe finite -inf);
    # reference uses float('-inf') — both eliminate the class
    assert (got_cls[qv][:, ~keep] <= -1e8).all()
    assert np.isneginf(ref_cls[qv][:, ~keep]).all()
    np.testing.assert_allclose(got_gen, ref_gen, rtol=1e-3, atol=5e-3)
    sv = batch_np["seg_pad_masks"]
    # mask logits: compare on valid (query, segment) pairs
    for b in range(B):
        gq = np.where(qv[b])[0]
        gs = np.where(sv[b])[0]
        np.testing.assert_allclose(
            got_mask[b][np.ix_(gs, gq)], ref_mask[b][np.ix_(gs, gq)],
            rtol=1e-3, atol=5e-3)
