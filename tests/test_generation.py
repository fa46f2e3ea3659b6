"""T5 generation head: teacher forcing shapes, greedy decode, EOS freeze."""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.models.generation import T5GenerationHead
from pq3d_tpu.models.query3d import GenerationHeadCfg
from pq3d_tpu.models.t5 import (RMSNorm, T5_EOS_ID, T5_PAD_ID,
                                relative_position_bucket)


CFG = GenerationHeadCfg(vocab_size=32, d_model=16, d_kv=4, d_ff=32,
                        num_layers=1, num_heads=2, max_new_tokens=6)


def setup():
    head = T5GenerationHead(cfg=CFG)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((2, 5, 24)).astype(np.float32))
    mask = jnp.ones((2, 5), bool)
    v = head.init(jax.random.key(0), enc, mask, labels=None)
    return head, v, enc, mask


def test_teacher_forcing_logits():
    head, v, enc, mask = setup()
    labels = jnp.asarray(np.array([[3, 4, 1, 0], [5, 6, 7, 1]], np.int32))
    logits = head.apply(v, enc, mask, labels=labels)
    assert logits.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(logits)).all()


def test_greedy_decode_and_eos_freeze():
    head, v, enc, mask = setup()
    toks = np.asarray(head.apply(v, enc, mask, labels=None))
    assert toks.shape == (2, 6)
    # once EOS appears, everything after is PAD
    for row in toks:
        seen_eos = False
        for t in row:
            if seen_eos:
                assert t == T5_PAD_ID
            if t == T5_EOS_ID:
                seen_eos = True


def test_relative_position_bucket_monotone():
    rel = jnp.arange(0, -50, -1)[None, :]  # distances 0..49 back
    b = np.asarray(relative_position_bucket(rel, 32, 128))[0]
    assert b[0] == 0
    assert (np.diff(b) >= 0).all()
    assert b.max() < 32


def test_rmsnorm_no_mean_subtraction():
    m = RMSNorm()
    x = jnp.asarray(np.full((2, 4), 3.0, np.float32))
    v = m.init(jax.random.key(0), x)
    y = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(y, 1.0, rtol=1e-5)  # 3/sqrt(9)=1, no centering


def test_early_exit_decode_token_exact():
    """while_loop early-exit decode == fixed-length scan decode, token-exact.

    vocab=4 with random weights makes EOS (id 1) land within a few steps
    with near-certainty, so the early-exit path actually exercises the
    stop-short branch while remaining comparable to the scan output."""
    cfg_scan = GenerationHeadCfg(vocab_size=4, d_model=16, d_kv=4, d_ff=32,
                                 num_layers=1, num_heads=2, max_new_tokens=12)
    cfg_ee = GenerationHeadCfg(vocab_size=4, d_model=16, d_kv=4, d_ff=32,
                               num_layers=1, num_heads=2, max_new_tokens=12,
                               early_exit=True)
    rng = np.random.default_rng(3)
    enc = jnp.asarray(rng.standard_normal((3, 5, 24)).astype(np.float32))
    mask = jnp.ones((3, 5), bool)
    head_scan = T5GenerationHead(cfg=cfg_scan)
    v = head_scan.init(jax.random.key(1), enc, mask, labels=None)
    toks_scan = np.asarray(head_scan.apply(v, enc, mask, labels=None))
    head_ee = T5GenerationHead(cfg=cfg_ee)
    toks_ee = np.asarray(head_ee.apply(v, enc, mask, labels=None))
    np.testing.assert_array_equal(toks_scan, toks_ee)
    # the wide-vocab case (EOS unlikely -> loop runs the full window)
    cfg_full = GenerationHeadCfg(vocab_size=32, d_model=16, d_kv=4, d_ff=32,
                                 num_layers=1, num_heads=2, max_new_tokens=6,
                                 early_exit=True)
    head, v2, enc2, mask2 = setup()
    toks_a = np.asarray(head.apply(v2, enc2, mask2, labels=None))
    toks_b = np.asarray(T5GenerationHead(cfg=cfg_full).apply(
        v2, enc2, mask2, labels=None))
    np.testing.assert_array_equal(toks_a, toks_b)


def test_two_phase_decode_token_exact():
    """two_phase returns projected states; decode_states over them must be
    token-exact with the fused single-phase decode (serving split,
    GenerationHeadCfg.two_phase)."""
    import dataclasses
    from pq3d_tpu.models.generation import decode_states

    head, v, enc, mask = setup()
    toks = np.asarray(head.apply(v, enc, mask, labels=None))

    cfg2 = dataclasses.replace(CFG, two_phase=True)
    head2 = T5GenerationHead(cfg=cfg2)
    states = head2.apply(v, enc, mask, labels=None)
    assert states.shape == (2, 5, CFG.d_model)
    # decode_states expects the FULL model tree layout
    full_v = {"params": {"generation_head": v["params"]}}
    toks2 = np.asarray(decode_states(full_v, states, mask, cfg2))
    np.testing.assert_array_equal(toks2, toks)
