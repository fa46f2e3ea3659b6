"""Numerical parity of native flax T5 decoder / CLIP text tower against
randomly-initialized HF torch models (validates rel-pos buckets, RMSNorm,
tied-logit scaling, causal masking, quick-gelu...)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.mark.parametrize("seed", [0])
def test_t5_decoder_parity(seed):
    from transformers import T5Config, T5ForConditionalGeneration
    from pq3d_tpu.models.t5 import T5Decoder
    from pq3d_tpu.utils.hf_import import import_t5_decoder

    cfg = T5Config(d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
                   vocab_size=100, decoder_start_token_id=0, dropout_rate=0.0,
                   pad_token_id=0, eos_token_id=1, tie_word_embeddings=True)
    torch.manual_seed(seed)
    hf = T5ForConditionalGeneration(cfg).eval()

    rng = np.random.default_rng(seed)
    B, Q, L = 2, 5, 7
    enc = rng.standard_normal((B, Q, 32)).astype(np.float32)
    enc_mask = np.ones((B, Q), bool)
    enc_mask[1, 3:] = False
    dec_in = rng.integers(1, 100, (B, L)).astype(np.int64)

    with torch.no_grad():
        out = hf(encoder_outputs=[torch.tensor(enc)],
                 attention_mask=torch.tensor(enc_mask),
                 decoder_input_ids=torch.tensor(dec_in))
    ref = out.logits.numpy()

    mine = T5Decoder(vocab_size=100, d_model=32, d_kv=8, d_ff=64,
                     num_layers=2, heads=4, dropout=0.0)
    params = import_t5_decoder(hf.state_dict(), num_layers=2)
    got = mine.apply({"params": params}, jnp.asarray(dec_in.astype(np.int32)),
                     jnp.asarray(enc), jnp.asarray(enc_mask),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("seed", [0])
def test_clip_text_tower_parity(seed):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection
    from pq3d_tpu.models.clip_text import CLIPTextTower
    from pq3d_tpu.utils.hf_import import import_clip_text_tower

    cfg = CLIPTextConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         vocab_size=100, projection_dim=24,
                         max_position_embeddings=16, hidden_act="quick_gelu",
                         attention_dropout=0.0)
    torch.manual_seed(seed)
    hf = CLIPTextModelWithProjection(cfg).eval()

    rng = np.random.default_rng(seed)
    B, L = 2, 9
    ids = rng.integers(0, 100, (B, L)).astype(np.int64)
    mask = np.ones((B, L), bool)

    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
        ref = (out.last_hidden_state @ hf.text_projection.weight.T).numpy()

    mine = CLIPTextTower(vocab_size=100, width=32, heads=4, layers=2,
                         max_positions=16, projection_dim=24,
                         intermediate=64)
    params = import_clip_text_tower(hf.state_dict(), num_layers=2)
    got = mine.apply({"params": params}, jnp.asarray(ids.astype(np.int32)),
                     jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)
