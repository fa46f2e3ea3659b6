"""Mesh + sharding-rule tests on the virtual 8-device CPU mesh.

Verifies the Megatron TP rules actually match real model param paths and
that a TP/FSDP-sharded forward matches the replicated one numerically.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pq3d_tpu.parallel.mesh import (MeshConfig, make_mesh, param_spec,
                                    path_name, shard_batch, shard_params,
                                    tp_spec)


def _flat_params(params):
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return {path_name(p) + "/": x for p, x in flat}


def test_tp_rules_match_attention_params():
    from pq3d_tpu.models.layers import FFNLayer, MultiHeadAttention
    cfg = MeshConfig(data=2, fsdp=1, tp=2)
    attn = MultiHeadAttention(d_model=64, n_head=4)
    x = jnp.zeros((1, 8, 64))
    params = attn.init(jax.random.PRNGKey(0), x, x, x)
    flat = _flat_params(params)
    hits = {n: tp_spec(n, v, cfg) for n, v in flat.items()}
    qk = [n for n in hits if "q_proj/kernel" in n]
    assert qk and hits[qk[0]] == jax.sharding.PartitionSpec(None, "tp")
    ok = [n for n in hits if "out_proj/kernel" in n]
    assert ok and hits[ok[0]] == jax.sharding.PartitionSpec("tp", None)

    ffn = FFNLayer(d_model=64, dim_feedforward=128)
    fparams = ffn.init(jax.random.PRNGKey(0), x)
    fhits = {n: tp_spec(n, v, cfg) for n, v in _flat_params(fparams).items()}
    up = [n for n in fhits if "Dense_0/kernel" in n]
    dn = [n for n in fhits if "Dense_1/kernel" in n]
    assert up and fhits[up[0]] == jax.sharding.PartitionSpec(None, "tp")
    assert dn and fhits[dn[0]] == jax.sharding.PartitionSpec("tp", None)


def test_tp_rules_match_t5_params():
    from pq3d_tpu.models.t5 import T5Decoder
    cfg = MeshConfig(data=2, fsdp=1, tp=2)
    dec = T5Decoder(vocab_size=64, d_model=32, d_kv=8, d_ff=64, heads=4,
                    num_layers=1)
    enc = jnp.zeros((1, 4, 32))
    tok = jnp.zeros((1, 3), jnp.int32)
    params = dec.init(jax.random.PRNGKey(0), tok, enc,
                      jnp.ones((1, 4), bool))
    hits = {n: tp_spec(n, v, cfg)
            for n, v in _flat_params(params).items()}
    assert any(v is not None and "tp" in str(v) for v in hits.values())
    wi = [n for n in hits if "/wi/kernel" in n]
    wo = [n for n in hits if "/wo/kernel" in n]
    assert wi and hits[wi[0]] == jax.sharding.PartitionSpec(None, "tp")
    assert wo and hits[wo[0]] == jax.sharding.PartitionSpec("tp", None)


def test_sharded_forward_matches_replicated():
    """GSPMD semantics: TP+FSDP sharded attention == replicated, bitwise
    tolerance ~1e-5 (collective reduction order differs)."""
    from pq3d_tpu.models.layers import MultiHeadAttention
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = MeshConfig(data=2, fsdp=2, tp=2, fsdp_min_size=1)
    mesh = make_mesh(cfg, devices=jax.devices()[:8])
    attn = MultiHeadAttention(d_model=64, n_head=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 64)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, x, x)

    ref, _ = jax.jit(attn.apply)(params, x, x, x)
    sp = shard_params(params, mesh, cfg)
    xb = shard_batch(x, mesh)
    out, _ = jax.jit(attn.apply)(sp, xb, xb, xb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_param_spec_fsdp_combines_with_tp():
    cfg = MeshConfig(data=2, fsdp=2, tp=2, fsdp_min_size=1)
    x = jnp.zeros((64, 128))
    # column-parallel param: tp on dim 1, fsdp takes dim 0
    spec = param_spec("layer/q_proj/kernel/", x, cfg)
    assert spec == jax.sharding.PartitionSpec("fsdp", "tp")
    # unmatched param: largest dim on fsdp only
    spec2 = param_spec("layer/some_embed/", x, cfg)
    assert spec2 == jax.sharding.PartitionSpec(None, "fsdp")
