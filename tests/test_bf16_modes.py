"""bf16 inference fast paths stay numerically close to f32.

compute_dtype='bfloat16' runs the frozen CLIP tower's matmuls in bf16
(PERF.md: the tower is ~5 ms of the 26.5 ms unified inference step in f32);
parameters and the trainable projection stay f32.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.models.clip_text import CLIPTextEncoder


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
