"""int8-quantized conv gathers (ops/sparse int8_gather): the inference
lever that halves the tap-gather HBM traffic.  Quantization is per-channel
symmetric, the scale folds into the kernel weights, so output error is
bounded by the int8 rounding step (~0.4% of each channel's max)."""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.ops import kernel_maps, sparse
import pytest


def _maps(seed=0, n=700, extent=24):
    rng = np.random.default_rng(seed)
    coords = np.unique(rng.integers(0, extent, (n, 3)), axis=0).astype(
        np.int32)
    h = kernel_maps.build_hierarchy(coords, bucket=256, build_nbr5=True)
    return h, rng


def test_quantize_rows_roundtrip():
    rng = np.random.default_rng(1)
    # channels at wildly different magnitudes: per-channel scales must keep
    # each channel's relative error at the int8 step, not the global max
    x = rng.standard_normal((300, 6)).astype(np.float32)
    x *= np.array([1e-3, 1e-2, 0.1, 1.0, 10.0, 100.0], np.float32)
    q, s = jax.jit(sparse.quantize_rows)(jnp.asarray(x))
    assert q.dtype == jnp.int8
    deq = np.asarray(q, np.float32) * np.asarray(s)
    err = np.abs(deq - x).max(axis=0) / np.abs(x).max(axis=0)
    assert (err < 1 / 127).all()


def test_int8_conv_close_to_f32():
    h, rng = _maps()
    p0 = h.pad_sizes[0]
    x = jnp.asarray(rng.standard_normal((p0, 16)).astype(np.float32)
                    * np.asarray(h.valid[0])[:, None])
    w = jnp.asarray(rng.standard_normal((27, 16, 8)).astype(np.float32) * 0.1)
    nbr = jnp.asarray(h.nbr3[0])
    valid = jnp.asarray(h.valid[0])
    ref = jax.jit(lambda: sparse.sparse_conv(
        x, nbr, w, None, valid, compute_dtype=jnp.float32))()
    got = jax.jit(lambda: sparse.sparse_conv(
        x, nbr, w, None, valid, compute_dtype=jnp.float32,
        int8_gather=True))()
    # error budget: 27 taps x int8 step; scale by the output magnitude
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 0.05
    # and the two must correlate essentially perfectly
    r = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert r > 0.999


@pytest.mark.slow
def test_int8_flag_through_unet():
    """Res16UNet with int8_gather compiles and stays close to the f32-gather
    forward in eval mode (BN running stats; identical params)."""
    from pq3d_tpu.models.sparse_unet import Res16UNet

    h, rng = _maps(n=500, extent=16)
    maps = {k: jnp.asarray(v)[None] for k, v in h.device_arrays().items()}
    p0 = h.pad_sizes[0]
    x = jnp.asarray((rng.standard_normal((1, p0, 3)) *
                     np.asarray(h.valid[0])[None, :, None]
                     ).astype(np.float32))

    def run(int8):
        net = Res16UNet(out_channels=24, init_dim=8,
                        planes=(8, 8, 16, 16, 16, 16, 8, 8),
                        layers=(1, 1, 1, 1, 1, 1, 1, 1),
                        int8_gather=int8)
        v = net.init(jax.random.key(0), x, maps, train=False)
        out, _ = net.apply(v, x, maps, train=False)
        return np.asarray(out)

    ref, got = run(False), run(True)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.15  # ~30 quantized convs deep
    r = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert r > 0.99


def test_int8_compact_close_to_f32():
    """int8 gathers compose with the tap-compacted plan."""
    from pq3d_tpu.ops.kernel_maps import build_compact_conv

    h, rng = _maps(n=600, extent=20)
    p0 = h.pad_sizes[0]
    plan = {k: jnp.asarray(v)
            for k, v in build_compact_conv(np.asarray(h.nbr3[0])).items()}
    x = jnp.asarray(rng.standard_normal((p0, 16)).astype(np.float32)
                    * np.asarray(h.valid[0])[:, None])
    w = jnp.asarray(rng.standard_normal((27, 16, 8)).astype(np.float32) * 0.1)
    valid = jnp.asarray(h.valid[0])
    ref = jax.jit(lambda: sparse.sparse_conv_compact(
        x, plan, w, valid, compute_dtype=jnp.float32))()
    got = jax.jit(lambda: sparse.sparse_conv_compact(
        x, plan, w, valid, compute_dtype=jnp.float32, int8_gather=True))()
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 0.05
    r = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert r > 0.999


def test_int8_transpose_close_to_f32():
    h, rng = _maps()
    nc, nf = h.pad_sizes[1], h.pad_sizes[0]
    x = jnp.asarray(rng.standard_normal((nc, 16)).astype(np.float32)
                    * np.asarray(h.valid[1])[:, None])
    w = jnp.asarray(rng.standard_normal((8, 16, 8)).astype(np.float32) * 0.1)
    parent = jnp.asarray(h.parent[0])
    poff = jnp.asarray(h.parent_off[0])
    valid = jnp.asarray(h.valid[0])
    ref = jax.jit(lambda: sparse.sparse_conv_transpose(
        x, parent, poff, w, valid, compute_dtype=jnp.float32))()
    got = jax.jit(lambda: sparse.sparse_conv_transpose(
        x, parent, poff, w, valid, compute_dtype=jnp.float32,
        int8_gather=True))()
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 0.02
