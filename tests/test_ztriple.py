"""z-run fetch conv (ops/sparse.sparse_conv_ztriple) == baseline gather conv.

The plan exploits the ravel-key sort (z fastest): each (dy, dx) kernel
column's up-to-3 z-neighbors occupy consecutive rows, so 9 wide fetches +
code-masked slot re-alignment reproduce the 27-tap conv exactly.  Values
must match bit-identically in f32; the scatter-free symmetric backward must
pin against native autodiff of the baseline conv.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.data import instseg_pipeline as ip
from pq3d_tpu.ops import kernel_maps, sparse
import pytest


def _maps(seed=0, n=700, extent=24):
    rng = np.random.default_rng(seed)
    coords = np.unique(rng.integers(0, extent, (n, 3)), axis=0).astype(
        np.int32)
    h = kernel_maps.build_hierarchy(coords, bucket=256)
    return h, rng


def test_ztriple_matches_baseline_all_levels():
    h, rng = _maps()
    for lvl in range(3):
        p = h.pad_sizes[lvl]
        x = jnp.asarray(rng.standard_normal((p, 8)).astype(np.float32)
                        * np.asarray(h.valid[lvl])[:, None])
        w = jnp.asarray(rng.standard_normal((27, 8, 16)).astype(np.float32))
        nbr = h.nbr3[lvl]
        valid = jnp.asarray(h.valid[lvl])
        zb, zc = kernel_maps.build_ztriple_plan(nbr, n_pad=p)
        ref = sparse.sparse_conv(x, jnp.asarray(nbr), w, None, valid,
                                 compute_dtype=jnp.float32)
        got = sparse.sparse_conv_ztriple(x, jnp.asarray(zb), jnp.asarray(zc),
                                         w, valid,
                                         compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_ztriple_plan_covers_every_tap():
    # every valid (output, tap) pair of the neighbor map must be represented
    # exactly once in the plan's codes
    h, _ = _maps(seed=3, n=900, extent=16)
    nbr = h.nbr3[0]
    zb, zc = kernel_maps.build_ztriple_plan(nbr, n_pad=nbr.shape[0])
    n = nbr.shape[0]
    nbrr = nbr.reshape(n, 9, 3)
    for c in range(9):
        for dz in (-1, 0, 1):
            want = nbrr[:, c, dz + 1]
            hits = (zc[:, c] == dz)  # (N, 3) slot mask
            assert (hits.sum(1) == (want >= 0)).all()
            slot = hits.argmax(1)
            rows = zb[:, c] + slot
            m = want >= 0
            assert (rows[m] == want[m]).all()


def test_ztriple_sym_grads_match_native():
    h, rng = _maps(seed=1)
    p = h.pad_sizes[1]
    x = jnp.asarray(rng.standard_normal((p, 8)).astype(np.float32)
                    * np.asarray(h.valid[1])[:, None])
    w = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32))
    nbr = h.nbr3[1]
    valid = jnp.asarray(h.valid[1])
    zb, zc = (jnp.asarray(a) for a in
              kernel_maps.build_ztriple_plan(nbr, n_pad=p))

    def loss_ref(x, w):
        y = sparse.sparse_conv(x, jnp.asarray(nbr), w, None, valid,
                               compute_dtype=jnp.float32)
        return jnp.sum(jnp.sin(y))

    def loss_zt(x, w):
        y = sparse.sparse_conv_ztriple_sym(x, zb, zc, w, valid,
                                           compute_dtype=jnp.float32)
        return jnp.sum(jnp.sin(y))

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_zt, gw_zt = jax.grad(loss_zt, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_zt), np.asarray(gx_ref),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_zt), np.asarray(gw_ref),
                               rtol=0, atol=2e-4)


def _tiny_scene(rng):
    from pq3d_tpu.data import synthetic
    return synthetic.make_scene(rng, n_points=600, n_instances=3,
                                n_segments=12)


def _unet_out(batch, seed=0):
    from pq3d_tpu.models.sparse_unet import Res16UNet
    unet = Res16UNet(out_channels=20, planes=(8, 8, 8, 8, 8, 8, 8, 8),
                     layers=(1, 1, 1, 1, 1, 1, 1, 1))
    vf = jnp.asarray(batch["voxel_feats"])
    maps = {k: jnp.asarray(v) for k, v in batch["maps"].items()}
    vs = unet.init(jax.random.key(seed), vf, maps, train=False)
    out, _ = unet.apply(vs, vf, maps, train=False)
    return np.asarray(out)


@pytest.mark.slow
def test_unet_forward_equal_with_ztriple_both_layouts():
    rng = np.random.default_rng(7)
    scenes = [_tiny_scene(rng), _tiny_scene(rng)]
    for flat in (False, True):
        cfg = ip.InstSegPipelineConfig(
            voxel_size=0.05, num_queries=8, max_segments=16,
            max_instances=8, use_aug=False, voxel_bucket=256,
            stem_mode="gather", flat_pack=flat)
        base = ip.make_batch(scenes, cfg, np.random.default_rng(0),
                             train=False)
        zt = ip.make_batch(scenes, dataclasses.replace(cfg,
                                                       ztriple_conv=True),
                           np.random.default_rng(0), train=False)
        assert any(k.startswith("zt") for k in zt["maps"])
        o0 = _unet_out(base)
        o1 = _unet_out(zt)
        np.testing.assert_allclose(o1, o0, rtol=0, atol=2e-3)
