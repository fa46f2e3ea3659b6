"""Dense-block stem conv == gathered 125-tap sparse conv (values + dW).

conv0 is the U-Net's most row-fetch-bound conv (125 tiny-row gathers per
voxel, PERF.md); ops/sparse.conv0_dense_block replaces it with whole-block
halo gathers + one dense MXU conv.  These tests pin exact numerical parity
(f32 compute) against the reference formulation on the same scene.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.ops import kernel_maps, sparse, window_maps
import pytest


def _scene_coords(n=800, extent=30, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, extent, (n, 3))
    coords = np.unique(pts, axis=0).astype(np.int32)
    # key-sorted like voxelize.quantize output
    return coords


def _setup(kernel=5, block=8, cin=3, cout=16, seed=0):
    rng = np.random.default_rng(seed)
    coords = _scene_coords(seed=seed)
    n = len(coords)
    x = rng.standard_normal((n, cin)).astype(np.float32)
    w = (rng.standard_normal((kernel ** 3, cin, cout)) * 0.1).astype(
        np.float32)
    nbr = kernel_maps.build_neighbor_map(coords, kernel)
    p = window_maps.build_window_pack(coords, block, 0, with_neighbors=True)
    nb_pad = p["n_win"] + 2  # exercise padded blocks
    b3 = block ** 3
    dense = np.zeros((nb_pad * b3, cin), np.float32)
    dense[p["vox_slot"]] = x
    c2v = np.full(nb_pad * b3, -1, np.int32)
    c2v[:len(p["cell_to_vox"])] = p["cell_to_vox"]
    nbrblk = np.full((nb_pad, 27), -1, np.int32)
    nbrblk[:p["n_win"]] = p["nbr_win"]
    return (jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(w),
            jnp.asarray(dense.reshape(nb_pad, b3 * cin)),
            jnp.asarray(nbrblk), jnp.asarray(p["vox_slot"]),
            jnp.asarray(c2v))


def test_dense_stem_matches_gathered_conv():
    for kernel in (5, 3):
        x, nbr, w, dense, nbrblk, slot, c2v = _setup(kernel=kernel)
        ref = sparse.sparse_conv(x, nbr, w, compute_dtype=jnp.float32)
        got = sparse.conv0_dense_block(dense, nbrblk, slot, c2v, w,
                                       kernel=kernel,
                                       compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_dense_stem_weight_grad_matches():
    x, nbr, w, dense, nbrblk, slot, c2v = _setup()
    dy = jnp.asarray(np.random.default_rng(3).standard_normal(
        (x.shape[0], w.shape[-1])).astype(np.float32))

    def loss_ref(w):
        return jnp.sum(sparse.sparse_conv(
            x, nbr, w, compute_dtype=jnp.float32) * dy)

    def loss_dense(w):
        return jnp.sum(sparse.conv0_dense_block(
            dense, nbrblk, slot, c2v, w, compute_dtype=jnp.float32) * dy)

    g_ref = jax.grad(loss_ref)(w)
    g_dense = jax.grad(loss_dense)(w)
    np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pipeline_dense_stem_end_to_end():
    """make_batch(stem_mode='dense_block') drives Res16UNet to the same
    result as the gathered stem with shared params."""
    from pq3d_tpu.models.sparse_unet import Res16UNet
    rng = np.random.default_rng(0)
    scenes = [synthetic.make_scene(rng, n_points=500, n_instances=3,
                                   n_segments=10) for _ in range(2)]
    for s in scenes:
        s["inst_labels"] = np.minimum(s["inst_labels"], 19)
    kw = dict(voxel_size=0.15, num_queries=8, max_segments=32,
              max_instances=8, voxel_bucket=256, use_aug=False)
    b_g = make_batch(scenes, InstSegPipelineConfig(**kw),
                     np.random.default_rng(1), train=False)
    b_d = make_batch(scenes, InstSegPipelineConfig(stem_mode="dense_block",
                                                   **kw),
                     np.random.default_rng(1), train=False)
    assert "nbr5_0" not in b_d["maps"] and "stem_dense" in b_d["maps"]

    model = Res16UNet(out_channels=8, planes=(8, 8, 8, 8, 8, 8, 8, 8),
                      layers=(1, 1, 1, 1, 1, 1, 1, 1))
    mg = jax.tree.map(jnp.asarray, b_g["maps"])
    md = jax.tree.map(jnp.asarray, b_d["maps"])
    xg = jnp.asarray(b_g["voxel_feats"])
    variables = model.init(jax.random.key(0), xg, mg, train=False)
    out_g, _ = model.apply(variables, xg, mg, train=False)
    out_d, _ = model.apply(variables, jnp.asarray(b_d["voxel_feats"]), md,
                           train=False)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g),
                               rtol=2e-2, atol=5e-3)  # bf16 compute path
