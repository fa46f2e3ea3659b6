"""VoteNet-style PointNet++ SA variants (ref pointnet2_modules.py:164-354).

Oracle strategy: the CUDA reference isn't runnable here, so each VoteNet
extension is pinned against either the plain SA module (shared machinery)
or a direct numpy re-computation of the extension's formula (rbf pooling,
unique counts, radius normalization).
"""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.models.pointnet import (PointnetSAModule,
                                      PointnetSAModuleMSGVotes,
                                      PointnetSAModuleVotes, SharedMLP)
from pq3d_tpu.ops import sampling


def _data(seed=0, b=2, n=64, c=8):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    return xyz, feats


def test_votes_max_matches_plain_sa():
    """pooling='max', no normalization == the plain SA module (same FPS,
    same grouping, same MLP params by construction)."""
    xyz, feats = _data()
    votes = PointnetSAModuleVotes(mlp=(16, 16), npoint=8, radius=0.5,
                                  nsample=4)
    plain = PointnetSAModule(mlp=(16, 16), npoint=8, radius=0.5, nsample=4)
    v = votes.init(jax.random.key(0), xyz, feats)
    nx_v, nf_v, inds = votes.apply(v, xyz, feats)
    nx_p, nf_p = plain.apply(v, xyz, feats)    # same param tree shape
    np.testing.assert_allclose(np.asarray(nf_v), np.asarray(nf_p),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nx_v), np.asarray(nx_p))
    assert inds.shape == (2, 8)


def test_votes_external_inds_and_gather():
    xyz, feats = _data(1)
    m = PointnetSAModuleVotes(mlp=(16,), npoint=8, radius=0.5, nsample=4)
    v = m.init(jax.random.key(0), xyz, feats)
    my = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None] * 2, (2, 1))
    nx, _nf, inds = m.apply(v, xyz, feats, inds=my)
    np.testing.assert_array_equal(np.asarray(inds), np.asarray(my))
    np.testing.assert_allclose(
        np.asarray(nx), np.asarray(xyz)[:, ::2][:, :8], atol=0)


def test_votes_rbf_pooling_formula():
    """rbf pooling: sum_s h * exp(-|dx|^2 / (2 sigma^2)) / nsample
    (ref pointnet2_modules.py:262-266)."""
    xyz, feats = _data(2)
    m = PointnetSAModuleVotes(mlp=(16,), npoint=8, radius=0.5, nsample=4,
                              pooling="rbf")
    v = m.init(jax.random.key(0), xyz, feats)
    _nx, nf, inds = m.apply(v, xyz, feats)
    # recompute with the shared pieces
    centers = sampling.gather_centers_batched(xyz, inds)
    idx = sampling.ball_query_batched(xyz, centers, 0.5, 4)
    b, n, _ = xyz.shape
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    gx = jnp.take(xyz.reshape(-1, 3), (idx + off).reshape(-1), axis=0
                  ).reshape(b, 8, 4, 3)
    dxyz = gx - centers[:, :, None, :]
    gf = jnp.take(feats.reshape(-1, feats.shape[-1]),
                  (idx + off).reshape(-1), axis=0).reshape(b, 8, 4, -1)
    grouped = jnp.concatenate([dxyz, gf], -1)
    h = SharedMLP((16,)).apply({"params": v["params"]["mlp"],
                                "batch_stats": v["batch_stats"]["mlp"]},
                               grouped)
    sigma = 0.5 / 2
    rbf = np.exp(-np.sum(np.asarray(dxyz) ** 2, -1) / (sigma ** 2) / 2)
    want = (np.asarray(h) * rbf[..., None]).sum(2) / 4.0
    np.testing.assert_allclose(np.asarray(nf), want, rtol=0, atol=1e-5)


def test_votes_unique_cnt():
    """unique_cnt counts distinct grouped neighbors (the CUDA ball query
    repeats the first hit to fill the ragged tail)."""
    xyz, feats = _data(3)
    m = PointnetSAModuleVotes(mlp=(8,), npoint=8, radius=0.4, nsample=6,
                              ret_unique_cnt=True)
    v = m.init(jax.random.key(0), xyz, feats)
    _nx, _nf, inds, uq = m.apply(v, xyz, feats)
    centers = sampling.gather_centers_batched(xyz, inds)
    idx = np.asarray(sampling.ball_query_batched(xyz, centers, 0.4, 6))
    want = np.array([[len(np.unique(idx[i, j])) for j in range(8)]
                     for i in range(2)])
    np.testing.assert_array_equal(np.asarray(uq), want)


def test_msg_votes_shapes_and_inds():
    xyz, feats = _data(4)
    m = PointnetSAModuleMSGVotes(mlps=((16,), (8,)), npoint=8,
                                 radii=(0.3, 0.6), nsamples=(4, 8))
    v = m.init(jax.random.key(0), xyz, feats)
    nx, nf, inds = m.apply(v, xyz, feats)
    assert nx.shape == (2, 8, 3)
    assert nf.shape == (2, 8, 24)      # concat across scales
    assert inds.dtype == jnp.int32
