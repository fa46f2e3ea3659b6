"""sorted_maps conv path == default path exactly (values and gradients).

The monotonized sorted-index gather (ops/sparse.sorted_conv_maps) is a pure
performance variant: key-sorted coords make every tap's valid indices
monotone, missing rows carry the previous index via a running max, and the
contribution is masked out — results must be bit-identical in f32.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.ops import kernel_maps, sparse


def _maps(seed=0, n=700, extent=24):
    rng = np.random.default_rng(seed)
    coords = np.unique(rng.integers(0, extent, (n, 3)), axis=0).astype(
        np.int32)
    # voxelize.quantize emits key-sorted coords; np.unique rows are
    # lexicographically sorted == ravel-key sorted for non-negative coords
    h = kernel_maps.build_hierarchy(coords, bucket=256, build_nbr5=True)
    return h, rng


def test_sorted_maps_are_monotone():
    h, _ = _maps()
    for nbr in [h.nbr3[0], h.nbr5_l0, h.child[0]]:
        idx, valid = jax.jit(sparse.sorted_conv_maps)(jnp.asarray(nbr))
        idx = np.asarray(idx)
        assert (np.diff(idx, axis=0) >= 0).all()
        # valid rows keep their original index
        nbrc = np.asarray(nbr)
        assert (idx[nbrc >= 0] == nbrc[nbrc >= 0]).all()


def test_sorted_conv_matches_default():
    h, rng = _maps()
    p0 = h.pad_sizes[0]
    x = jnp.asarray(rng.standard_normal((p0, 8)).astype(np.float32)
                    * np.asarray(h.valid[0])[:, None])
    w = jnp.asarray(rng.standard_normal((27, 8, 16)).astype(np.float32))
    nbr = jnp.asarray(h.nbr3[0])
    valid = jnp.asarray(h.valid[0])
    ref = sparse.sparse_conv(x, nbr, w, None, valid,
                             compute_dtype=jnp.float32)
    got = sparse.sparse_conv(x, nbr, w, None, valid,
                             compute_dtype=jnp.float32, sorted_maps=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sorted_scatter_free_grads_match():
    h, rng = _maps(seed=1)
    p0, p1 = h.pad_sizes[0], h.pad_sizes[1]
    x = jnp.asarray(rng.standard_normal((p0, 8)).astype(np.float32)
                    * np.asarray(h.valid[0])[:, None])
    w3 = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32))
    wd = jnp.asarray(rng.standard_normal((8, 8, 8)).astype(np.float32))
    nbr = jnp.asarray(h.nbr3[0])
    v0, v1 = jnp.asarray(h.valid[0]), jnp.asarray(h.valid[1])
    child = jnp.asarray(h.child[0])
    parent = jnp.asarray(h.parent[0])
    poff = jnp.asarray(h.parent_off[0])

    def loss(args, sorted_maps):
        x_, w3_, wd_ = args
        y = sparse.sparse_conv_sym(x_, nbr, w3_, v0,
                                   compute_dtype=jnp.float32,
                                   sorted_maps=sorted_maps)
        z = sparse.sparse_conv_down(y, child, wd_, parent, poff, v1, v0,
                                    compute_dtype=jnp.float32,
                                    sorted_maps=sorted_maps)
        return jnp.sum(z ** 2)

    g_ref = jax.grad(lambda a: loss(a, False))((x, w3, wd))
    g_got = jax.grad(lambda a: loss(a, True))((x, w3, wd))
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_compact_sym_grads_match_native():
    """Scatter-free compact backward == native autodiff of the padded conv
    (exact in f32)."""
    h, rng = _maps(seed=4)
    p0 = h.pad_sizes[0]
    x = jnp.asarray(rng.standard_normal((p0, 8)).astype(np.float32)
                    * np.asarray(h.valid[0])[:, None])
    w = jnp.asarray(rng.standard_normal((27, 8, 8)).astype(np.float32))
    nbr = h.nbr3[0]
    v0 = jnp.asarray(h.valid[0])
    plan = kernel_maps.build_compact_conv(nbr, m_bucket=128, row_bucket=64)
    plan_j = {k: jnp.asarray(v) for k, v in plan.items() if k != "n_out"}

    def loss_ref(args):
        x_, w_ = args
        y = sparse.sparse_conv(x_, jnp.asarray(nbr), w_, None, v0,
                               compute_dtype=jnp.float32)
        return jnp.sum(y ** 2)

    def loss_cmp(args):
        x_, w_ = args
        y = sparse.sparse_conv_compact_sym(x_, plan_j, w_, v0,
                                           compute_dtype=jnp.float32)
        return jnp.sum(y ** 2)

    lr_, g_ref = jax.value_and_grad(loss_ref)((x, w))
    lc_, g_cmp = jax.value_and_grad(loss_cmp)((x, w))
    np.testing.assert_allclose(float(lc_), float(lr_), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_cmp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
