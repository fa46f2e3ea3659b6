"""Scatter-free custom-VJP convs must match native autodiff exactly
(same math, different realization: transpose-map gathers instead of
XLA scatter-adds)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pq3d_tpu.ops import kernel_maps, sparse


@pytest.fixture(scope="module")
def hierarchy():
    rng = np.random.default_rng(0)
    coords = np.unique(rng.integers(0, 12, (400, 3)).astype(np.int32),
                       axis=0)
    return kernel_maps.build_hierarchy(coords, bucket=128), len(coords)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_sym_conv_grads_match(hierarchy, rng):
    h, n = hierarchy
    nbr = jnp.asarray(h.nbr3[0])
    valid = jnp.asarray(h.valid[0])
    p0 = h.pad_sizes[0]
    x = _rand(rng, p0, 16) * valid[:, None]
    w = _rand(rng, 27, 16, 8)

    def loss_native(x, w):
        return (sparse.sparse_conv(x, nbr, w, None, valid,
                                   jnp.float32, jnp.float32) ** 2).sum()

    def loss_custom(x, w):
        return (sparse.sparse_conv_sym(x, nbr, w, valid,
                                       jnp.float32, jnp.float32) ** 2).sum()

    gx_n, gw_n = jax.grad(loss_native, argnums=(0, 1))(x, w)
    gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n),
                               rtol=1e-4, atol=1e-4)


def test_down_conv_grads_match(hierarchy, rng):
    h, n = hierarchy
    child = jnp.asarray(h.child[0])
    parent = jnp.asarray(h.parent[0])
    parent_off = jnp.asarray(h.parent_off[0])
    v0 = jnp.asarray(h.valid[0])
    v1 = jnp.asarray(h.valid[1])
    x = _rand(rng, h.pad_sizes[0], 16) * v0[:, None]
    w = _rand(rng, 8, 16, 8)

    def loss_native(x, w):
        return (sparse.sparse_conv(x, child, w, None, v1,
                                   jnp.float32, jnp.float32) ** 2).sum()

    def loss_custom(x, w):
        return (sparse.sparse_conv_down(x, child, w, parent, parent_off,
                                        v1, v0, jnp.float32,
                                        jnp.float32) ** 2).sum()

    gx_n, gw_n = jax.grad(loss_native, argnums=(0, 1))(x, w)
    gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n),
                               rtol=1e-4, atol=1e-4)


def test_transpose_conv_grads_match(hierarchy, rng):
    h, n = hierarchy
    child = jnp.asarray(h.child[0])
    parent = jnp.asarray(h.parent[0])
    parent_off = jnp.asarray(h.parent_off[0])
    v0 = jnp.asarray(h.valid[0])
    v1 = jnp.asarray(h.valid[1])
    x = _rand(rng, h.pad_sizes[1], 16) * v1[:, None]
    w = _rand(rng, 8, 16, 8)

    def loss_native(x, w):
        return (sparse.sparse_conv_transpose(x, parent, parent_off, w, v0,
                                             jnp.float32,
                                             jnp.float32) ** 2).sum()

    def loss_custom(x, w):
        return (sparse.sparse_conv_transpose_gf(
            x, parent, parent_off, w, child, v0, v1, jnp.float32,
            jnp.float32) ** 2).sum()

    gx_n, gw_n = jax.grad(loss_native, argnums=(0, 1))(x, w)
    gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_n),
                               rtol=1e-4, atol=1e-4)


def test_sym_conv_5cube_stem(hierarchy, rng):
    """conv0's 5^3 stencil is odd-lexicographic too -> same duality."""
    h, n = hierarchy
    nbr = jnp.asarray(h.nbr5_l0)
    valid = jnp.asarray(h.valid[0])
    x = _rand(rng, h.pad_sizes[0], 4) * valid[:, None]
    w = _rand(rng, nbr.shape[1], 4, 8)

    gx_n = jax.grad(lambda x: (sparse.sparse_conv(
        x, nbr, w, None, valid, jnp.float32, jnp.float32) ** 2).sum())(x)
    gx_c = jax.grad(lambda x: (sparse.sparse_conv_sym(
        x, nbr, w, valid, jnp.float32, jnp.float32) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-4)
