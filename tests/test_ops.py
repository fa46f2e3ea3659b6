"""Golden tests for the kernel substrate against tiny numpy references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pq3d_tpu.ops import voxelize, kernel_maps, sparse, segment, sampling, hungarian, pairwise


# ---------------------------------------------------------------------------
# voxelize
# ---------------------------------------------------------------------------

def test_quantize_dedups_and_inverse(rng):
    pts = rng.random((500, 3)) * 2 - 1
    vox, uniq, inv = voxelize.quantize(pts, 0.1)
    grid = np.floor(pts / 0.1).astype(np.int32)
    assert len(vox) == len(np.unique(grid, axis=0))
    np.testing.assert_array_equal(vox[inv], grid)
    # representative is first occurrence per voxel
    assert np.all(uniq < len(pts))
    np.testing.assert_array_equal(grid[uniq], vox)


# ---------------------------------------------------------------------------
# kernel maps + sparse conv vs dense conv golden
# ---------------------------------------------------------------------------

def _dense_conv3d(vol, w, offsets):
    """Dense reference: vol dict coord->feat; returns coord->out."""
    out = {}
    for c, _ in vol.items():
        acc = None
        for k, off in enumerate(offsets):
            src = tuple(np.array(c) + off)
            if src in vol:
                contrib = vol[src] @ w[k]
                acc = contrib if acc is None else acc + contrib
        out[c] = acc if acc is not None else np.zeros(w.shape[-1])
    return out


def test_sparse_conv_matches_dense(rng):
    coords = np.unique(rng.integers(0, 6, (80, 3)).astype(np.int32), axis=0)
    n = len(coords)
    cin, cout = 4, 5
    x = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1

    nbr = kernel_maps.build_neighbor_map(coords, 3)
    pad = 96
    nbr_p = kernel_maps.pad_rows(nbr, pad, -1)
    x_p = kernel_maps.pad_rows(x, pad)
    valid = kernel_maps.pad_rows(np.ones(n, bool), pad, False)
    out = sparse.sparse_conv(jnp.array(x_p), jnp.array(nbr_p), jnp.array(w),
                             out_valid=jnp.array(valid),
                             compute_dtype=jnp.float32)
    offsets = kernel_maps.kernel_offsets(3)
    vol = {tuple(c): x[i] for i, c in enumerate(coords)}
    ref = _dense_conv3d(vol, w, offsets)
    for i, c in enumerate(coords):
        np.testing.assert_allclose(np.asarray(out[i]), ref[tuple(c)],
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out[n:]), 0)
    # default bf16 compute path stays within bf16 tolerance
    out_bf = sparse.sparse_conv(jnp.array(x_p), jnp.array(nbr_p),
                                jnp.array(w), out_valid=jnp.array(valid))
    np.testing.assert_allclose(np.asarray(out_bf[:n]),
                               np.asarray(out[:n]), rtol=0.1, atol=0.05)


def test_downsample_and_child_map(rng):
    coords = np.unique(rng.integers(0, 8, (60, 3)).astype(np.int32), axis=0)
    coarse, parent, off = kernel_maps.downsample_coords(coords)
    # every fine coord reconstructs from parent + offset
    offs3 = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                     axis=-1).reshape(8, 3)
    rec = coarse[parent] * 2 + offs3[off]
    np.testing.assert_array_equal(rec, coords)
    child = kernel_maps.build_child_map(parent, off, len(coarse))
    for i in range(len(coords)):
        assert child[parent[i], off[i]] == i


def test_stride2_conv_and_transpose_roundtrip(rng):
    coords = np.unique(rng.integers(0, 8, (100, 3)).astype(np.int32), axis=0)
    n = len(coords)
    coarse, parent, off = kernel_maps.downsample_coords(coords)
    nc = len(coarse)
    child = kernel_maps.build_child_map(parent, off, nc)
    cin, cout = 3, 4
    x = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((8, cin, cout)).astype(np.float32)

    down = sparse.sparse_conv(jnp.array(x), jnp.array(child), jnp.array(w),
                              compute_dtype=jnp.float32)
    # reference: out[c] = sum over children f of x[f] @ w[off(f)]
    ref = np.zeros((nc, cout), np.float32)
    for f in range(n):
        ref[parent[f]] += x[f] @ w[off[f]]
    np.testing.assert_allclose(np.asarray(down), ref, rtol=1e-4, atol=1e-4)

    # transpose: fine[f] = coarse[parent(f)] @ w[off(f)]
    xc = rng.standard_normal((nc, cin)).astype(np.float32)
    up = sparse.sparse_conv_transpose(jnp.array(xc), jnp.array(parent),
                                      jnp.array(off), jnp.array(w),
                                      compute_dtype=jnp.float32)
    ref_up = np.stack([xc[parent[f]] @ w[off[f]] for f in range(n)])
    np.testing.assert_allclose(np.asarray(up), ref_up, rtol=1e-4, atol=1e-4)


def test_hierarchy_ancestors(rng):
    coords = np.unique(rng.integers(0, 32, (300, 3)).astype(np.int32), axis=0)
    h = kernel_maps.build_hierarchy(coords, pad_sizes=[512, 512, 512, 64, 8])
    n0 = h.num_voxels[0]
    # ancestor at level l of voxel i has coords == coords[i] // 2^l
    for l in range(kernel_maps.NUM_LEVELS):
        anc = h.ancestor[l, :n0]
        np.testing.assert_array_equal(
            h.coords[l][anc], coords // (2 ** l))


# ---------------------------------------------------------------------------
# segment pooling
# ---------------------------------------------------------------------------

def test_segment_mean(rng):
    x = rng.standard_normal((50, 6)).astype(np.float32)
    seg = rng.integers(0, 7, 50)
    seg[45:] = 7  # trash bucket (padded voxels)
    out = segment.segment_mean(jnp.array(x), jnp.array(seg), 7)
    for s in range(7):
        m = seg == s
        if m.sum():
            np.testing.assert_allclose(np.asarray(out[s]), x[m].mean(0),
                                       rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# sampling ops
# ---------------------------------------------------------------------------

def test_fps_device_matches_numpy(rng):
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    dev = np.asarray(sampling.furthest_point_sample(jnp.array(pts), 8))
    ref = sampling.fps_numpy(pts, 8)
    np.testing.assert_array_equal(dev, ref)


def test_fps_respects_valid_mask(rng):
    pts = rng.standard_normal((32, 3)).astype(np.float32)
    pts[20:] = 100.0  # far-away padding would dominate FPS if unmasked
    valid = np.arange(32) < 20
    picks = np.asarray(sampling.furthest_point_sample(
        jnp.array(pts), 6, valid=jnp.array(valid)))
    assert picks.max() < 20


def test_ball_query_first_hits(rng):
    xyz = rng.standard_normal((100, 3)).astype(np.float32)
    centers = xyz[:5]
    r, ns = 0.7, 8
    idx = np.asarray(sampling.ball_query(jnp.array(xyz), jnp.array(centers), r, ns))
    for m in range(5):
        d = np.sqrt(((xyz - centers[m]) ** 2).sum(-1))
        hits = np.nonzero(d < r)[0]
        expect = hits[:ns]
        got = idx[m]
        np.testing.assert_array_equal(got[:len(expect)], expect)
        if len(expect) < ns and len(expect) > 0:
            np.testing.assert_array_equal(got[len(expect):], expect[0])


def test_three_interpolate(rng):
    known = rng.standard_normal((20, 3)).astype(np.float32)
    unknown = rng.standard_normal((7, 3)).astype(np.float32)
    feats = rng.standard_normal((20, 5)).astype(np.float32)
    idx, w = sampling.three_interpolate_weights(jnp.array(unknown), jnp.array(known))
    out = np.asarray(sampling.three_interpolate(jnp.array(feats), idx, w))
    d = np.sqrt(((unknown[:, None] - known[None]) ** 2).sum(-1))
    for i in range(7):
        order = np.argsort(d[i])[:3]
        assert set(np.asarray(idx[i]).tolist()) == set(order.tolist())
        inv = 1 / np.maximum(d[i][order], 1e-8)
        ww = inv / inv.sum()
        ref = (feats[order] * ww[:, None]).sum(0)
        np.testing.assert_allclose(out[i], ref, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# hungarian
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(5, 5), (7, 12), (1, 4), (30, 120)])
def test_hungarian_matches_scipy(rng, shape):
    from scipy.optimize import linear_sum_assignment
    for trial in range(5):
        c = rng.standard_normal(shape).astype(np.float32) * 10
        got = np.asarray(hungarian.solve(jnp.array(c)))
        rows, cols = linear_sum_assignment(c)
        got_cost = c[np.arange(shape[0]), got].sum()
        ref_cost = c[rows, cols].sum()
        assert len(set(got.tolist())) == shape[0]  # valid assignment
        np.testing.assert_allclose(got_cost, ref_cost, rtol=1e-5, atol=1e-4)


def test_hungarian_constant_pad_rows_preserve_real_matching(rng):
    from scipy.optimize import linear_sum_assignment
    c = rng.standard_normal((4, 10)).astype(np.float32)
    padded = np.concatenate([c, np.full((3, 10), 5.0, np.float32)], axis=0)
    got = np.asarray(hungarian.solve(jnp.array(padded)))[:4]
    rows, cols = linear_sum_assignment(c)
    np.testing.assert_allclose(c[np.arange(4), got].sum(),
                               c[rows, cols].sum(), rtol=1e-5)


# ---------------------------------------------------------------------------
# pairwise locs
# ---------------------------------------------------------------------------

def test_pairwise_locs_shapes_and_values(rng):
    centers = rng.standard_normal((2, 6, 3)).astype(np.float32)
    out = np.asarray(pairwise.calc_pairwise_locs(jnp.array(centers)))
    assert out.shape == (2, 6, 6, 5)
    rel = centers[0, 1] - centers[0, 3]
    dist = np.sqrt((rel ** 2).sum() + 1e-10)
    all_d = np.sqrt(((centers[0][:, None] - centers[0][None]) ** 2).sum(-1) + 1e-10)
    np.testing.assert_allclose(out[0, 1, 3, 0], dist / all_d.max(), rtol=1e-5)
    np.testing.assert_allclose(out[0, 1, 3, 1], rel[2] / dist, rtol=1e-4)


def test_batched_sampling_matches_vmapped():
    """Flat-batched FPS / ball query / grouping == vmapped single-cloud."""
    import jax
    import jax.numpy as jnp
    from pq3d_tpu.ops import sampling
    rng = np.random.default_rng(11)
    xyz = jnp.asarray(rng.standard_normal((3, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((3, 64, 5)), jnp.float32)

    ref_idx = jax.vmap(lambda p: sampling.furthest_point_sample(p, 8))(xyz)
    got_idx = sampling.furthest_point_sample_batched(xyz, 8)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))

    centers = sampling.gather_centers_batched(xyz, got_idx)
    np.testing.assert_allclose(
        np.asarray(centers),
        np.asarray(jnp.take_along_axis(xyz, ref_idx[..., None], axis=1)))

    ref_bq = jax.vmap(lambda p, c: sampling.ball_query(p, c, 0.7, 6))(
        xyz, centers)
    got_bq = sampling.ball_query_batched(xyz, centers, 0.7, 6)
    np.testing.assert_array_equal(np.asarray(got_bq), np.asarray(ref_bq))

    ref_g = jax.vmap(lambda p, c, f: sampling.query_and_group(
        p, c, f, 0.7, 6))(xyz, centers, feats)
    got_g = sampling.query_and_group_batched(xyz, centers, feats, 0.7, 6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=1e-6, atol=1e-6)


def test_ball_query_impls_equivalent():
    """All four ball-query formulations (PQ3D_BALLQUERY switch) are exactly
    equivalent, single-cloud and batched, including no-hit rows."""
    rng = np.random.default_rng(11)
    xyz = jnp.asarray(rng.random((2, 90, 3)), jnp.float32)
    # a far-away center exercises the zero-fill path
    centers = jnp.concatenate(
        [jnp.asarray(rng.random((2, 15, 3)), jnp.float32),
         jnp.full((2, 1, 3), 50.0)], axis=1)
    prev = sampling._BQ_IMPL
    try:
        sampling.set_ball_query_impl("topk")
        ref_b = np.asarray(sampling.ball_query_batched(xyz, centers, 0.3, 7))
        ref_s = np.asarray(sampling.ball_query(xyz[0], centers[0], 0.3, 7))
        for name in ("sort", "onehot", "scatter"):
            sampling.set_ball_query_impl(name)
            np.testing.assert_array_equal(
                np.asarray(sampling.ball_query_batched(xyz, centers, 0.3, 7)),
                ref_b, err_msg=name)
            np.testing.assert_array_equal(
                np.asarray(sampling.ball_query(xyz[0], centers[0], 0.3, 7)),
                ref_s, err_msg=name)
    finally:
        sampling._BQ_IMPL = prev
    import pytest
    with pytest.raises(ValueError):
        sampling.set_ball_query_impl("nope")
