"""Sparse conv layout equivalences: 2D flat vs 3D batched vs flatten_maps."""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.ops import kernel_maps, sparse
from pq3d_tpu.models.sparse_unet import flatten_maps


def _scene(rng, lo=0, hi=6, n=60):
    coords = np.unique(rng.integers(lo, hi, (n, 3)).astype(np.int32), axis=0)
    return coords


def test_batched_conv_matches_per_scene(rng):
    cin, cout, pad = 4, 5, 96
    xs, nbrs = [], []
    for b in range(3):
        coords = _scene(rng)
        nbr = kernel_maps.build_neighbor_map(coords, 3)
        x = rng.standard_normal((len(coords), cin)).astype(np.float32)
        xs.append(kernel_maps.pad_rows(x, pad))
        nbrs.append(kernel_maps.pad_rows(nbr, pad, -1))
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1
    x3 = jnp.asarray(np.stack(xs))
    n3 = jnp.asarray(np.stack(nbrs))
    wj = jnp.asarray(w)
    batched = sparse.sparse_conv(x3, n3, wj, compute_dtype=jnp.float32)
    for b in range(3):
        single = sparse.sparse_conv(x3[b], n3[b], wj,
                                    compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(batched[b]),
                                   np.asarray(single), rtol=1e-5, atol=1e-5)


def test_flatten_maps_roundtrip(rng):
    pads = [128, 64, 32, 16, 8]
    hs = []
    for b in range(2):
        coords = _scene(rng, 0, 8, 80)
        hs.append(kernel_maps.build_hierarchy(coords, pad_sizes=pads))
    maps = {k: jnp.asarray(np.stack([h.device_arrays()[k] for h in hs]))
            for k in hs[0].device_arrays()}
    fm = flatten_maps(maps)
    # flat nbr indices either -1 or point into the right scene slab
    nbr = np.asarray(fm["nbr3_0"]).reshape(2, pads[0], 27)
    for b in range(2):
        valid = nbr[b] >= 0
        assert (nbr[b][valid] >= b * pads[0]).all()
        assert (nbr[b][valid] < (b + 1) * pads[0]).all()
        # local part matches the per-scene map
        np.testing.assert_array_equal(
            np.where(valid, nbr[b] - b * pads[0], -1),
            np.asarray(maps["nbr3_0"][b]))
    # ancestors resolve to the right coarse slab
    anc1 = np.asarray(fm["ancestor_1"]).reshape(2, pads[0])
    for b in range(2):
        n0 = hs[b].num_voxels[0]
        assert (anc1[b][:n0] >= b * pads[1]).all()
        assert (anc1[b][:n0] < (b + 1) * pads[1]).all()


def test_conv_transpose_batched(rng):
    cin, cout = 3, 4
    coords = _scene(rng, 0, 8, 100)
    coarse, parent, off = kernel_maps.downsample_coords(coords)
    pad_f, pad_c = 128, 64
    parent_p = kernel_maps.pad_rows(parent.astype(np.int32), pad_f, -1)
    off_p = kernel_maps.pad_rows(off, pad_f, 0)
    xc = rng.standard_normal((len(coarse), cin)).astype(np.float32)
    xc_p = kernel_maps.pad_rows(xc, pad_c)
    w = rng.standard_normal((8, cin, cout)).astype(np.float32)
    x3 = jnp.asarray(np.stack([xc_p, xc_p * 2]))
    p3 = jnp.asarray(np.stack([parent_p, parent_p]))
    o3 = jnp.asarray(np.stack([off_p, off_p]))
    out = sparse.sparse_conv_transpose(x3, p3, o3, jnp.asarray(w),
                                       compute_dtype=jnp.float32)
    single = sparse.sparse_conv_transpose(jnp.asarray(xc_p),
                                          jnp.asarray(parent_p),
                                          jnp.asarray(off_p), jnp.asarray(w),
                                          compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), 2 * np.asarray(single),
                               rtol=1e-4, atol=1e-4)


def test_counts_matmul_pooling_matches_broadcast(rng):
    """SegVoxelEncoder's counts@feat pooling == broadcast-to-L0 + scatter
    mean (the reference formulation it replaced)."""
    from pq3d_tpu.data import synthetic
    from pq3d_tpu.data.instseg_pipeline import (InstSegPipelineConfig,
                                                make_batch)
    from pq3d_tpu.models.sparse_unet import flatten_maps
    from pq3d_tpu.ops import segment
    from pq3d_tpu.ops.sparse import pool_transpose

    nprng = np.random.default_rng(5)
    cfg = InstSegPipelineConfig(voxel_size=0.12, num_queries=8,
                                max_segments=32, max_instances=8,
                                voxel_bucket=512, use_aug=False)
    scenes = [synthetic.make_scene(nprng, n_points=900, n_instances=3,
                                   n_segments=12) for _ in range(2)]
    batch = make_batch(scenes, cfg, nprng, train=False)
    maps = {k: jnp.asarray(v) for k, v in batch["maps"].items()}
    fm = flatten_maps(maps)
    b, p0 = maps["valid_0"].shape
    S = cfg.max_segments
    v2s = jnp.asarray(batch["voxel2segment"]).reshape(-1)
    scene = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p0)
    flat_seg = jnp.where(v2s < S, scene * S + v2s, b * S)
    n_s = jnp.maximum(segment.segment_sum(
        jnp.ones((b * p0,)), flat_seg, b * S), 1.0).reshape(b, S, 1)

    for lvl in (1, 2, 3, 4):
        p_l = maps[f"valid_{lvl}"].shape[1]
        c = 7
        feat = jnp.asarray(nprng.standard_normal((b * p_l, c)), jnp.float32)

        # reference: broadcast to level-0, zero invalid, scatter-mean
        anc = fm[f"ancestor_{lvl}"]
        bc = pool_transpose(feat, jnp.maximum(anc, 0))
        bc = jnp.where(fm["valid_0"][:, None], bc, 0)
        ref = segment.segment_mean(bc, flat_seg, b * S).reshape(b, S, c)

        # counts matmul
        s1 = S + 1
        sl = jnp.minimum(v2s, S)
        key = jnp.maximum(anc, 0) * s1 + sl
        counts = segment.segment_sum(jnp.ones((b * p0,)), key,
                                     b * p_l * s1)
        counts = counts.reshape(b, p_l, s1)[:, :, :S]
        got = jnp.einsum("bjs,bjc->bsc", counts, feat.reshape(b, p_l, c),
                         preferred_element_type=jnp.float32) / n_s
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
