"""Native C++ kernel-map builder must match the numpy reference exactly
(same neighbor indices, same coarse ordering, same parent/offset duals)."""
import numpy as np
import pytest

from pq3d_tpu.ops import kernel_maps as km


@pytest.fixture()
def coords():
    rng = np.random.default_rng(3)
    return np.unique(rng.integers(-20, 60, (4000, 3)).astype(np.int32),
                     axis=0)


def _force_numpy(monkeypatch):
    import pq3d_tpu.ops._native as nat
    monkeypatch.setattr(nat, "_LIB", None)
    monkeypatch.setattr(nat, "_TRIED", True)


def test_native_available():
    from pq3d_tpu.ops._native import lib
    assert lib() is not None, "g++ is in the image; native build must work"


def test_neighbor_map_parity(coords, monkeypatch):
    nat = km.build_neighbor_map(coords, 3)
    nat5 = km.build_neighbor_map(coords, 5, n_pad=len(coords) + 64)
    _force_numpy(monkeypatch)
    ref = km.build_neighbor_map(coords, 3)
    ref5 = km.build_neighbor_map(coords, 5, n_pad=len(coords) + 64)
    np.testing.assert_array_equal(nat, ref)
    np.testing.assert_array_equal(nat5, ref5)
    assert (nat5[len(coords):] == -1).all()


def test_downsample_parity(coords, monkeypatch):
    cn, pn, on = km.downsample_coords(coords)
    _force_numpy(monkeypatch)
    cr, pr, orf = km.downsample_coords(coords)
    np.testing.assert_array_equal(cn, cr)
    np.testing.assert_array_equal(pn, pr)
    np.testing.assert_array_equal(on, orf)
    # dual invariant: coarse[parent]*2 + offset == coords
    offs = km.kernel_offsets(2)
    np.testing.assert_array_equal(cn[pn] * 2 + offs[on], coords)


def test_hierarchy_parity(coords, monkeypatch):
    import jax
    h_nat = km.build_hierarchy(coords, bucket=1024)
    _force_numpy(monkeypatch)
    h_ref = km.build_hierarchy(coords, bucket=1024)
    for a, b in zip(jax.tree.leaves(h_nat.device_arrays()),
                    jax.tree.leaves(h_ref.device_arrays())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sorted_merge_fuzz(monkeypatch):
    """The sorted-key two-pointer fast path must equal the hash path across
    its edge cases: tile boundaries (>2048 rows), tiny n, even kernels,
    unsorted input (falls back to the hash), and coords spanning negatives."""
    rng = np.random.default_rng(11)
    import pq3d_tpu.ops._native as nat
    assert nat.lib() is not None
    for n, lo, hi, ksz in [(1, -5, 5, 3), (7, -2, 2, 3), (3000, -40, 40, 3),
                           (5000, -15, 15, 5), (4096, 0, 25, 2),
                           (2500, -1000, 1000, 3)]:
        pts = np.unique(rng.integers(lo, hi, (n, 3)).astype(np.int32), axis=0)
        key = ((pts[:, 0].astype(np.int64) << 42)
               + (pts[:, 1].astype(np.int64) << 21) + pts[:, 2])
        srt = pts[np.argsort(key)]
        shuf = srt[rng.permutation(len(srt))]
        for coords in (srt, shuf):
            got = km.build_neighbor_map(coords, ksz)
            table = km.CoordTable(coords, margin=max(3, ksz))
            ref = table.lookup_offsets(coords, km.kernel_offsets(ksz))
            np.testing.assert_array_equal(got, ref,
                                          err_msg=f"n={n} k={ksz}")


def test_native_fps_parity(monkeypatch):
    """Native FPS must pick exactly the numpy loop's indices (same f32
    distance math, same first-max tie-breaking)."""
    from pq3d_tpu.ops import sampling
    rng = np.random.default_rng(7)
    for n, m, start in [(1, 1, 0), (50, 8, 3), (3000, 64, 0), (500, 500, 1)]:
        pts = rng.standard_normal((n, 3)).astype(np.float32)
        nat = sampling.fps_numpy(pts, m, start=start)
        _force_numpy(monkeypatch)
        ref = sampling.fps_numpy(pts, m, start=start)
        monkeypatch.undo()
        np.testing.assert_array_equal(nat, ref, err_msg=f"n={n} m={m}")


def test_negative_coords(monkeypatch):
    rng = np.random.default_rng(5)
    coords = np.unique(rng.integers(-300, -100, (800, 3)).astype(np.int32),
                       axis=0)
    cn, pn, on = km.downsample_coords(coords)
    nat = km.build_neighbor_map(coords, 3)
    _force_numpy(monkeypatch)
    cr, pr, orf = km.downsample_coords(coords)
    ref = km.build_neighbor_map(coords, 3)
    np.testing.assert_array_equal(cn, cr)
    np.testing.assert_array_equal(pn, pr)
    np.testing.assert_array_equal(on, orf)
    np.testing.assert_array_equal(nat, ref)
