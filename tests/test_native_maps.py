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
