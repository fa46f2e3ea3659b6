"""Windowed pallas z-run conv (ops/pallas_zt): plan + numerics.

The kernel itself runs in interpreter mode on the CPU suite (slow tier);
chip timing lives in tools/bench_pallas_zt.py (chip_runs/0819d).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pq3d_tpu.ops import kernel_maps, sparse
from pq3d_tpu.ops.pallas_zt import (build_pallas_zt_plan, device_zt_plan,
                                    pallas_zt_conv, pallas_zt_conv_sym,
                                    pallas_zt_applicable)


def _scene(rng, extent=28, n_pts=4000, align=128):
    coords = np.unique(rng.integers(0, extent, (n_pts, 3)).astype(np.int32),
                       axis=0)
    key = (coords[:, 0].astype(np.int64) * 4096
           + coords[:, 1]) * 4096 + coords[:, 2]
    coords = coords[np.argsort(key)]
    n = len(coords)
    n_pad = -(-n // align) * align
    nbr = kernel_maps.build_neighbor_map(coords, 3, n_pad=n_pad)
    valid = np.arange(n_pad) < n
    return coords, nbr, valid


def _run(rng, nbr, valid, plan, cin, cout, tile, window, sym=False):
    n_pad = nbr.shape[0]
    x = np.zeros((n_pad, cin), np.float32)
    x[valid] = rng.standard_normal((valid.sum(), cin))
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1
    xj = jnp.asarray(x, jnp.bfloat16)
    wj = jnp.asarray(w)
    vj = jnp.asarray(valid)
    ref = sparse.sparse_conv(xj, jnp.asarray(nbr), wj, None, vj)
    dev = {k: jnp.asarray(v) for k, v in plan.items()
           if isinstance(v, np.ndarray)}
    if sym:
        got = pallas_zt_conv_sym(
            xj, wj, dev, vj, tile=tile, window=window, interpret=True)
    else:
        got = pallas_zt_conv(
            xj, wj, dev["win_lo"], dev["base_local"], dev["msel"],
            dev["exc_base"], dev["exc_out"], dev["exc_msel"], vj,
            tile=tile, window=window, interpret=True)
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    return float(np.abs(r - g).max() / (np.abs(r).max() + 1e-6))


def test_plan_structure(rng):
    _, nbr, valid = _scene(rng)
    plan = build_pallas_zt_plan(nbr, tile=128, window=384)
    n = nbr.shape[0]
    assert plan["win_lo"].shape == (n // 128 * 9,)
    assert (plan["win_lo"] % 8 == 0).all()
    assert plan["base_local"].shape == (n, 16)
    assert plan["msel"].shape == (n, 64)
    # every row is either in-window (base_local < window-2) or excepted
    zbase, zcode = kernel_maps.build_ztriple_plan(nbr, n)
    has = (zcode != -2).any(2)
    inw = plan["base_local"][:, :9] < (1 << 24)
    exc = set()
    for c in range(9):
        for o in plan["exc_out"][c]:
            if o >= 0:
                exc.add((int(o), c))
    for j, c in zip(*np.nonzero(has)):
        assert inw[j, c] or (int(j), int(c)) in exc
    assert len(exc) == plan["n_exceptions"]


def _exception_forcing_window(nbr, tile):
    """Window derived from the scene's measured per-tile run-base spread,
    guaranteed to leave at least one (row, column) out-of-window so the
    exception-compaction path is actually exercised (a magic constant here
    once rotted into a zero-exception fixture)."""
    n = nbr.shape[0]
    zbase, zcode = kernel_maps.build_ztriple_plan(nbr, n)
    has = (zcode != -2).any(2)
    bt = zbase.reshape(-1, tile, 9)
    ht = has.reshape(-1, tile, 9)
    lo = np.where(ht, bt, np.int64(1 << 62)).min(1)
    spread = np.where(ht, bt - lo[:, None], 0).max()
    # the plan 8-aligns lo DOWN (adds <= 7 to every rel), so any window
    # strictly below the max spread leaves the max-rel row excepted
    window = max(16, (int(spread) - 8) & ~7)
    assert window < spread, (window, spread)
    return window


def test_device_plan_matches_host(rng):
    _, nbr, _ = _scene(rng, extent=48, n_pts=6000)
    # narrow window forces exceptions through the device compaction
    window = _exception_forcing_window(nbr, tile=128)
    host = build_pallas_zt_plan(nbr, tile=128, window=window)
    dev = jax.jit(lambda nb: device_zt_plan(nb, 128, window, exc_cap=1024))(
        jnp.asarray(nbr))
    # device exc arrays are capped at exc_cap per column: the comparison
    # below is only exact when the host plan fits (it does — the window sits
    # just under the max spread, so only the spread tail is excepted)
    assert 0 < host["n_exceptions"] <= 1024, host["n_exceptions"]
    for k in ("win_lo", "base_local", "msel"):
        assert (np.asarray(host[k]) == np.asarray(dev[k])).all(), k
    for c in range(9):
        hset = sorted((int(o), int(b)) for o, b in
                      zip(host["exc_out"][c], host["exc_base"][c]) if o >= 0)
        dset = sorted((int(o), int(b)) for o, b in
                      zip(np.asarray(dev["exc_out"])[c],
                          np.asarray(dev["exc_base"])[c]) if o >= 0)
        assert hset == dset, c
    assert int(dev["exc_dropped"]) == 0
    assert host["n_exceptions"] > 0  # the point of this configuration


def test_applicable_predicate():
    on = pallas_zt_applicable
    # chip-measured win shapes (backend-gated: only asserts the negatives
    # that hold everywhere)
    assert not on(245760, 32, 32)     # ztriple territory
    assert not on(16384, 128, 128)    # small N: ztriple
    assert not on(245761, 96, 96)     # not tile-aligned
    assert not on(8192, 256, 256)     # tap_unroll territory


@pytest.mark.slow
def test_conv_matches_gather_interpret(rng, monkeypatch):
    _, nbr, valid = _scene(rng)
    plan = build_pallas_zt_plan(nbr, tile=128, window=384)
    err = _run(rng, nbr, valid, plan, cin=32, cout=48, tile=128, window=384)
    assert err < 2e-2, err


@pytest.mark.slow
def test_conv_exceptions_interpret(rng):
    _, nbr, valid = _scene(rng, extent=48, n_pts=3000, align=64)
    plan = build_pallas_zt_plan(nbr, tile=64, window=80)
    assert plan["n_exceptions"] > 0
    err = _run(rng, nbr, valid, plan, cin=16, cout=24, tile=64, window=80)
    assert err < 2e-2, err


@pytest.mark.slow
def test_sym_vjp_matches_gather_grads(rng):
    _, nbr, valid = _scene(rng, extent=20, n_pts=1500, align=64)
    plan = build_pallas_zt_plan(nbr, tile=64, window=104)
    dev = {k: jnp.asarray(v) for k, v in plan.items()
           if isinstance(v, np.ndarray)}
    n_pad = nbr.shape[0]
    cin = cout = 16
    x = np.zeros((n_pad, cin), np.float32)
    x[valid] = rng.standard_normal((valid.sum(), cin))
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1
    vj = jnp.asarray(valid)
    nbr_j = jnp.asarray(nbr)
    cot = jnp.asarray(
        rng.standard_normal((n_pad, cout)).astype(np.float32))

    def loss_ref(x, w):
        y = sparse.sparse_conv(x, nbr_j, w, None, vj,
                               compute_dtype=jnp.float32)
        return jnp.sum(y * cot)

    def loss_zt(x, w):
        y = pallas_zt_conv_sym(x, w, dev, vj, tile=64, window=104,
                               interpret=True)
        return jnp.sum(y * cot)

    gr = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gz = jax.grad(loss_zt, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    for a, b in zip(gr, gz):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert err < 3e-2, err
