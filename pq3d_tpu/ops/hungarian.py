"""On-device linear sum assignment (Jonker-Volgenant style).

The reference's Hungarian matcher synchronizes to the CPU every step to call
``scipy.optimize.linear_sum_assignment`` (reference:
modules/third_party/mask3d/matcher.py:182-184) — a device->host round trip per
batch.  Cost matrices here are small (<=128 targets x 120 queries), so we run
the exact shortest-augmenting-path algorithm *on device* with
``lax.while_loop``s, keeping the train step fully asynchronous.

Padded (dummy) rows must be given a constant cost across all columns: a
constant row is indifferent to its column, so the optimal assignment of the
real rows is preserved (same trick the reference uses for ignore-label
targets, matcher.py:120-127).

``solve(cost)`` with cost (R, N), R <= N, minimizes; returns ``col4row`` (R,)
— the assigned column for every row.  Exact (matches scipy).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


@partial(jax.jit, static_argnames=())
def solve(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LSA for one (R, N) cost matrix, R <= N. Returns col4row (R,)."""
    cost = cost.astype(jnp.float32)
    r, n = cost.shape
    assert r <= n, "solve expects rows <= cols (transpose the cost)"

    u0 = jnp.zeros((r,), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    col4row0 = jnp.full((r,), -1, jnp.int32)
    row4col0 = jnp.full((n,), -1, jnp.int32)

    def augment_row(carry, cur_row):
        u, v, col4row, row4col = carry

        # --- Dijkstra over columns -------------------------------------
        min_val = jnp.full((n,), _INF)
        scanned_cols = jnp.zeros((n,), bool)
        path = jnp.full((n,), -1, jnp.int32)

        def dj_cond(state):
            _, _, _, _, sink, _ = state
            return sink < 0

        def dj_body(state):
            i, lowest, min_val, scanned_cols, sink, path = state
            red = lowest + cost[i] - u[i] - v  # reduced path costs via row i
            better = (red < min_val) & (~scanned_cols)
            min_val = jnp.where(better, red, min_val)
            path = jnp.where(better, i, path)
            masked = jnp.where(scanned_cols, _INF, min_val)
            j = jnp.argmin(masked).astype(jnp.int32)
            lowest = masked[j]
            scanned_cols = scanned_cols.at[j].set(True)
            nxt_row = row4col[j]
            sink = jnp.where(nxt_row < 0, j, -1)
            return (jnp.maximum(nxt_row, 0), lowest, min_val, scanned_cols,
                    sink, path)

        init = (cur_row, jnp.float32(0.0), min_val, scanned_cols,
                jnp.int32(-1), path)
        _, lowest, min_val, scanned_cols, sink, path = jax.lax.while_loop(
            dj_cond, dj_body, init)

        # --- dual update -------------------------------------------------
        u = u.at[cur_row].add(lowest)
        # rows on scanned alternating tree: those assigned to scanned cols
        on_tree_rows = jnp.where(scanned_cols, row4col, -1)
        row_delta = jnp.zeros((r,), jnp.float32)
        # delta for row i (assigned to col j, j scanned, i != cur_row):
        #   lowest - min_val[j]
        deltas = jnp.where(scanned_cols & (row4col >= 0),
                           lowest - min_val, 0.0)
        row_delta = row_delta.at[jnp.maximum(on_tree_rows, 0)].add(
            jnp.where(on_tree_rows >= 0, deltas, 0.0))
        u = u + row_delta
        v = jnp.where(scanned_cols, v - (lowest - min_val), v)

        # --- augment along the alternating path --------------------------
        def aug_cond(state):
            done, _, _, _ = state
            return ~done

        def aug_body(state):
            done, sink, col4row, row4col = state
            i = path[sink]
            row4col = row4col.at[sink].set(i)
            prev = col4row[i]
            col4row = col4row.at[i].set(sink)
            done = i == cur_row
            sink = jnp.where(done, sink, prev)
            return done, sink, col4row, row4col

        _, _, col4row, row4col = jax.lax.while_loop(
            aug_cond, aug_body, (jnp.bool_(False), sink, col4row, row4col))
        return (u, v, col4row, row4col), None

    (_, _, col4row, _), _ = jax.lax.scan(
        augment_row, (u0, v0, col4row0, row4col0),
        jnp.arange(r, dtype=jnp.int32))
    return col4row


def solve_batch(cost: jnp.ndarray) -> jnp.ndarray:
    """vmapped exact LSA: (B, R, N) -> (B, R)."""
    return jax.vmap(solve)(cost)


def solve_scipy_callback(cost: jnp.ndarray) -> jnp.ndarray:
    """Host-callback fallback using scipy (breaks async dispatch; for debug).
    (B, R, N) -> (B, R)."""
    import numpy as np

    def host(c):
        from scipy.optimize import linear_sum_assignment
        out = np.zeros(c.shape[:2], dtype=np.int32)
        for b in range(c.shape[0]):
            rows, cols = linear_sum_assignment(c[b])
            out[b, rows] = cols
        return out

    return jax.pure_callback(
        host, jax.ShapeDtypeStruct(cost.shape[:2], jnp.int32), cost,
        vmap_method="sequential")
