"""Weighted-grid solver: matrix-free per-edge-conductance path must match
the netlist path, and batching via vmap must match per-sample solves."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nodal_tpu import Netlist
from nodal_tpu.equiv import equivalent_resistance
from nodal_tpu.ops.grid_weighted import (
    make_weighted_preconditioner,
    weighted_equivalent_resistance,
    weighted_grid_solve,
    weighted_laplacian_matvec,
)
from nodal_tpu.utils.gridgen import weighted_grid_rows


def _random_weights(h, w, seed=0):
    rng = np.random.default_rng(seed)
    gx = rng.uniform(0.2, 5.0, (h, w - 1))
    gy = rng.uniform(0.2, 5.0, (h - 1, w))
    return gx, gy


def _dense_weighted_laplacian(gx, gy):
    h, w = gx.shape[0], gy.shape[1]
    n = h * w
    L = np.zeros((n, n))
    for i in range(h):
        for j in range(w - 1):
            a, b = i * w + j, i * w + j + 1
            g = gx[i, j]
            L[a, a] += g; L[b, b] += g; L[a, b] -= g; L[b, a] -= g
    for i in range(h - 1):
        for j in range(w):
            a, b = i * w + j, (i + 1) * w + j
            g = gy[i, j]
            L[a, a] += g; L[b, b] += g; L[a, b] -= g; L[b, a] -= g
    return L


def test_weighted_matvec_matches_dense():
    h, w = 5, 6
    gx, gy = _random_weights(h, w)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((h, w))
    L = _dense_weighted_laplacian(gx, gy)
    expected = (L @ x.reshape(-1)).reshape(h, w)
    got = weighted_laplacian_matvec(
        jnp.asarray(x), jnp.asarray(gx), jnp.asarray(gy)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12)


@pytest.mark.parametrize("h,w,a,b", [(4, 4, (0, 0), (3, 3)),
                                     (6, 8, (1, 1), (4, 6))])
def test_weighted_matches_netlist_path(h, w, a, b):
    gx, gy = _random_weights(h, w, seed=h * w)
    netlist = Netlist.from_rows(weighted_grid_rows(gx, gy, a, b))
    r_netlist = equivalent_resistance(netlist, "1", "g")
    r_grid, res = weighted_equivalent_resistance(
        h, w, jnp.asarray(gx, jnp.float64), jnp.asarray(gy, jnp.float64),
        a, b, tol=1e-11,
    )
    np.testing.assert_allclose(float(r_grid), r_netlist, rtol=1e-8)


def test_weighted_mg_converges_fast():
    h = w = 64
    gx, gy = _random_weights(h, w, seed=3)
    rhs = np.zeros((h, w))
    rhs[10, 10], rhs[50, 40] = 1.0, -1.0
    x, info = weighted_grid_solve(
        jnp.asarray(gx, jnp.float64), jnp.asarray(gy, jnp.float64),
        jnp.asarray(rhs, jnp.float64), tol=1e-10,
    )
    assert bool(info.converged)
    # Rough-coefficient MG is weaker than uniform; still far below plain CG
    # (which needs O(h * sqrt(contrast)) iterations here).
    assert int(info.iterations) < 120, int(info.iterations)


def test_weighted_batched_sweep_matches_single():
    # vmap over conductance fields: Monte Carlo on a resistor fabric.
    h = w = 16
    B = 4
    rng = np.random.default_rng(7)
    gxs = rng.uniform(0.5, 2.0, (B, h, w - 1)).astype(np.float32)
    gys = rng.uniform(0.5, 2.0, (B, h - 1, w)).astype(np.float32)
    a, b = (2, 2), (13, 13)

    batched = jax.jit(jax.vmap(
        lambda gx, gy: weighted_equivalent_resistance(h, w, gx, gy, a, b,
                                                      tol=1e-6)[0]
    ))
    rs = np.asarray(batched(jnp.asarray(gxs), jnp.asarray(gys)))
    for i in range(B):
        r_i, _ = weighted_equivalent_resistance(
            h, w, jnp.asarray(gxs[i]), jnp.asarray(gys[i]), a, b, tol=1e-6
        )
        np.testing.assert_allclose(rs[i], float(r_i), rtol=1e-4)
