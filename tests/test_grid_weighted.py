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


def test_weighted_grid_gradients_match_dense_oracle():
    """Adjoint gradients through the MG-CG solve (custom VJP — CG's
    while_loop has no reverse rule): d sum(w·x)/d(gx, gy, b) must match
    autodiff through a dense solve of the same regularized operator, and
    dR_eq/dg_edge must match finite differences."""
    from nodal_tpu.ops.grid_weighted import (weighted_equivalent_resistance,
                                             weighted_laplacian_matvec)

    h, w = 6, 8
    rng = np.random.default_rng(0)
    gx = jnp.asarray(rng.uniform(0.5, 2.0, (h, w - 1)))
    gy = jnp.asarray(rng.uniform(0.5, 2.0, (h - 1, w)))
    b = jnp.zeros((h, w)).at[0, 0].add(1.0).at[h - 1, w - 1].add(-1.0)

    def dense_x(gx_, gy_, b_):
        n = h * w

        def mv(v):
            return (weighted_laplacian_matvec(v.reshape(h, w), gx_, gy_)
                    .reshape(-1) + jnp.sum(v) / n)

        A = jax.vmap(mv)(jnp.eye(n)).T
        return jnp.linalg.solve(
            A, (b_ - jnp.mean(b_)).reshape(-1)).reshape(h, w)

    wt = jnp.asarray(rng.standard_normal((h, w)))
    f = lambda gx_, gy_, b_: jnp.sum(  # noqa: E731
        wt * weighted_grid_solve(gx_, gy_, b_, tol=1e-12)[0])
    fo = lambda gx_, gy_, b_: jnp.sum(wt * dense_x(gx_, gy_, b_))  # noqa
    g = jax.grad(f, argnums=(0, 1, 2))(gx, gy, b)
    go = jax.grad(fo, argnums=(0, 1, 2))(gx, gy, b)
    for a, o in zip(g, go):
        rel = float(jnp.max(jnp.abs(a - o)) / jnp.max(jnp.abs(o)))
        assert rel < 1e-8, rel

    # dR_eq/dg on every edge from one extra solve; FD spot check.
    term = ((0, 0), (h - 1, w - 1))
    R0, _ = weighted_equivalent_resistance(h, w, gx, gy, *term)
    dR = jax.grad(
        lambda gx_: weighted_equivalent_resistance(h, w, gx_, gy, *term)[0]
    )(gx)
    eps = 1e-6
    R1, _ = weighted_equivalent_resistance(
        h, w, gx.at[2, 3].add(eps), gy, *term)
    fd = (float(R1) - float(R0)) / eps
    assert abs(float(dR[2, 3]) - fd) < 1e-5
