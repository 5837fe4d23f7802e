"""Weighted 3-D lattice solver: the matrix-free per-edge-conductance path
must match the netlist path, the Galerkin coarsening must be exact, and
batching/gradients must match per-sample and dense oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nodal_tpu import Netlist
from nodal_tpu.equiv import equivalent_resistance
from nodal_tpu.ops.grid_weighted3 import (
    _coarsen_weights3,
    make_weighted_preconditioner_3d,
    weighted_equivalent_resistance_3d,
    weighted_laplacian_matvec_3d,
    weighted_lattice_solve,
)
from nodal_tpu.utils.gridgen import weighted_lattice_rows


def _random_weights(d, h, w, seed=0, lo=0.2, hi=5.0):
    rng = np.random.default_rng(seed)
    gx = rng.uniform(lo, hi, (d, h, w - 1))
    gy = rng.uniform(lo, hi, (d, h - 1, w))
    gz = rng.uniform(lo, hi, (d - 1, h, w))
    return gx, gy, gz


def _dense_weighted_laplacian(gx, gy, gz):
    d, h, w = gy.shape[0], gx.shape[1], gy.shape[2]
    n = d * h * w
    idx = lambda k, i, j: (k * h + i) * w + j  # noqa: E731
    L = np.zeros((n, n))

    def add(a, b, g):
        L[a, a] += g
        L[b, b] += g
        L[a, b] -= g
        L[b, a] -= g

    for k in range(d):
        for i in range(h):
            for j in range(w - 1):
                add(idx(k, i, j), idx(k, i, j + 1), gx[k, i, j])
    for k in range(d):
        for i in range(h - 1):
            for j in range(w):
                add(idx(k, i, j), idx(k, i + 1, j), gy[k, i, j])
    for k in range(d - 1):
        for i in range(h):
            for j in range(w):
                add(idx(k, i, j), idx(k + 1, i, j), gz[k, i, j])
    return L


def test_matvec_matches_dense():
    d, h, w = 3, 4, 5
    gx, gy, gz = _random_weights(d, h, w)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((d, h, w))
    L = _dense_weighted_laplacian(gx, gy, gz)
    expected = (L @ x.reshape(-1)).reshape(d, h, w)
    got = weighted_laplacian_matvec_3d(
        jnp.asarray(x), jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gz)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12)


def test_galerkin_coarsening_is_exact():
    """The coarse weighted lattice equals P^T L P for 2x2x2 replication
    prolongation — the property the preconditioner's exactness rests on."""
    d, h, w = 4, 4, 6
    gx, gy, gz = _random_weights(d, h, w, seed=2)
    L = _dense_weighted_laplacian(gx, gy, gz)
    dc, hc, wc = d // 2, h // 2, w // 2
    P = np.zeros((d * h * w, dc * hc * wc))
    for k in range(d):
        for i in range(h):
            for j in range(w):
                P[(k * h + i) * w + j,
                  ((k // 2) * hc + i // 2) * wc + j // 2] = 1.0
    gxc, gyc, gzc = _coarsen_weights3(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gz)
    )
    Lc = _dense_weighted_laplacian(
        np.asarray(gxc), np.asarray(gyc), np.asarray(gzc)
    )
    np.testing.assert_allclose(Lc, P.T @ L @ P, atol=1e-12)


def test_solve_matches_dense_f64():
    d, h, w = 4, 6, 5  # odd w: coarsening stops immediately (still exact)
    gx, gy, gz = _random_weights(d, h, w, seed=3)
    rng = np.random.default_rng(4)
    b = rng.standard_normal((d, h, w))
    b -= b.mean()
    x, info = weighted_lattice_solve(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(gz), jnp.asarray(b),
        tol=1e-12,
    )
    assert bool(info.converged)
    L = _dense_weighted_laplacian(gx, gy, gz)
    n = d * h * w
    xe = np.linalg.solve(L + np.ones((n, n)) / n, b.reshape(-1))
    np.testing.assert_allclose(
        np.asarray(x).reshape(-1), xe, atol=1e-9 * np.abs(xe).max()
    )


@pytest.mark.parametrize("dims,a,b", [
    ((4, 4, 4), (0, 0, 0), (3, 3, 3)),
    ((2, 6, 8), (0, 1, 1), (1, 4, 6)),
])
def test_matches_netlist_path(dims, a, b):
    d, h, w = dims
    gx, gy, gz = _random_weights(d, h, w, seed=d * h * w)
    netlist = Netlist.from_rows(weighted_lattice_rows(gx, gy, gz, a, b))
    r_netlist = equivalent_resistance(netlist, "1", "g")
    r_lat, res = weighted_equivalent_resistance_3d(
        d, h, w, jnp.asarray(gx, jnp.float64), jnp.asarray(gy, jnp.float64),
        jnp.asarray(gz, jnp.float64), a, b, tol=1e-11,
    )
    np.testing.assert_allclose(float(r_lat), r_netlist, rtol=1e-8)


def test_mg_converges_fast_on_bench_lattice():
    """The 16x16x12 lattice of the wide-band benchmark: MG-CG needs a
    handful of iterations where the direct tier pays the a*b bandwidth."""
    d, h, w = 12, 16, 16
    gx, gy, gz = _random_weights(d, h, w, seed=5, lo=0.5, hi=2.0)
    rhs = np.zeros((d, h, w))
    rhs[0, 0, 0], rhs[d - 1, h - 1, w - 1] = 1.0, -1.0
    x, info = weighted_lattice_solve(
        jnp.asarray(gx, jnp.float64), jnp.asarray(gy, jnp.float64),
        jnp.asarray(gz, jnp.float64), jnp.asarray(rhs, jnp.float64),
        tol=1e-10,
    )
    assert bool(info.converged)
    assert int(info.iterations) < 60, int(info.iterations)


def test_batched_sweep_matches_single():
    # vmap over conductance fields: Monte Carlo on a 3-D fabric.
    d, h, w = 4, 6, 6
    B = 4
    rng = np.random.default_rng(7)
    gxs = rng.uniform(0.5, 2.0, (B, d, h, w - 1)).astype(np.float32)
    gys = rng.uniform(0.5, 2.0, (B, d, h - 1, w)).astype(np.float32)
    gzs = rng.uniform(0.5, 2.0, (B, d - 1, h, w)).astype(np.float32)
    a, b = (0, 1, 1), (3, 4, 4)

    batched = jax.jit(jax.vmap(
        lambda gx, gy, gz: weighted_equivalent_resistance_3d(
            d, h, w, gx, gy, gz, a, b, tol=1e-6)[0]
    ))
    rs = np.asarray(batched(jnp.asarray(gxs), jnp.asarray(gys),
                            jnp.asarray(gzs)))
    for i in range(B):
        r_i, _ = weighted_equivalent_resistance_3d(
            d, h, w, jnp.asarray(gxs[i]), jnp.asarray(gys[i]),
            jnp.asarray(gzs[i]), a, b, tol=1e-6,
        )
        np.testing.assert_allclose(rs[i], float(r_i), rtol=1e-4)


def test_gradients_match_dense_oracle():
    """Adjoint gradients through the 3-D MG-CG solve (custom VJP): d
    sum(w·x)/d(gx, gy, gz, b) vs autodiff through a dense solve of the
    same regularized operator, plus an FD spot check on dR_eq/dg."""
    d, h, w = 3, 4, 5
    rng = np.random.default_rng(0)
    gx = jnp.asarray(rng.uniform(0.5, 2.0, (d, h, w - 1)))
    gy = jnp.asarray(rng.uniform(0.5, 2.0, (d, h - 1, w)))
    gz = jnp.asarray(rng.uniform(0.5, 2.0, (d - 1, h, w)))
    b = (jnp.zeros((d, h, w))
         .at[0, 0, 0].add(1.0).at[d - 1, h - 1, w - 1].add(-1.0))

    def dense_x(gx_, gy_, gz_, b_):
        n = d * h * w

        def mv(v):
            return (weighted_laplacian_matvec_3d(
                v.reshape(d, h, w), gx_, gy_, gz_).reshape(-1)
                + jnp.sum(v) / n)

        A = jax.vmap(mv)(jnp.eye(n)).T
        return jnp.linalg.solve(
            A, (b_ - jnp.mean(b_)).reshape(-1)).reshape(d, h, w)

    wt = jnp.asarray(rng.standard_normal((d, h, w)))
    f = lambda *args: jnp.sum(  # noqa: E731
        wt * weighted_lattice_solve(*args, tol=1e-12)[0])
    fo = lambda *args: jnp.sum(wt * dense_x(*args))  # noqa: E731
    g = jax.grad(f, argnums=(0, 1, 2, 3))(gx, gy, gz, b)
    go = jax.grad(fo, argnums=(0, 1, 2, 3))(gx, gy, gz, b)
    for a, o in zip(g, go):
        rel = float(jnp.max(jnp.abs(a - o)) / jnp.max(jnp.abs(o)))
        assert rel < 1e-8, rel

    term = ((0, 0, 0), (d - 1, h - 1, w - 1))
    R0, _ = weighted_equivalent_resistance_3d(d, h, w, gx, gy, gz, *term)
    dR = jax.grad(
        lambda gx_: weighted_equivalent_resistance_3d(
            d, h, w, gx_, gy, gz, *term)[0]
    )(gx)
    eps = 1e-6
    R1, _ = weighted_equivalent_resistance_3d(
        d, h, w, gx.at[1, 2, 3].add(eps), gy, gz, *term)
    fd = (float(R1) - float(R0)) / eps
    assert abs(float(dR[1, 2, 3]) - fd) < 1e-5
