"""Grid fast path: matrix-free multigrid CG must match the netlist path."""

import numpy as np
import jax.numpy as jnp
import pytest

from nodal_tpu import Netlist
from nodal_tpu.equiv import equivalent_resistance
from nodal_tpu.ops.grid import (
    grid_equivalent_resistance,
    grid_solve,
    laplacian_matvec,
)
from nodal_tpu.utils.gridgen import grid_csv, grid_rows, ladder_rows


@pytest.mark.parametrize(
    "h,w,a,b",
    [
        (2, 2, (0, 0), (1, 1)),
        (3, 3, (0, 0), (1, 2)),
        (4, 4, (1, 1), (2, 3)),
        (5, 7, (0, 0), (4, 6)),
    ],
)
def test_grid_matches_netlist_path(h, w, a, b):
    netlist = Netlist.from_rows(grid_rows(h, w, probe_a=a, probe_b=b))
    r_netlist = equivalent_resistance(netlist, "1", "g")
    r_grid, info = grid_equivalent_resistance(h, w, a, b, dtype=jnp.float64, tol=1e-10)
    np.testing.assert_allclose(float(r_grid), r_netlist, rtol=1e-7)
    assert bool(info.converged)


def test_laplacian_matvec_matches_dense():
    from nodal_tpu.ops.grid import _dense_laplacian

    h, w = 5, 6
    rng = np.random.default_rng(0)
    x = rng.standard_normal((h, w))
    L = _dense_laplacian(h, w, 1.0)
    expected = (L @ x.reshape(-1)).reshape(h, w)
    got = laplacian_matvec(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12)


def test_mg_converges_fast():
    # Multigrid-preconditioned CG should converge in a few dozen iterations
    # regardless of grid size; plain CG needs O(grid side).
    r, info = grid_equivalent_resistance(
        64, 64, (32, 32), (33, 34), dtype=jnp.float64, tol=1e-9
    )
    assert bool(info.converged)
    assert int(info.iterations) < 40, int(info.iterations)
    # xkcd-356: knight's-move resistance on the infinite grid is
    # 4/pi - 1/2 ~= 0.773; a 64x64 window is within a few 1e-3.
    np.testing.assert_allclose(float(r), 4 / np.pi - 0.5, atol=5e-3)


def test_grid_solve_respects_injection_field():
    # Multiple simultaneous injections (superposition sanity check).
    h = w = 8
    rhs = np.zeros((h, w))
    rhs[1, 1], rhs[6, 6] = 1.0, -1.0
    x, info = grid_solve(h, w, rhs, dtype=jnp.float64, tol=1e-10)
    assert bool(info.converged)
    x = np.asarray(x)
    np.testing.assert_allclose(x.mean(), 0.0, atol=1e-12)
    assert x[1, 1] > x[6, 6]


def test_many_probe_pairs_match_single():
    from nodal_tpu.ops.grid import grid_equivalent_resistance_many

    h = w = 16
    pairs = np.array([
        [[0, 0], [15, 15]],
        [[3, 3], [4, 5]],
        [[8, 8], [9, 10]],
    ])
    rs, residuals = grid_equivalent_resistance_many(
        h, w, pairs, dtype=jnp.float64, tol=1e-10
    )
    assert np.all(np.asarray(residuals) < 1e-9)
    for k in range(len(pairs)):
        r_single, _ = grid_equivalent_resistance(
            h, w, tuple(pairs[k, 0]), tuple(pairs[k, 1]),
            dtype=jnp.float64, tol=1e-10,
        )
        np.testing.assert_allclose(float(rs[k]), float(r_single), rtol=1e-8)


def test_gridgen_csv_roundtrip(tmp_path):
    text = grid_csv(3, 3, probe_a=(0, 0), probe_b=(2, 2))
    p = tmp_path / "grid.csv"
    p.write_text(text)
    netlist = Netlist(str(p))
    assert "1" in netlist.degrees and "g" in netlist.degrees
    # 3x3 grid: 2*3*2 = 12 resistors
    assert netlist.nums["components"] == 12


def test_laddergen():
    nl = Netlist.from_rows(ladder_rows(8))
    assert nl.nums["kcl"] == 8
    assert nl.ground == "g"
