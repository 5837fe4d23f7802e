"""AMG preconditioner: hierarchy invariants and end-to-end convergence on
irregular resistive networks (where the geometric-multigrid grid path does
not apply)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nodal_tpu import Circuit, Netlist
from nodal_tpu.models.stamps import stamp_values_np
from nodal_tpu.ops.amg import build_hierarchy, make_amg_preconditioner
from nodal_tpu.ops.cg import cg
from nodal_tpu.ops.sparse import _topology, coo_matvec, sparse_values
from nodal_tpu.utils.gridgen import grid_rows


def _grid_system(h, w):
    netlist = Netlist.from_rows(grid_rows(h, w, (0, 0), (h - 1, w - 1)))
    stamps = Circuit(netlist).stamps
    topo = _topology(stamps)
    g_np, _ = stamp_values_np(stamps, stamps.params)
    merged = np.zeros(len(topo.rows))
    np.add.at(merged, topo.entry_to_slot, g_np)
    return stamps, topo, merged


def test_hierarchy_shrinks_and_preserves_sum():
    stamps, topo, vals = _grid_system(20, 20)
    levels = build_hierarchy(stamps.n, topo.rows, topo.cols, vals)
    assert len(levels) >= 2
    sizes = [lv.n for lv in levels]
    assert all(sizes[i + 1] < sizes[i] for i in range(len(sizes) - 1))
    assert levels[-1].agg is None
    # Galerkin with piecewise-constant P preserves the total matrix sum
    # (1^T A 1 is invariant under P since P 1_c = 1_f on aggregates).
    for a, b in zip(levels[:-1], levels[1:]):
        np.testing.assert_allclose(a.vals.sum(), b.vals.sum(), rtol=1e-9)


def test_amg_cg_beats_jacobi_on_irregular_network(tmp_netlist):
    # Random 'city-block' network: grid plus random long-range resistors.
    rng = np.random.default_rng(0)
    rows = list(grid_rows(30, 30, (0, 0), (29, 29)))
    flat = [f"n{i}_{j}" for i in range(30) for j in range(30)]
    flat[0], flat[-1] = "1", "g"
    for k in range(40):
        a, b = rng.choice(flat, 2, replace=False)
        rows.append([f"long{k}", "R", f"{rng.uniform(0.5, 5):.4f}", a, b])
    stamps = Circuit(Netlist.from_rows(rows)).stamps
    topo = _topology(stamps)
    g_np, _ = stamp_values_np(stamps, stamps.params)
    merged = np.zeros(len(topo.rows))
    np.add.at(merged, topo.entry_to_slot, g_np)

    levels = build_hierarchy(stamps.n, topo.rows, topo.cols, merged)
    M = make_amg_preconditioner(levels, jnp.float64)
    vals = sparse_values(topo, stamps, jnp.asarray(stamps.params))
    b = jnp.zeros(stamps.n, jnp.float64).at[0].add(1.0).at[50].add(-1.0)

    x_amg, info_amg = cg(lambda v: coo_matvec(topo, vals, v), b,
                         preconditioner=M, tol=1e-10, maxiter=2000)
    assert bool(info_amg.converged)

    from nodal_tpu.ops.sparse import jacobi_preconditioner

    x_jac, info_jac = cg(lambda v: coo_matvec(topo, vals, v), b,
                         preconditioner=jacobi_preconditioner(topo, vals),
                         tol=1e-10, maxiter=2000)
    assert int(info_amg.iterations) < int(info_jac.iterations) / 2, (
        int(info_amg.iterations), int(info_jac.iterations))
    np.testing.assert_allclose(np.asarray(x_amg), np.asarray(x_jac),
                               rtol=1e-6, atol=1e-9)


def test_amg_solve_sparse_system_explicit():
    # Explicit AMG selection through the solver entry point.
    from nodal_tpu.ops.sparse import solve_sparse_system

    stamps, topo, vals = _grid_system(30, 30)
    b = np.zeros(stamps.n)
    b[0] = 1.0
    x, info = solve_sparse_system(stamps, stamps.params, rhs=b,
                                  preconditioner="amg")
    assert bool(info.converged)
    x_j, info_j = solve_sparse_system(stamps, stamps.params, rhs=b,
                                      preconditioner="jacobi")
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_j), rtol=1e-6,
                               atol=1e-9)
    assert int(info.iterations) < int(info_j.iterations)


def test_equiv_large_netlist_stamp_path_matches_grid():
    # 50x50 grid netlist through the generic stamp-level path must match
    # the matrix-free geometric solver.
    from nodal_tpu.equiv import equivalent_resistance_stamps
    from nodal_tpu.ops.grid import grid_equivalent_resistance
    from nodal_tpu.utils.gridgen import grid_csv
    from nodal_tpu.utils import native

    try:
        native._load()
    except native.NativeUnavailable:
        pytest.skip("no native build")

    h = w = 50
    a, b = (10, 10), (40, 40)
    stamps, symbols = native.parse_stamps(grid_csv(h, w, a, b))
    r_amg = equivalent_resistance_stamps(
        stamps, symbols.node_index("1"), symbols.node_index("g")
    )
    r_geo, info = grid_equivalent_resistance(h, w, a, b, dtype=jnp.float64,
                                             tol=1e-10)
    np.testing.assert_allclose(r_amg, float(r_geo), rtol=1e-6)
