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
    # Unsmoothed: Galerkin with piecewise-constant P preserves the total
    # matrix sum (1^T A 1 is invariant since P 1_c = 1_f on aggregates).
    levels = build_hierarchy(stamps.n, topo.rows, topo.cols, vals,
                             smooth_prolongation=False)
    assert len(levels) >= 2
    sizes = [lv.n for lv in levels]
    assert all(sizes[i + 1] < sizes[i] for i in range(len(sizes) - 1))
    assert levels[-1].p_rows is None
    for a, b in zip(levels[:-1], levels[1:]):
        np.testing.assert_allclose(a.vals.sum(), b.vals.sum(), rtol=1e-9)


def test_smoothed_hierarchy_preserves_constants():
    # The smoothed prolongator must keep P 1_c = 1_f on the Laplacian's
    # near-nullspace: (I - w D^-1 A) applied to the constant changes it by
    # w D^-1 A 1 = 0 only where A has zero row sums (interior); grounding
    # leaks perturb rows they touch, which is correct (the near-nullspace
    # there is not the constant).  Check the pure-Laplacian rows exactly.
    stamps, topo, vals = _grid_system(24, 24)
    levels = build_hierarchy(stamps.n, topo.rows, topo.cols, vals)
    lv = levels[0]
    assert lv.p_rows is not None
    # P @ 1
    ones_c = np.ones(lv.n_coarse)
    p1 = np.zeros(lv.n)
    np.add.at(p1, lv.p_rows, lv.p_vals * ones_c[lv.p_cols])
    # rows with zero row-sum in A (pure Laplacian rows)
    rowsum = np.zeros(lv.n)
    np.add.at(rowsum, lv.rows, lv.vals)
    interior = np.abs(rowsum) < 1e-12
    np.testing.assert_allclose(p1[interior], 1.0, atol=1e-12)


def test_sa_fill_gate_reverts_on_expanders():
    # Random expander-ish graph: smoothing must be auto-reverted (fill cap)
    # so the hierarchy stays sparse.
    rng = np.random.default_rng(1)
    n = 2000
    rows, cols, vals = [], [], []
    for _ in range(6 * n):
        i, j = rng.integers(0, n, 2)
        if i == j:
            continue
        g = rng.uniform(0.2, 5)
        rows += [i, j, i, j]
        cols += [i, j, j, i]
        vals += [g, g, -g, -g]
    rows = np.array(rows, np.int32)
    cols = np.array(cols, np.int32)
    vals = np.array(vals, float)
    key = rows.astype(np.int64) * n + cols
    uniq, inv = np.unique(key, return_inverse=True)
    merged = np.zeros(len(uniq))
    np.add.at(merged, inv, vals)
    levels = build_hierarchy(n, (uniq // n).astype(np.int32),
                             (uniq % n).astype(np.int32), merged)
    for a, b in zip(levels[:-1], levels[1:]):
        assert len(b.vals) <= 4.5 * len(a.vals), "fill gate failed"


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
