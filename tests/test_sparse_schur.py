"""Bordered block elimination for general sparse MNA (ops/sparse_schur.py).

This is the SuperLU-robustness role (reference nodal.py:325): any circuit
structure — voltage/controlled sources, source-held nodes, opamp
macromodels — at sizes far beyond the dense paths, solved to direct-method
accuracy in f64.  Round-2 review item #1.
"""

import numpy as np
import pytest

from nodal_tpu import Circuit, Netlist
from nodal_tpu.ops.sparse_schur import (
    general_plan,
    resistively_grounded_nodes,
    solve_general_sparse,
)
from nodal_tpu.utils.gridgen import grid_rows


def _mesh_with_sources(h, w, *, ground_resistor=True):
    """An h×w resistor mesh plus E/VCCS/CCCS sources.

    ``ground_resistor=False`` leaves the mesh grounded ONLY through the E
    sources (no resistor touches ground) — the partition must then anchor
    the floating resistor component at a representative node.
    """
    probe = (0, 0) if ground_resistor else None
    rows = list(grid_rows(h, w, None, probe))
    name = "g" if ground_resistor else f"n{h-1}_{w-1}"
    rows.append(["e1", "E", "2", "n0_1", "g"])
    rows.append(["e2", "E", "-1", "n1_0", "g"])
    rows.append(["d1", "VCCS", "0.5", "n2_2", "g", "n0_1", "g"])
    rows.append(["rdrv", "R", "2", "n3_1", "n3_2"])
    rows.append(["f1", "CCCS", "1.5", "n2_1", "g", "n3_1", "n3_2", "rdrv"])
    del name
    return Netlist.from_rows(rows)


def _dense_reference(circuit):
    G, b = circuit.build_model()
    return np.linalg.solve(G, b)


@pytest.mark.parametrize("ground_resistor", [True, False])
def test_matches_dense_f64(ground_resistor):
    nl = _mesh_with_sources(8, 12, ground_resistor=ground_resistor)
    c = Circuit(nl, sparse=True)
    x, info = solve_general_sparse(c.stamps, c.stamps.params, tol=1e-10)
    expected = _dense_reference(c)
    err = np.max(np.abs(x - expected)) / np.max(np.abs(expected))
    assert bool(info.converged)
    assert float(info.residual) <= 1e-10
    assert err < 1e-8
    assert info.method.startswith("schur")


def test_partition_grounded_mesh():
    """All nodes of a resistively grounded mesh land in K1; the border is
    exactly the branch rows."""
    nl = _mesh_with_sources(6, 6, ground_resistor=True)
    c = Circuit(nl, sparse=True)
    plan = general_plan(c.stamps)
    kbe = c.stamps.n - c.stamps.n_kcl
    assert plan.m == kbe
    assert plan.n1 == c.stamps.n_kcl
    assert resistively_grounded_nodes(c.stamps).all()


def test_partition_e_only_grounding():
    """A mesh grounded only through E sources: one representative node per
    floating resistor component moves to the border (SPD anchor)."""
    nl = _mesh_with_sources(6, 6, ground_resistor=False)
    c = Circuit(nl, sparse=True)
    plan = general_plan(c.stamps)
    kbe = c.stamps.n - c.stamps.n_kcl
    assert not resistively_grounded_nodes(c.stamps).any()
    assert plan.m == kbe + 1  # one anchor node joins the border
    assert plan.n1 == c.stamps.n_kcl - 1


def test_no_resistors_at_all():
    """Pure-source circuit: empty K1, whole system solved as the dense
    border (reference handles this through SuperLU as well)."""
    nl = Netlist.from_rows([
        ["e1", "E", "3", "1", "g"],
        ["e2", "E", "1", "2", "1"],
        ["r1", "R", "1", "2", "g"],  # one resistor so G is nonsingular
    ])
    c = Circuit(nl, sparse=True)
    x, info = solve_general_sparse(c.stamps, c.stamps.params)
    expected = _dense_reference(c)
    assert np.allclose(x, expected, atol=1e-9)
    sol = c.solve()
    assert abs(sol.potential("1") - 3.0) < 1e-9
    assert abs(sol.potential("2") - 4.0) < 1e-9


def test_circuit_sparse_routes_through_schur():
    nl = _mesh_with_sources(10, 10, ground_resistor=True)
    sol = Circuit(nl, sparse=True).solve()
    # Round 4: eliminable E sources reduce away first, so the sparse
    # route reports the reduction + elimination chain (round 5 adds the
    # native skyline direct tier as the preferred A11 backend).
    assert sol.stats["method"] in (
        "schur", "ereduce+schur", "schur-skyline", "ereduce+schur-skyline")
    expected = _dense_reference(Circuit(nl))
    err = np.max(np.abs(sol.result - expected)) / np.max(np.abs(expected))
    assert err < 1e-8


def test_disconnected_island_raises_unconnected():
    """A fully floating resistor island: the uniform singularity gate must
    surface UnconnectedCircuitError, not NaNs (quirk Q3 stays fixed on the
    bordered-elimination path)."""
    from nodal_tpu.netlist import UnconnectedCircuitError

    rows = list(grid_rows(4, 4, (0, 0), (3, 3)))
    rows.append(["ri", "R", "1", "x1", "x2"])
    rows.append(["e1", "E", "1", "1", "g"])
    nl = Netlist.from_rows(rows)
    with pytest.raises(UnconnectedCircuitError):
        Circuit(nl, sparse=True).solve()


def test_singular_but_connected_raises_linalgerror():
    """An island tied into the graph only through a VCCS *output* keeps the
    island potentials' columns linearly dependent (x1+x2 null direction):
    G is singular while the circuit graph is connected — must raise
    LinAlgError through the same surface as the reference's dense path."""
    from numpy.linalg import LinAlgError

    rows = list(grid_rows(4, 4, (0, 0), (3, 3)))
    rows.append(["ri", "R", "1", "x1", "x2"])
    # VCCS output into x1 (graph edge x1-g) driven by main-mesh control:
    # island potentials stay free up to a constant -> singular columns.
    rows.append(["dv", "VCCS", "0.5", "x1", "g", "1", "g"])
    rows.append(["e1", "E", "1", "1", "g"])
    nl = Netlist.from_rows(rows)
    with pytest.raises(LinAlgError):
        Circuit(nl, sparse=True).solve()


def test_opmodel_chain_ill_conditioned():
    """Chained OPMODEL buffers (cond ~1e12 spread: Ri=1e7, Ro=10,
    gain=1e5) through the sparse path — the conditioning stress case the
    dense rescue used to own."""
    rows = []
    prev = "in"
    rows.append(["e1", "E", "1", "in", "g"])
    for k in range(4):
        out = f"b{k}"
        # Voltage-buffer OPMODEL (row layout as examples/
        # opmodel_voltage_buffer.csv): rf=0, output node, ground side,
        # pos input, neg input (= output, direct feedback).
        rows.append([f"op{k}", "OPMODEL", "0", out, "g", prev, out])
        rows.append([f"rl{k}", "R", "1000", out, "g"])
        prev = out
    nl = Netlist.from_rows(rows)
    c = Circuit(nl, sparse=True)
    sol = c.solve()
    # Every buffer output tracks the input voltage 1 V (gain error ~1e-5).
    for k in range(4):
        assert abs(sol.potential(f"b{k}") - 1.0) < 1e-3
    expected = _dense_reference(c)
    err = np.max(np.abs(sol.result - expected)) / np.max(np.abs(expected))
    assert err < 1e-6


def test_large_general_circuit_via_rescue_cap():
    """Above the dense-rescue cap the bordered elimination IS the rescue:
    force the primary iterative path to fail and check the rescue solves
    (round-2 review: >16,384 unknowns used to return NaN + error)."""
    import nodal_tpu.circuit as circuit_mod

    nl = _mesh_with_sources(16, 16, ground_resistor=True)
    c = Circuit(nl, sparse=True)
    expected = _dense_reference(c)

    # Simulate "too big for dense rescue" by shrinking the cap, and a
    # failed primary solve by monkeypatch-free means: call _rescue directly.
    old_cap = circuit_mod._DENSE_RESCUE_MAX_N
    circuit_mod._DENSE_RESCUE_MAX_N = 10
    try:
        x, residual = c._rescue()
    finally:
        circuit_mod._DENSE_RESCUE_MAX_N = old_cap
    err = np.max(np.abs(x - expected)) / np.max(np.abs(expected))
    assert residual < 1e-8
    assert err < 1e-8


def test_refinement_escalation_reaches_tol():
    """With a deliberately terrible setup tolerance the defect correction
    must still land at the target (by extra passes or the rebuild-at-tol
    escalation)."""
    nl = _mesh_with_sources(8, 8, ground_resistor=True)
    c = Circuit(nl, sparse=True)
    x, info = solve_general_sparse(
        c.stamps, c.stamps.params, tol=1e-10, setup_tol=1e-2
    )
    assert bool(info.converged), float(info.residual)
    assert float(info.residual) <= 1e-10


def test_rhs_override():
    """The probe-injection rhs= path (equivalent-resistance machinery)."""
    nl = _mesh_with_sources(6, 8, ground_resistor=True)
    c = Circuit(nl, sparse=True)
    rhs = np.zeros(c.stamps.n)
    rhs[0] = 1.0
    rhs[5] = -1.0
    x, info = solve_general_sparse(c.stamps, c.stamps.params, rhs=rhs)
    assert bool(info.converged)
    G, _ = c.build_model()
    expected = np.linalg.solve(G, rhs)
    assert np.allclose(x, expected, atol=1e-8)


# -- transpose solve + adjoint sensitivities (round 3) -----------------------


@pytest.mark.parametrize("ground_resistor", [True, False])
def test_transpose_solve_matches_dense(ground_resistor):
    """Gᵀy = c through the reused bordered factorization must match the
    dense f64 transpose solve (A11 symmetric ⇒ same YB/Schur LU serve both
    orientations)."""
    from nodal_tpu.ops.sparse_schur import solve_general_sparse_transpose

    nl = _mesh_with_sources(6, 7, ground_resistor=ground_resistor)
    c = Circuit(nl, sparse=True)
    rng = np.random.default_rng(7)
    rhs = rng.standard_normal(c.stamps.n)
    y, info = solve_general_sparse_transpose(c.stamps, rhs=rhs)
    assert bool(info.converged), float(info.residual)
    G, _ = c.build_model()
    expected = np.linalg.solve(np.asarray(G).T, rhs)
    err = np.max(np.abs(y - expected)) / np.max(np.abs(expected))
    assert err < 1e-8, err


def test_transpose_reuses_forward_factorization():
    """A transpose solve after a forward solve must hit the cached
    b-independent factorization (same stamp values ⇒ same digest key)."""
    from nodal_tpu.ops.sparse_schur import solve_general_sparse_transpose

    nl = _mesh_with_sources(6, 7)
    c = Circuit(nl, sparse=True)
    solve_general_sparse(c.stamps)
    fact_before = c.stamps._general_fact["lus"][False]
    rhs = np.zeros(c.stamps.n)
    rhs[3] = 1.0
    y, info = solve_general_sparse_transpose(c.stamps, rhs=rhs)
    assert bool(info.converged)
    assert c.stamps._general_fact["lus"][False] is fact_before


def test_adjoint_gradient_matches_dense_autodiff():
    """d x[idx] / d(every component) from the host adjoint (forward +
    transpose solve + COO chain rule) vs a full-f64 jax autodiff oracle."""
    import jax
    import jax.numpy as jnp

    from nodal_tpu.ops.assemble import assemble_dense
    from nodal_tpu.ops.sparse_schur import general_sparse_adjoint_gradient

    nl = _mesh_with_sources(6, 7)
    c = Circuit(nl, sparse=True)
    idx = 5
    pbar, x, info_f, info_a = general_sparse_adjoint_gradient(c.stamps, idx)
    assert bool(info_f.converged) and bool(info_a.converged)

    def f(q):
        G, b = assemble_dense(c.stamps, q, dtype=jnp.float64)
        return jnp.linalg.solve(G, b)[idx]

    go = np.asarray(jax.grad(f)(jnp.asarray(c.stamps.params,
                                            dtype=jnp.float64)))
    rel = np.max(np.abs(pbar - go)) / np.max(np.abs(go))
    assert rel < 1e-8, rel


def test_sensitivities_routes_sparse_circuits_through_adjoint():
    """sensitivities() on a sparse-constructed circuit must use the
    bordered-elimination adjoint (no dense [n,n] assembly) and agree with
    the dense-circuit route."""
    from nodal_tpu.batch import sensitivities

    nl = _mesh_with_sources(6, 7)
    sparse_c = Circuit(nl, sparse=True)
    dense_c = Circuit(_mesh_with_sources(6, 7))

    got = sensitivities(sparse_c, potential="n2_3")
    want = sensitivities(dense_c, potential="n2_3")
    assert set(got) == set(want)
    scale = max(abs(v) for v in want.values())
    for name in want:
        assert abs(got[name] - want[name]) <= 1e-8 * max(scale, 1.0), name

    # Branch-current outputs route the same way.
    got_i = sensitivities(sparse_c, current="e1")
    want_i = sensitivities(dense_c, current="e1")
    scale = max(abs(v) for v in want_i.values())
    for name in want_i:
        assert abs(got_i[name] - want_i[name]) <= 1e-8 * max(scale, 1.0)


@pytest.mark.parametrize("seed", [40_003, 40_017, 40_031, 40_049])
def test_controlled_chain_opmodel_fuzz_vs_dense_oracle(seed):
    """Round-5 torture seeds: E + VCCS + anomalous-driver chain (CCVS
    driven by E, CCCS driven by the CCVS — the reference crashes on
    these, SURVEY Q2) + an OPMODEL follower, solved forward AND
    transposed through solve_general_auto vs the dense f64 oracle.  A
    60-circuit one-off sweep ran clean; these seeds pin it."""
    from nodal_tpu.models.stamps import compile_stamps, stamp_values_np
    from nodal_tpu.ops.sparse_schur import (solve_general_auto,
                                            solve_general_auto_transpose)

    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 80))
    rows = []
    for i in range(n - 1):
        rows.append([f"rc{i}", "R", f"{rng.uniform(0.3, 5):.5f}",
                     f"n{i}", f"n{i + 1}"])
    rows.append(["rg", "R", "1", "n0", "g"])
    nE = int(rng.integers(0, n))
    nH = int(rng.integers(0, n))
    rows.append(["e0", "E", f"{rng.uniform(1, 4):.4f}", f"n{nE}", "g"])
    rows.append(["d0", "VCCS", "0.3", f"n{rng.integers(0, n)}", "g",
                 f"n{rng.integers(0, n)}", "g"])
    rows.append(["h0", "CCVS", "0.7", f"n{nH}", "g", f"n{nE}", "g", "e0"])
    rows.append(["f0", "CCCS", "0.5", f"n{rng.integers(0, n)}", "g",
                 f"n{nH}", "g", "h0"])
    rows.append(["u0", "OPMODEL", "0", "uo", "g",
                 f"n{int(rng.integers(0, n))}", "uo"])
    rows.append(["rl", "R", "100", "uo", "g"])
    st = compile_stamps(Netlist.from_rows(rows))
    g_vals, rhs_vals = stamp_values_np(st, st.params)
    G = np.zeros((st.n, st.n))
    b = np.zeros(st.n)
    np.add.at(G, (st.g_rows, st.g_cols), g_vals)
    np.add.at(b, st.rhs_rows, rhs_vals)
    x_ref = np.linalg.solve(G, b)

    x, info = solve_general_auto(st, tol=1e-10)
    assert bool(info.converged)
    err = np.max(np.abs(x - x_ref)) / np.max(np.abs(x_ref))
    assert err < 1e-7, (err, info.method)

    c = rng.standard_normal(st.n)
    y, info_t = solve_general_auto_transpose(st, rhs=c, tol=1e-10)
    assert bool(info_t.converged)
    y_ref = np.linalg.solve(G.T, c)
    errt = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    assert errt < 1e-7, (errt, info_t.method)
