"""Property tests: randomized circuits against an independent numpy check.

Two invariants:
1. The assembled system satisfies physics (KCL residual of the solution,
   source constraints) — independent of how stamps were lowered.
2. Random resistive networks satisfy reciprocity and scaling laws of
   equivalent resistance.
"""

import numpy as np
import pytest

from nodal_tpu import Circuit, Netlist
from nodal_tpu.equiv import equivalent_resistance


def _random_connected_resistive(rng, n_nodes, extra_edges=4):
    """Random connected resistor network over nodes 1..n-1 plus g."""
    names = [str(i) for i in range(1, n_nodes)] + ["g"]
    rows = []
    # Spanning chain guarantees connectivity.
    for i in range(len(names) - 1):
        rows.append([f"rc{i}", "R", f"{rng.uniform(0.5, 5):.6f}",
                     names[i], names[i + 1]])
    for k in range(extra_edges):
        a, b = rng.choice(names, 2, replace=False)
        rows.append([f"rx{k}", "R", f"{rng.uniform(0.5, 5):.6f}", a, b])
    return rows, names


@pytest.mark.parametrize("seed", range(5))
def test_solution_satisfies_kcl(seed):
    rng = np.random.default_rng(seed)
    rows, names = _random_connected_resistive(rng, 8)
    rows.append(["i1", "A", "1.5", names[0], "g"])
    rows.append(["v1", "E", "2.0", names[2], "g"])
    circuit = Circuit(Netlist.from_rows(rows))
    solution = circuit.solve()

    G, b = circuit.build_model()
    residual = G @ solution.result - b
    np.testing.assert_allclose(residual, 0.0, atol=1e-9)

    # The voltage source actually pins its node.
    np.testing.assert_allclose(solution.potential(names[2]), 2.0, rtol=1e-9)


@pytest.mark.parametrize("seed", range(5))
def test_equivalent_resistance_properties(seed):
    rng = np.random.default_rng(100 + seed)
    rows, names = _random_connected_resistive(rng, 7)
    netlist = Netlist.from_rows(rows)
    a = names[0]

    r_ab = equivalent_resistance(netlist, a, "g")
    assert r_ab > 0

    # Reciprocity: swapping the probe terminals flips nothing.
    r_ba = equivalent_resistance(netlist, "g", a)
    np.testing.assert_allclose(r_ab, r_ba, rtol=1e-9)

    # Linear scaling: multiplying every resistor by c scales R_eq by c.
    scaled_rows = [[r[0], r[1], repr(float(r[2]) * 3.0), r[3], r[4]]
                   for r in rows]
    r_scaled = equivalent_resistance(Netlist.from_rows(scaled_rows), a, "g")
    np.testing.assert_allclose(r_scaled, 3.0 * r_ab, rtol=1e-8)

    # Upper bound: R_eq can't exceed the series resistance of any path;
    # the spanning chain provides one explicit path from a to g.
    chain = sum(float(r[2]) for r in rows if r[0].startswith("rc"))
    assert r_ab <= chain + 1e-9


@pytest.mark.parametrize("seed", range(3))
def test_sparse_dense_agree_on_random_networks(seed):
    rng = np.random.default_rng(200 + seed)
    rows, names = _random_connected_resistive(rng, 10, extra_edges=8)
    rows.append(["i1", "A", "1", names[1], "g"])
    netlist_rows = rows
    dense = Circuit(Netlist.from_rows(netlist_rows), sparse=False).solve()
    sparse = Circuit(Netlist.from_rows(netlist_rows), sparse=True).solve()
    np.testing.assert_allclose(sparse.result, dense.result, rtol=1e-7,
                               atol=1e-10)


def _random_geometric_resistive(rng, n_nodes, radius=0.12):
    """Random geometric graph: local connectivity, so it RCM-bands —
    exercises the band path's planning + solve on irregular topologies."""
    pts = rng.uniform(0, 1, (n_nodes, 2))
    rows = []
    k = 0
    for i in range(n_nodes):
        for j in range(i + 1, n_nodes):
            if np.sum((pts[i] - pts[j]) ** 2) < radius ** 2:
                rows.append([f"r{k}", "R", f"{rng.uniform(0.5, 5):.6f}",
                             f"n{i}", f"n{j}"])
                k += 1
    # ground ties keep it connected + diagonally dominant
    for i in range(n_nodes):
        rows.append([f"rg{i}", "R", f"{rng.uniform(5, 50):.4f}",
                     f"n{i}", "g"])
    rows.append(["src", "A", "1", "n0", "g"])
    return rows


@pytest.mark.parametrize("seed", range(5))
def test_band_path_matches_dense_on_geometric_graphs(seed):
    """Randomized check of the whole band pipeline (RCM plan, permuted
    block-band assembly, block-Thomas, un-permute) against the dense numpy
    oracle on irregular-but-local topologies."""
    import jax.numpy as jnp

    from nodal_tpu.batch import BatchedSolver
    from nodal_tpu.ops.assemble import assemble_dense
    from nodal_tpu.ops.band import band_plan

    rng = np.random.default_rng(100 + seed)
    rows = _random_geometric_resistive(rng, 300)
    circuit = Circuit(Netlist.from_rows(rows))
    plan = band_plan(circuit.stamps)
    if plan is None or plan.nb < 2:
        pytest.skip("this draw did not band (radius too large)")
    solver = BatchedSolver(circuit, dtype=jnp.float64, method="band")
    base = circuit.stamps.params
    pb = base * (1.0 + 0.1 * rng.standard_normal((3, len(base))))
    xs = np.asarray(solver(pb))
    for i in range(3):
        G, b = assemble_dense(circuit.stamps,
                              jnp.asarray(pb[i], jnp.float64))
        expected = np.linalg.solve(np.asarray(G), np.asarray(b))
        np.testing.assert_allclose(xs[i], expected, rtol=1e-8, atol=1e-11)


@pytest.mark.parametrize("seed", range(3))
def test_band_single_solve_matches_reference_semantics(seed):
    """Circuit.solve routed through band_thomas must satisfy KCL exactly
    like the dense path (same Solution surface, residual-audited)."""
    rng = np.random.default_rng(200 + seed)
    rows = _random_geometric_resistive(rng, 300)
    circuit = Circuit(Netlist.from_rows(rows))
    sol = circuit.solve()
    assert sol.stats["residual"] < 1e-9
    # physics check: net current into n0 equals the 1 A source
    import jax.numpy as jnp

    from nodal_tpu.ops.assemble import assemble_dense

    G, b = assemble_dense(circuit.stamps,
                          jnp.asarray(circuit.stamps.params, jnp.float64))
    x = np.array([sol.result[i] for i in range(circuit.stamps.n)])
    r = np.asarray(b) - np.asarray(G) @ x
    assert np.max(np.abs(r)) < 1e-9


@pytest.mark.parametrize("seed", range(5))
def test_adjoint_gradients_on_random_networks(seed):
    """Property: on random connected resistive networks (plus a random
    current source), jax.grad through whichever solver method auto-selects
    must match autodiff through plain dense assembly+solve."""
    import jax
    import jax.numpy as jnp

    from nodal_tpu.batch import BatchedSolver
    from nodal_tpu.ops.assemble import assemble_dense

    rng = np.random.default_rng(300 + seed)
    rows, names = _random_connected_resistive(rng, 9, extra_edges=6)
    a, b = rng.choice(names, 2, replace=False)
    rows.append(["src", "A", f"{rng.uniform(0.5, 2):.6f}", a, b])
    circuit = Circuit(Netlist.from_rows(rows))
    solver = BatchedSolver(circuit, dtype=jnp.float64)

    p = jnp.asarray(circuit.stamps.params)[None, :]
    w = jnp.asarray(rng.standard_normal((1, circuit.stamps.n)))
    g = jax.grad(lambda q: jnp.sum(w * solver._solve(q)))(p)

    def oracle(q):
        G, rhs = assemble_dense(circuit.stamps, q[0], dtype=jnp.float64)
        return jnp.sum(w[0] * jnp.linalg.solve(G, rhs))

    go = jax.grad(oracle)(p)
    np.testing.assert_allclose(np.asarray(g), np.asarray(go),
                               rtol=1e-8, atol=1e-12)
