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
