"""Golden-circuit parity: solve the reference's documented example circuits
and match its published values numerically (tolerance, not string-exact —
fixes reference quirk Q5).  Goldens from reference tests.py:52-122."""

import numpy as np
import pytest

from nodal_tpu import Circuit, Netlist

import fixtures as fx

GOLDENS = [
    ("DIVIDER", fx.DIVIDER, fx.DIVIDER_EXPECTED),
    ("161", fx.CIRCUIT_161, fx.CIRCUIT_161_EXPECTED),
    ("BUFFER", fx.BUFFER, fx.BUFFER_EXPECTED),
    ("OPMODEL_AMPLIFIER", fx.OPMODEL_AMPLIFIER, fx.OPMODEL_AMPLIFIER_EXPECTED),
    ("OPMODEL_BUFFER", fx.OPMODEL_BUFFER, fx.OPMODEL_BUFFER_EXPECTED),
    ("ALL_TYPES", fx.ALL_TYPES, fx.ALL_TYPES_EXPECTED),
]


def assert_solution_matches(solution, expected, rtol=1e-6, atol=1e-9):
    assert solution.ground == expected["ground"]
    for node, value in expected["e"].items():
        np.testing.assert_allclose(
            solution.potential(node), value, rtol=rtol, atol=atol,
            err_msg=f"e({node})",
        )
    for name, value in expected["i"].items():
        np.testing.assert_allclose(
            solution.current(name), value, rtol=rtol, atol=atol,
            err_msg=f"i({name})",
        )


@pytest.mark.parametrize("name,text,expected", GOLDENS, ids=[g[0] for g in GOLDENS])
def test_dense_golden(tmp_netlist, name, text, expected):
    solution = Circuit(Netlist(tmp_netlist(text))).solve()
    assert_solution_matches(solution, expected)


@pytest.mark.parametrize(
    "name,text,expected",
    [g for g in GOLDENS if g[0] in ("DIVIDER", "161", "ALL_TYPES")],
    ids=["DIVIDER", "161", "ALL_TYPES"],
)
def test_sparse_golden(tmp_netlist, name, text, expected):
    # Sparse/iterative path on the well-conditioned goldens.  (The opamp
    # macromodels are cond ~1e12 — Krylov without a strong preconditioner is
    # the wrong tool there; Circuit falls back and still returns correctly,
    # covered by test_sparse_fallback.)
    solution = Circuit(Netlist(tmp_netlist(text)), sparse=True).solve()
    assert_solution_matches(solution, expected, rtol=1e-6, atol=1e-8)


def test_sparse_fallback_on_ill_conditioned(tmp_netlist):
    solution = Circuit(Netlist(tmp_netlist(fx.BUFFER)), sparse=True).solve()
    assert_solution_matches(solution, fx.BUFFER_EXPECTED)


def test_printed_format(tmp_netlist):
    # Output format contract (reference nodal.py:422-434): ground line first,
    # then e() lines sorted by node name, then i() lines sorted by component.
    out = str(Circuit(Netlist(tmp_netlist(fx.CIRCUIT_161))).solve())
    lines = out.splitlines()
    assert lines[0] == "Ground node: g"
    assert [ln.split(" \t= ")[0] for ln in lines[1:]] == [
        "e(1)", "e(2)", "e(4)", "i(d1)", "i(e1)",
    ]
    # values parse back as floats
    vals = [float(ln.split(" \t= ")[1]) for ln in lines[1:]]
    np.testing.assert_allclose(vals, [2.0, -1.0, 8.0, -2.0, 3.0], rtol=1e-6)


def test_unconnected_0_solves(tmp_netlist):
    # Shares ground across the 'split' — connected, solvable; e(3) = 12/13 V
    # (reference doc/unconnected_0.csv annotation).
    solution = Circuit(Netlist(tmp_netlist(fx.UNCONNECTED_0))).solve()
    np.testing.assert_allclose(solution.potential("3"), 12.0 / 13.0, rtol=1e-6)


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_unconnected_raises_uniformly(tmp_netlist, sparse):
    # Quirk Q3 fixed: both paths raise UnconnectedCircuitError; the reference
    # sparse path silently printed NaNs.
    from nodal_tpu import UnconnectedCircuitError

    circuit = Circuit(Netlist(tmp_netlist(fx.UNCONNECTED_1)), sparse=sparse)
    with pytest.raises(UnconnectedCircuitError):
        circuit.solve()


def test_zero_resistance_rejected(tmp_netlist):
    with pytest.raises(ValueError, match="null resistance"):
        Circuit(Netlist(tmp_netlist("r1,R,0,1,g\ne1,E,1,1,g\n")))


def test_degenerate_netlists():
    from numpy.linalg import LinAlgError

    # Single resistor: trivially solvable, node floats at 0.
    s = Circuit(Netlist.from_rows([["r1", "R", "1", "1", "g"]])).solve()
    assert s.potential("1") == 0.0

    # Lone current source: no conductance anywhere -> genuinely singular.
    with pytest.raises(LinAlgError):
        Circuit(Netlist.from_rows([["a1", "A", "1", "1", "g"]])).solve()

    # Lone voltage source: branch equation pins the node.
    s = Circuit(Netlist.from_rows([["e1", "E", "5", "1", "g"]])).solve()
    np.testing.assert_allclose(s.potential("1"), 5.0)
    np.testing.assert_allclose(s.current("e1"), 0.0, atol=1e-12)

    # No explicit ground: degree election picks the first max-degree node.
    s = Circuit(Netlist.from_rows(
        [["r1", "R", "2", "a", "b"], ["e1", "E", "4", "a", "b"]]
    )).solve()
    assert s.ground == "a"
    np.testing.assert_allclose(s.potential("b"), -4.0)


def test_against_numpy_reference(tmp_netlist):
    # Independent cross-check: numpy.linalg.solve on our assembled system
    # must agree with the jitted device solve to 1e-9.
    circuit = Circuit(Netlist(tmp_netlist(fx.CIRCUIT_161)))
    G, b = circuit.build_model()
    expected = np.linalg.solve(G, b)
    got = circuit.solve().result
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)
