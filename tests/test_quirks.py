"""Reference-divergence coverage: correct VCCS semantics (quirk Q1) and
working anomalous drivers for CCCS/CCVS (quirk Q2).  SURVEY.md §2.4."""

import numpy as np
import pytest

from nodal_tpu import Circuit, Netlist, Quirks

# A circuit where true-VCCS and VCVS-aliased semantics genuinely differ
# (SURVEY.md Q1 verification circuit): VCCS d with transconductance 3
# controlled by e(1), output across r1 (2 ohm).
VCCS_DISCRIMINATOR = [
    ["e1", "E", "1", "1", "g"],
    ["r1", "R", "2", "2", "g"],
    ["d", "VCCS", "3", "2", "g", "1", "g"],
]


def test_vccs_true_semantics():
    # i_d = 3 * e(1) = 3 A into node 2; e(2) = 2 ohm * 3 A = 6 V.
    nl = Netlist.from_rows(VCCS_DISCRIMINATOR)
    solution = Circuit(nl).solve()
    np.testing.assert_allclose(solution.potential("2"), 6.0, rtol=1e-9)
    np.testing.assert_allclose(solution.current("d"), 3.0, rtol=1e-9)


def test_vccs_reference_quirk_mode():
    # Quirks(vccs_as_vcvs=True) reproduces the reference's dispatcher bug
    # (nodal.py:377-378): VCVS semantics give e(2) = 3 * e(1) = 3 V.
    nl = Netlist.from_rows(VCCS_DISCRIMINATOR)
    solution = Circuit(nl, quirks=Quirks(vccs_as_vcvs=True)).solve()
    np.testing.assert_allclose(solution.potential("2"), 3.0, rtol=1e-9)


# CCCS driven by a voltage source's branch current — crashes in the
# reference (models.py:200 AttributeError + missing kcl offset).
CCCS_E_DRIVER = [
    ["e1", "E", "2", "1", "g"],
    ["r1", "R", "1", "1", "g"],
    ["f1", "CCCS", "3", "2", "g", "1", "g", "e1"],
    ["rl", "R", "1", "2", "g"],
]


def test_cccs_with_anomalous_driver():
    # Hand-derived MNA: e(1)=2, i_E = 2 (KCL at 1: e1/R1 - i_E = 0),
    # branch: i_F = 3 i_E = 6, KCL at 2: e2/RL - i_F = 0 -> e(2) = 6.
    nl = Netlist.from_rows(CCCS_E_DRIVER)
    solution = Circuit(nl).solve()
    np.testing.assert_allclose(solution.potential("1"), 2.0, rtol=1e-9)
    np.testing.assert_allclose(solution.potential("2"), 6.0, rtol=1e-9)
    np.testing.assert_allclose(solution.current("f1"), 6.0, rtol=1e-9)


CCVS_E_DRIVER = [
    ["e1", "E", "2", "1", "g"],
    ["r1", "R", "1", "1", "g"],
    ["h1", "CCVS", "5", "2", "g", "1", "g", "e1"],
    ["rl", "R", "1", "2", "g"],
]


def test_ccvs_with_anomalous_driver():
    # v(h1) = 5 * i_E; i_E = 2 as above -> e(2) = 10.
    nl = Netlist.from_rows(CCVS_E_DRIVER)
    solution = Circuit(nl).solve()
    np.testing.assert_allclose(solution.potential("2"), 10.0, rtol=1e-9)


def test_chained_anomalous_drivers():
    # CCCS driven by another CCCS — two levels past what the reference can
    # express (it crashes on any anomalous driver, Q2).
    rows = [
        ["e1", "E", "1", "1", "g"],
        ["r1", "R", "1", "1", "g"],
        ["f1", "CCCS", "2", "2", "g", "1", "g", "e1"],
        ["r2", "R", "1", "2", "g"],
        ["f2", "CCCS", "3", "3", "g", "2", "g", "f1"],
        ["r3", "R", "1", "3", "g"],
    ]
    solution = Circuit(Netlist.from_rows(rows)).solve()
    # i_E = e(1)/R1 = 1; i_f1 = 2 i_E = 2 -> e(2) = 2; i_f2 = 3 i_f1 = 6.
    np.testing.assert_allclose(solution.current("f1"), 2.0, rtol=1e-9)
    np.testing.assert_allclose(solution.potential("2"), 2.0, rtol=1e-9)
    np.testing.assert_allclose(solution.current("f2"), 6.0, rtol=1e-9)
    np.testing.assert_allclose(solution.potential("3"), 6.0, rtol=1e-9)


def test_control_driver_mismatch_rejected():
    rows = [
        ["e1", "E", "2", "1", "g"],
        ["r1", "R", "1", "1", "g"],
        ["r2", "R", "1", "2", "g"],
        # control nodes (2, g) do not coincide with driver r1's terminals
        ["f1", "CCCS", "3", "2", "g", "2", "g", "r1"],
    ]
    with pytest.raises(ValueError, match="coincide"):
        Circuit(Netlist.from_rows(rows))


def test_missing_driver_rejected():
    rows = [
        ["r1", "R", "1", "1", "g"],
        ["f1", "CCCS", "3", "2", "g", "1", "g", "nope"],
    ]
    with pytest.raises(KeyError, match="nope"):
        Circuit(Netlist.from_rows(rows))


def test_opamp_not_implemented():
    rows = [["q1", "OPAMP", "1", "2", "g", "3", "1"], ["r1", "R", "1", "2", "g"]]
    with pytest.raises(NotImplementedError):
        Circuit(Netlist.from_rows(rows))
