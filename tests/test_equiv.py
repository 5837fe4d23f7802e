"""Equivalent-resistance tests (reference ResistanceTesters, tests.py:14-36)
plus the probe-name-collision fix (quirk Q4)."""

import numpy as np
import pytest

from nodal_tpu import Netlist
from nodal_tpu.equiv import check_resistive, equivalent_resistance

import fixtures as fx


@pytest.mark.parametrize(
    "text,expected",
    [(fx.RESISTIVE_1, 2.0), (fx.RESISTIVE_2, 1.0), (fx.RESISTIVE_3, 1.0)],
    ids=["resistive_1", "resistive_2", "resistive_3"],
)
@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_equivalent_resistance_goldens(tmp_netlist, text, expected, sparse):
    netlist = Netlist(tmp_netlist(text))
    r = equivalent_resistance(netlist, "1", "g", sparse=sparse)
    np.testing.assert_allclose(r, expected, rtol=1e-8)


def test_check_resistive(tmp_netlist):
    expectations = {
        fx.RESISTIVE_1: True,
        fx.RESISTIVE_2: True,
        fx.CIRCUIT_161: False,
        fx.DIVIDER: False,
        fx.OPMODEL_AMPLIFIER: False,
    }
    for text, expected in expectations.items():
        assert check_resistive(Netlist(tmp_netlist(text))) is expected


def test_non_resistive_rejected(tmp_netlist):
    with pytest.raises(ValueError):
        equivalent_resistance(Netlist(tmp_netlist(fx.CIRCUIT_161)), "1", "g")


def test_missing_probe_node_rejected(tmp_netlist):
    with pytest.raises(KeyError):
        equivalent_resistance(Netlist(tmp_netlist(fx.RESISTIVE_1)), "42", "g")


def test_probe_name_collision_fixed(tmp_netlist):
    # Quirk Q4: the reference injects its probe source as "a1" and clobbers
    # an existing component of that name (verified LinAlgError there).  Here
    # the probe gets a fresh name and the solve succeeds.
    text = "a1, R, 1, 1, 2\nr2, R, 1, 2, g\n"
    r = equivalent_resistance(Netlist(tmp_netlist(text)), "1", "g")
    np.testing.assert_allclose(r, 2.0, rtol=1e-8)


def test_original_netlist_not_mutated(tmp_netlist):
    netlist = Netlist(tmp_netlist(fx.RESISTIVE_1))
    keys_before = list(netlist.component_keys)
    equivalent_resistance(netlist, "1", "g")
    assert netlist.component_keys == keys_before


class TestEquivalentResistanceMany:
    def test_matches_single_probe_loop(self):
        from nodal_tpu.equiv import (equivalent_resistance,
                                     equivalent_resistance_many)
        from nodal_tpu.utils.gridgen import grid_rows

        rows = list(grid_rows(7, 20, (0, 0), (6, 19)))  # probes -> "1", "g"
        nl = Netlist.from_rows(rows)
        pairs = [("1", "n5_5"), ("n1_1", "n5_5"), ("n0_1", "n0_2"),
                 ("n3_3", nl.ground)]
        many = equivalent_resistance_many(nl, pairs)
        for (a, b), r in zip(pairs, many):
            single = equivalent_resistance(nl, a, b)
            np.testing.assert_allclose(r, single, rtol=1e-9, atol=1e-12)

    def test_reciprocity_and_errors(self):
        import pytest

        from nodal_tpu.equiv import equivalent_resistance_many

        rows = [
            ["r1", "R", "1", "1", "2"],
            ["r2", "R", "2", "2", "g"],
            ["r3", "R", "3", "1", "g"],
        ]
        nl = Netlist.from_rows(rows)
        r = equivalent_resistance_many(nl, [("1", "2"), ("2", "1")])
        np.testing.assert_allclose(r[0], r[1], rtol=1e-12)
        with pytest.raises(KeyError):
            equivalent_resistance_many(nl, [("1", "nope")])
        rows.append(["e1", "E", "1", "1", "g"])
        with pytest.raises(ValueError):
            equivalent_resistance_many(Netlist.from_rows(rows), [("1", "2")])

    def test_empty_pairs(self):
        from nodal_tpu.equiv import equivalent_resistance_many

        nl = Netlist.from_rows([["r1", "R", "1", "1", "g"]])
        out = equivalent_resistance_many(nl, [])
        assert out.shape == (0,)

    def test_singular_netlist_raises_not_nan(self):
        import pytest

        from nodal_tpu import UnconnectedCircuitError
        from nodal_tpu.equiv import equivalent_resistance_many

        # two disconnected resistive islands: singular reduced system
        nl = Netlist.from_rows([
            ["r1", "R", "1", "a", "b"],
            ["r2", "R", "1", "c", "g"],
        ])
        with pytest.raises(UnconnectedCircuitError):
            equivalent_resistance_many(nl, [("a", "b")])


def test_resistance_sensitivities_analytic_and_fd():
    """dR_eq/dR_k by the adjoint method: exact on series/parallel
    closed forms, FD-checked on a bridge network."""
    from nodal_tpu.equiv import resistance_sensitivities

    nl = Netlist.from_rows(
        [["r1", "R", "2", "1", "2"], ["r2", "R", "3", "2", "g"]])
    s = resistance_sensitivities(nl, "1", "g")
    assert abs(s["r1"] - 1.0) < 1e-12 and abs(s["r2"] - 1.0) < 1e-12

    nl = Netlist.from_rows(
        [["r1", "R", "2", "1", "g"], ["r2", "R", "3", "1", "g"]])
    s = resistance_sensitivities(nl, "1", "g")
    # R = r1 r2/(r1+r2): dR/dr1 = (r2/(r1+r2))², dR/dr2 = (r1/(r1+r2))²
    assert abs(s["r1"] - (3 / 5) ** 2) < 1e-12
    assert abs(s["r2"] - (2 / 5) ** 2) < 1e-12

    rows = [["r1", "R", "1", "1", "2"], ["r2", "R", "2", "1", "3"],
            ["r3", "R", "3", "2", "3"], ["r4", "R", "4", "2", "g"],
            ["r5", "R", "5", "3", "g"]]
    nl = Netlist.from_rows(rows)
    s = resistance_sensitivities(nl, "1", "g")
    R0 = equivalent_resistance(nl, "1", "g")
    for name in ("r1", "r3", "r5"):
        eps = 1e-7
        rows2 = [[n, t, str(float(v) + (eps if n == name else 0.0)), *rest]
                 for n, t, v, *rest in rows]
        R1 = equivalent_resistance(Netlist.from_rows(rows2), "1", "g")
        assert abs(s[name] - (R1 - R0) / eps) < 1e-5, name


def test_resistance_sensitivities_validation():
    from nodal_tpu.equiv import resistance_sensitivities

    nl = Netlist.from_rows(
        [["r1", "R", "2", "1", "g"], ["e1", "E", "1", "1", "g"]])
    with pytest.raises(ValueError):
        resistance_sensitivities(nl, "1", "g")
    nl = Netlist.from_rows([["r1", "R", "2", "1", "g"]])
    with pytest.raises(KeyError):
        resistance_sensitivities(nl, "1", "nope")
