"""Front-end tests: row validation, parsing, symbol tables, ground election,
connectivity.  Mirrors the reference's InputTesters/GroundNode/Connected
coverage (reference tests.py:125-216) plus new-framework behaviors."""

import pytest

from nodal_tpu import (
    Component,
    Netlist,
    NetlistError,
    build_opmodel,
    find_ground_node,
    is_connected,
)
from nodal_tpu.netlist import validate_row

import fixtures as fx

BAD_ROWS = [
    "aaaaa",  # not enough arguments
    "v1,VCVS,5,1,2",
    "v1,VCCS,5,1,2",
    "v1,CCVS,5,1,2",
    "v1,CCCS,5,1,2",
    "q1,OPMODEL,0,2,g,3",
    "v1,VCVS,5,1,2,1,1,1",  # too many arguments
    "r1,R,5,1,2,3",
    "r1,A,5,1,2,3",
    "r1,E,5,1,2,3",
    "q1,OPMODEL,1,2,g,3,1,5",
    "v1,VoltageSource,5,1,2",  # unknown type
    "r1,R,one_ohm,1,2",  # value is not a number
]

GOOD_ROWS = [
    "r1,R,2,1,4",
    "r2,R,2,1,g",
    "r3,R,0.5,1,2",
    "e1,E,8,4,g",
    "a1,A,4,1,2",
    "d1,CCCS,2,2,g,1,g,r2",
    "Ri,R,1e7,1,3",
    "vs,E,10,3,g",
    "d1,VCVS,1e5,2,g,3,1",
    "q1,OPMODEL,1,2,g,3,1",
    "q1,OPMODEL,0,2,g,3,2",
]


def test_validate_rejects_bad_rows():
    for bad in BAD_ROWS:
        with pytest.raises(ValueError):
            validate_row(bad.split(","))


def test_validate_accepts_good_rows():
    for good in GOOD_ROWS:
        validate_row(good.split(","))


def test_validate_accepts_comment_and_empty():
    validate_row([])
    validate_row("# This is a comment")


def test_component_check_input_parity_shim():
    # Reference tests call Component.check_input unbound (tests.py:10-11).
    Component.check_input(None, "r1,R,2,1,4".split(","))
    with pytest.raises(ValueError):
        Component.check_input(None, "r1,R,one_ohm,1,2".split(","))


def test_ground_explicit_g_wins():
    for deg in ({"g": 1}, {"g": 1, "a": 10, "b": 2}):
        assert find_ground_node(deg) == "g"


def test_ground_highest_degree():
    assert find_ground_node({"1": 1}) == "1"
    assert find_ground_node({"3": 1, "a": 10, "b": 2}) == "a"


def test_ground_insertion_order_tiebreak():
    assert find_ground_node({"1": 1, "2": 1}) == "1"
    assert find_ground_node({"3": 1, "a": 10, "b": 10}) == "a"


def test_netlist_symbol_tables(tmp_netlist):
    nl = Netlist(tmp_netlist(fx.CIRCUIT_161))
    assert nl.ground == "g"
    # first-appearance node order, ground excluded
    assert list(nl.nodenum) == ["1", "4", "2"]
    assert nl.nums["kcl"] == 3
    # anomalous components in insertion order
    assert nl.anomnum == {"e1": 0, "d1": 1}
    assert nl.nums["be"] == 2
    assert nl.n_unknowns == 5
    assert nl.component_keys == ["r1", "r2", "r3", "e1", "a1", "d1"]


def test_netlist_from_rows_matches_file(tmp_netlist):
    nl_file = Netlist(tmp_netlist(fx.CIRCUIT_161))
    rows = [line.split(",") for line in fx.CIRCUIT_161.strip().splitlines()]
    nl_rows = Netlist.from_rows(rows)
    assert nl_rows.nodenum == nl_file.nodenum
    assert nl_rows.anomnum == nl_file.anomnum
    assert nl_rows.ground == nl_file.ground


def test_netlist_missing_file():
    with pytest.raises(FileNotFoundError):
        Netlist("/nonexistent/netlist.csv")


def test_duplicate_component_name_rejected():
    rows = [["r1", "R", "1", "1", "g"], ["r1", "R", "2", "1", "g"]]
    with pytest.raises(NetlistError):
        Netlist.from_rows(rows)


def test_opmodel_expansion_structure():
    rows = build_opmodel(["q1", "OPMODEL", "1", "2", "g", "3", "1"])
    names = [r[0] for r in rows]
    assert names == ["q1_ri", "q1_ro", "q1_vcvs", "q1_rf"]
    ri, ro, vcvs, rf = rows
    assert ri[1:] == ["R", "10000000.0", "3", "1"]
    assert ro[1:] == ["R", "10.0", "q1_internal_node", "2"]
    assert vcvs[1:] == ["VCVS", "100000.0", "q1_internal_node", "g", "3", "1"]
    assert rf[1:] == ["R", "1", "1", "2"]


def test_opmodel_direct_feedback_requires_neg_eq_out():
    rows = build_opmodel(["q1", "OPMODEL", "0", "2", "g", "3", "2"])
    assert [r[0] for r in rows] == ["q1_ri", "q1_ro", "q1_vcvs"]
    with pytest.raises(NetlistError):
        build_opmodel(["q1", "OPMODEL", "0", "2", "g", "3", "4"])


def test_opmodel_rows_processed_after_primary(tmp_netlist):
    # Deferred OPMODEL expansion fixes symbol-table ordering
    # (reference nodal.py:276-277).
    nl = Netlist(tmp_netlist(fx.OPMODEL_AMPLIFIER))
    assert nl.component_keys == ["v1", "r1", "q1_ri", "q1_ro", "q1_vcvs", "q1_rf"]
    assert list(nl.nodenum) == ["3", "1", "q1_internal_node", "2"]


def test_is_connected(tmp_netlist):
    for text in (fx.CIRCUIT_161, fx.BUFFER, fx.DIVIDER, fx.UNCONNECTED_0):
        assert is_connected(Netlist(tmp_netlist(text)))
    assert not is_connected(Netlist(tmp_netlist(fx.UNCONNECTED_1)))


def test_fresh_name(tmp_netlist):
    nl = Netlist(tmp_netlist(fx.CIRCUIT_161))
    assert nl.fresh_name("probe") == "probe"
    assert nl.fresh_name("a1") == "a1_0"
