"""CLI surface tests: nodal-solver / nodal-resistance parity
(reference solver.py, equiv.py:64-89) — untested in the reference itself."""

import numpy as np
import pytest

import fixtures as fx
from nodal_tpu import equiv_cli, solver_cli


def test_solver_cli_output(tmp_netlist, capsys):
    solver_cli.main([tmp_netlist(fx.DIVIDER)])
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[0] == "Ground node: 1"
    assert lines[1].startswith("e(2) \t= ")
    np.testing.assert_allclose(float(lines[1].split("= ")[1]), -1.0, rtol=1e-9)
    np.testing.assert_allclose(float(lines[2].split("= ")[1]), -2.0, rtol=1e-9)


def test_solver_cli_sparse_flag(tmp_netlist, capsys):
    solver_cli.main(["-s", tmp_netlist(fx.CIRCUIT_161)])
    out = capsys.readouterr().out
    assert out.startswith("Ground node: g")


def test_solver_cli_missing_file_exit_1():
    with pytest.raises(SystemExit) as exc:
        solver_cli.main(["/nonexistent/netlist.csv"])
    assert exc.value.code == 1


def test_solver_cli_unconnected_exit_1(tmp_netlist):
    with pytest.raises(SystemExit) as exc:
        solver_cli.main([tmp_netlist(fx.UNCONNECTED_1)])
    assert exc.value.code == 1


_VCCS_WHERE_IT_MATTERS = "e1,E,1,1,g\nr1,R,2,2,g\nd,VCCS,3,2,g,1,g\n"


def _parse_cli_output(out: str) -> dict:
    vals = {}
    for line in out.strip().splitlines()[1:]:
        key, val = line.split(" \t= ")
        vals[key] = float(val)
    return vals


def test_solver_cli_compat_vccs_flag(tmp_netlist, capsys):
    # Quirk Q1: upstream stamps VCCS rows as VCVS (reference
    # nodal.py:377-378) giving e(2)=3.0 here; correct transconductance
    # semantics give e(2)=6.0.  The flag restores upstream behavior.
    path = tmp_netlist(_VCCS_WHERE_IT_MATTERS)
    solver_cli.main([path])
    correct = _parse_cli_output(capsys.readouterr().out)
    np.testing.assert_allclose(correct["e(2)"], 6.0, rtol=1e-9)

    solver_cli.main(["--compat-vccs", path])
    compat = _parse_cli_output(capsys.readouterr().out)
    np.testing.assert_allclose(compat["e(2)"], 3.0, rtol=1e-9)


def test_solver_cli_compat_vccs_matches_reference(tmp_netlist, capsys):
    import os
    import sys as _sys

    if not os.path.isdir("/root/reference/nodal"):
        pytest.skip("reference implementation not mounted")
    path = tmp_netlist(_VCCS_WHERE_IT_MATTERS)
    _sys.path.insert(0, "/root/reference")
    try:
        import nodal as ref

        ref_out = str(ref.Circuit(ref.Netlist(path)).solve())
    finally:
        _sys.path.remove("/root/reference")

    solver_cli.main(["--compat-vccs", path])
    ours = _parse_cli_output(capsys.readouterr().out)
    theirs = _parse_cli_output(ref_out)
    assert set(ours) == set(theirs)
    for key in theirs:
        np.testing.assert_allclose(ours[key], theirs[key], rtol=1e-9,
                                   atol=1e-12)


def test_solver_cli_native_stats(tmp_netlist, capsys):
    pytest.importorskip("nodal_tpu.utils.native")
    from nodal_tpu.utils import native

    try:
        native._load()
    except native.NativeUnavailable:
        pytest.skip("no native build")
    from nodal_tpu.utils.gridgen import grid_csv

    path = tmp_netlist(grid_csv(8, 8, (0, 0), (7, 7)), "grid.csv")
    solver_cli.main(["--native", "on", "--stats", path])
    captured = capsys.readouterr()
    # native C++ parse + whichever sparse tier serves the solve (the
    # skyline direct tier since round 5; krylov when it is unavailable).
    assert "method: native+" in captured.err
    assert "iterations:" in captured.err
    assert captured.out.startswith("Ground node:")


def test_resistance_cli(tmp_netlist, capsys):
    equiv_cli.main([tmp_netlist(fx.RESISTIVE_1)])
    out = capsys.readouterr().out
    assert out.startswith("R = ")
    np.testing.assert_allclose(float(out.split("= ")[1]), 2.0, rtol=1e-8)


def test_resistance_cli_non_resistive_exit_1(tmp_netlist, capsys):
    with pytest.raises(SystemExit) as exc:
        equiv_cli.main([tmp_netlist(fx.CIRCUIT_161)])
    assert exc.value.code == 1
    out = capsys.readouterr().out
    assert "Resistors are the only component allowed" in out


def test_resistance_cli_missing_node_exit_1(tmp_netlist, capsys):
    # RESISTIVE probe defaults to nodes 1/g; a netlist without node "1".
    text = "ra, R, 1, 5, 6\nrb, R, 1, 6, g\n"
    with pytest.raises(SystemExit) as exc:
        equiv_cli.main([tmp_netlist(text)])
    assert exc.value.code == 1
    assert "not found" in capsys.readouterr().out


def test_resistance_cli_custom_nodes(tmp_netlist, capsys):
    equiv_cli.main(["--nodes", "2", "g", tmp_netlist(fx.RESISTIVE_1)])
    out = capsys.readouterr().out
    np.testing.assert_allclose(float(out.split("= ")[1]), 1.0, rtol=1e-8)


def test_resistance_cli_native_path(tmp_netlist, capsys):
    pytest.importorskip("nodal_tpu.utils.native")
    from nodal_tpu.utils import native

    try:
        native._load()
    except native.NativeUnavailable:
        pytest.skip("no native build")
    from nodal_tpu.utils.gridgen import grid_csv

    path = tmp_netlist(grid_csv(8, 8, (0, 0), (7, 7)), "grid.csv")
    equiv_cli.main(["--native", "on", path])
    r_native = float(capsys.readouterr().out.split("= ")[1])
    equiv_cli.main(["--native", "off", path])
    r_python = float(capsys.readouterr().out.split("= ")[1])
    np.testing.assert_allclose(r_native, r_python, rtol=1e-6)


def test_resistance_cli_native_rejects_non_resistive(tmp_netlist, capsys):
    pytest.importorskip("nodal_tpu.utils.native")
    from nodal_tpu.utils import native

    try:
        native._load()
    except native.NativeUnavailable:
        pytest.skip("no native build")
    path = tmp_netlist(fx.CIRCUIT_161)
    with pytest.raises(SystemExit) as exc:
        equiv_cli.main(["--native", "on", path])
    assert exc.value.code == 1
    assert "Resistors are the only component" in capsys.readouterr().out


def test_solver_cli_sensitivity(tmp_netlist, capsys):
    """--sensitivity prints d TARGET / d value per component via the
    adjoint method; divider values are analytic: e(2) = -I·r3 relative to
    ground, so d/d(source)=-r3=-1, d/d(r3)=-I=-1, d/d(r2)=0."""
    solver_cli.main([tmp_netlist(fx.DIVIDER), "--sensitivity", "e(2)"])
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert "Sensitivities of e(2):" in lines
    sens = {
        ln.split(" \t= ")[0][4:-1]: float(ln.split(" \t= ")[1])
        for ln in lines if ln.startswith("d/d(")
    }
    np.testing.assert_allclose(sens["1"], -1.0, atol=1e-9)
    np.testing.assert_allclose(sens["r3"], -1.0, atol=1e-9)
    np.testing.assert_allclose(sens["r2"], 0.0, atol=1e-9)


def test_solver_cli_sensitivity_bad_target_exit_1(tmp_netlist):
    with pytest.raises(SystemExit) as exc:
        solver_cli.main([tmp_netlist(fx.DIVIDER), "--sensitivity", "2"])
    assert exc.value.code == 1
    with pytest.raises(SystemExit) as exc:
        solver_cli.main([tmp_netlist(fx.DIVIDER),
                         "--sensitivity", "e(nope)"])
    assert exc.value.code == 1
