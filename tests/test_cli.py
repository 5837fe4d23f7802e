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
