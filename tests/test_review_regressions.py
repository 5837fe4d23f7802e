"""Regression tests for the round-1 code-review findings."""

import numpy as np
import jax.numpy as jnp
import pytest

from nodal_tpu import Circuit, Netlist, NetlistError
from nodal_tpu.batch import BatchedSolver
from nodal_tpu.utils.gridgen import grid_rows, ladder_rows

import fixtures as fx


def test_forced_tridiag_on_wide_matrix_rejected():
    # Silently dropping out-of-band entries returned wrong answers before.
    circuit = Circuit(Netlist.from_rows(grid_rows(3, 3, (0, 0), (2, 2))))
    with pytest.raises(ValueError, match="bandwidth"):
        BatchedSolver(circuit, method="tridiag")


def test_forced_fast_method_on_anomalous_rejected():
    rows = [r.split(",") for r in fx.CIRCUIT_161.strip().splitlines()]
    circuit = Circuit(Netlist.from_rows(rows))
    for method in ("tridiag", "block"):
        with pytest.raises(ValueError, match="resistive"):
            BatchedSolver(circuit, method=method)


def test_pallas_shape_guard():
    from nodal_tpu.ops.grid import _pallas_shapes_ok

    assert _pallas_shapes_ok(1024, 1024, 4)
    assert _pallas_shapes_ok(512, 512, 4)  # single mega-kernel regime
    assert not _pallas_shapes_ok(600, 1024, 4)  # not 256-tileable
    assert not _pallas_shapes_ok(1999, 2048, 4)  # odd above cutoff


def test_pallas_backend_rejects_bad_shape_cleanly():
    from nodal_tpu.ops.grid import make_mg_preconditioner

    with pytest.raises(ValueError, match="does not support"):
        make_mg_preconditioner(600, 1024, jnp.float32, backend="pallas")


def test_pcr_vmem_guard():
    from nodal_tpu.ops.pallas_tridiag import pcr_fits_vmem, pcr_solve_padded

    assert pcr_fits_vmem(1000)
    assert not pcr_fits_vmem(65536)
    big = jnp.ones((8, 65536), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        pcr_solve_padded(big, big, big, big)


def test_empty_name_field_is_clean():
    # ',R,1,a,b' used to crash with IndexError in the Python front-end.
    nl = Netlist.from_rows([["", "R", "1", "a", "b"],
                            ["r2", "R", "1", "b", "g"]])
    assert "" in nl.components  # empty-name component, like the C++ parser


def test_monte_carlo_honors_f64(tmp_netlist):
    from nodal_tpu.batch import monte_carlo

    circuit = Circuit(Netlist(tmp_netlist(fx.DIVIDER)))
    out = monte_carlo(circuit, {"r3": 0.05}, n=64, dtype=jnp.float64)
    assert out["mean"].dtype == jnp.float64


def test_native_accepts_trailing_blank_in_value():
    native = pytest.importorskip("nodal_tpu.utils.native")
    try:
        native._load()
    except native.NativeUnavailable:
        pytest.skip("no native build")
    stamps, symbols = native.parse_stamps("r1,R,1.0 ,a,b\nr2,R,2,b,g\n")
    np.testing.assert_allclose(stamps.params, [1.0, 2.0])


def test_huge_sparse_nonconvergence_not_rescued(monkeypatch):
    # The dense rescue must not fire above the size gate.
    import nodal_tpu.circuit as circuit_mod

    monkeypatch.setattr(circuit_mod, "_DENSE_RESCUE_MAX_N", 4)
    circuit = Circuit(Netlist.from_rows(ladder_rows(16)), sparse=True)
    # Force the residual check to fail so the rescue path runs.
    monkeypatch.setattr(
        circuit_mod.Circuit, "_acceptable", lambda self, r, d=None: False
    )
    from numpy.linalg import LinAlgError

    with pytest.raises(LinAlgError):
        circuit.solve()
