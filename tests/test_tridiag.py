"""Tridiagonal PCR solver + structure detection + batched fast path."""

import numpy as np
import jax.numpy as jnp

from nodal_tpu import Circuit, Netlist
from nodal_tpu.batch import BatchedSolver
from nodal_tpu.ops.assemble import assemble_tridiag, bandwidth
from nodal_tpu.ops.tridiag import tridiag_matvec, tridiag_solve
from nodal_tpu.utils.gridgen import ladder_rows

import fixtures as fx


def _random_dd_tridiag(B, n, seed=0):
    rng = np.random.default_rng(seed)
    dl = rng.uniform(-1, 1, (B, n))
    du = rng.uniform(-1, 1, (B, n))
    dl[:, 0] = 0.0
    du[:, -1] = 0.0
    d = np.abs(dl) + np.abs(du) + rng.uniform(1.0, 2.0, (B, n))
    b = rng.standard_normal((B, n))
    return dl, d, du, b


def _dense_from_bands(dl, d, du):
    n = d.shape[-1]
    A = np.zeros((n, n))
    A[np.arange(n), np.arange(n)] = d
    A[np.arange(1, n), np.arange(n - 1)] = dl[1:]
    A[np.arange(n - 1), np.arange(1, n)] = du[:-1]
    return A


def test_pcr_matches_dense_solve():
    for n in (1, 2, 3, 7, 16, 100, 1000):
        dl, d, du, b = _random_dd_tridiag(4, n, seed=n)
        x = np.asarray(
            tridiag_solve(*(jnp.asarray(v, dtype=jnp.float64) for v in (dl, d, du, b)))
        )
        for i in range(4):
            A = _dense_from_bands(dl[i], d[i], du[i])
            xe = np.linalg.solve(A, b[i])
            np.testing.assert_allclose(x[i], xe, rtol=1e-10, atol=1e-12,
                                       err_msg=f"n={n} sys={i}")


def test_tridiag_matvec():
    dl, d, du, b = _random_dd_tridiag(2, 9)
    A = _dense_from_bands(dl[0], d[0], du[0])
    y = np.asarray(
        tridiag_matvec(*(jnp.asarray(v, dtype=jnp.float64) for v in (dl, d, du, b)))
    )
    np.testing.assert_allclose(y[0], A @ b[0], rtol=1e-12)


def test_ladder_is_tridiagonal():
    circuit = Circuit(Netlist.from_rows(ladder_rows(64)))
    assert bandwidth(circuit.stamps) == 1
    assert circuit.stamps.n == circuit.stamps.n_kcl


def test_band_assembly_matches_dense():
    circuit = Circuit(Netlist.from_rows(ladder_rows(32)))
    params = jnp.asarray(circuit.stamps.params)
    dl, d, du, b = assemble_tridiag(circuit.stamps, params)
    G, be = circuit.build_model()
    A = _dense_from_bands(np.asarray(dl), np.asarray(d), np.asarray(du))
    np.testing.assert_allclose(A, G, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(b), be, rtol=1e-12)


def test_batched_solver_selects_tridiag_and_matches():
    circuit = Circuit(Netlist.from_rows(ladder_rows(100)))
    solver = BatchedSolver(circuit, dtype=jnp.float64)
    assert solver.method == "tridiag"

    rng = np.random.default_rng(5)
    base = circuit.stamps.params
    batch = base * (1.0 + 0.1 * rng.standard_normal((8, len(base))))
    got = np.asarray(solver(batch))

    dense = BatchedSolver(circuit, dtype=jnp.float64, method="dense")
    expected = np.asarray(dense(batch))
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)


def test_batched_solver_block_method_matches():
    # A resistive mesh that is NOT tridiagonal -> block method.
    from nodal_tpu.utils.gridgen import grid_rows

    circuit = Circuit(Netlist.from_rows(grid_rows(5, 5, (0, 0), (4, 4))))
    # Narrow meshes now auto-route to the scalar band tier; pin 'block'.
    assert BatchedSolver(circuit, dtype=jnp.float64).method == "sband"
    solver = BatchedSolver(circuit, dtype=jnp.float64, method="block")
    assert solver.method == "block"
    base = circuit.stamps.params
    batch = np.tile(base, (3, 1))
    got = np.asarray(solver(batch))
    dense = BatchedSolver(circuit, dtype=jnp.float64, method="dense")
    np.testing.assert_allclose(got, np.asarray(dense(batch)), rtol=1e-9)


def test_batched_solver_dense_for_anomalous():
    circuit = Circuit(Netlist.from_rows(
        [r.split(",") for r in fx.CIRCUIT_161.strip().splitlines()]
    ))
    solver = BatchedSolver(circuit, dtype=jnp.float64)
    assert solver.method == "dense"


def test_refined_tridiag_reaches_f64():
    circuit = Circuit(Netlist.from_rows(ladder_rows(200)))
    solver = BatchedSolver(circuit, refine=True)
    assert solver.method == "tridiag"
    base = circuit.stamps.params
    batch = np.tile(base, (2, 1)).astype(np.float32)
    got = np.asarray(solver(jnp.asarray(batch)))
    dense = BatchedSolver(circuit, dtype=jnp.float64, method="dense")
    expected = np.asarray(dense(batch.astype(np.float64)))
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)
