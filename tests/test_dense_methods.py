"""General-topology dense solver paths (round-2 perf work, VERDICT #1):
the Schur-complement method for branch-equation systems, the multi-RHS
blocked solve it relies on, and the VMEM-resident Pallas LU mega-kernel
(interpret mode here; Mosaic compilation in tests/test_tpu_smoke.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nodal_tpu import Circuit, Netlist
from nodal_tpu.batch import BatchedSolver, _schur_supported
from nodal_tpu.ops import block_lu
from nodal_tpu.ops.assemble import assemble_dense
from nodal_tpu.utils.gridgen import grid_rows


def _mesh_with_branches():
    rows = list(grid_rows(8, 8, (0, 0), (7, 7)))
    rows += [
        ["e1", "E", "2", "1", "g"],
        ["d1", "VCCS", "0.5", "n0_3", "g", "1", "g"],
        ["f1", "CCCS", "1.5", "n3_3", "g", "1", "g", "e1"],
    ]
    return Circuit(Netlist.from_rows(rows))


def _expected(circuit, params):
    G, b = assemble_dense(circuit.stamps, jnp.asarray(params, jnp.float64))
    return np.linalg.solve(np.asarray(G), np.asarray(b))


def test_schur_matches_dense_f64():
    circuit = _mesh_with_branches()
    solver = BatchedSolver(circuit, dtype=jnp.float64, method="schur")
    rng = np.random.default_rng(1)
    base = circuit.stamps.params
    batch = base * (1.0 + 0.05 * rng.standard_normal((5, len(base))))
    xs = np.asarray(solver(batch))
    for i in range(5):
        exp = _expected(circuit, batch[i])
        np.testing.assert_allclose(xs[i], exp, rtol=1e-10, atol=1e-12)


def test_schur_refined_f32_reaches_1e6():
    circuit = _mesh_with_branches()
    solver = BatchedSolver(circuit, dtype=jnp.float32, refine=True,
                           method="schur")
    batch = np.tile(circuit.stamps.params, (3, 1))
    xs = np.asarray(solver(batch))
    exp = _expected(circuit, batch[0])
    err = np.max(np.abs(xs[0] - exp)) / np.max(np.abs(exp))
    assert err < 1e-6


def test_schur_auto_selected_on_large_mesh_with_source():
    rows = list(grid_rows(25, 40, (0, 0), (24, 39))) + [
        ["e1", "E", "2", "1", "g"]
    ]
    circuit = Circuit(Netlist.from_rows(rows))
    assert BatchedSolver(circuit).method == "schur"


def test_schur_rejected_when_node_block_singular():
    # Node "1" is held only by the voltage source; nodes 1-2 form a
    # resistive island with no path to ground -> A singular -> dense.
    rows = [["e1", "E", "1", "1", "g"],
            ["r1", "R", "1", "1", "2"],
            ["r2", "R", "2", "2", "1"]]
    circuit = Circuit(Netlist.from_rows(rows))
    assert not _schur_supported(circuit.stamps)
    assert BatchedSolver(circuit).method == "dense"
    with pytest.raises(ValueError, match="Cholesky probe"):
        BatchedSolver(circuit, method="schur")


def test_schur_rejected_on_resistive_circuit():
    circuit = Circuit(Netlist.from_rows(grid_rows(4, 4, (0, 0), (3, 3))))
    with pytest.raises(ValueError, match="branch equations"):
        BatchedSolver(circuit, method="schur")


def test_blocked_solve_factored_matrix_rhs():
    rng = np.random.default_rng(0)
    n, r = 256, 7
    A = rng.standard_normal((n, n)) * 0.3
    A = A + A.T + np.eye(n) * (np.abs(A).sum(1).max() + 1.0)
    R = rng.standard_normal((n, r))
    panels = block_lu.blocked_factor(jnp.asarray(A))
    Y = np.asarray(block_lu.blocked_solve_factored(panels, jnp.asarray(R)))
    np.testing.assert_allclose(Y, np.linalg.solve(A, R), rtol=1e-8,
                               atol=1e-10)
    # Vector RHS still works (shape round-trip).
    y = np.asarray(
        block_lu.blocked_solve_factored(panels, jnp.asarray(R[:, 0]))
    )
    np.testing.assert_allclose(y, np.linalg.solve(A, R[:, 0]), rtol=1e-8,
                               atol=1e-10)


@pytest.mark.parametrize("n", [256, 999])
def test_pallas_lu_interpret_matches_numpy(n):
    from nodal_tpu.ops.pallas_block_lu import pallas_lu_solve

    rng = np.random.default_rng(n)
    B = 3
    A = rng.standard_normal((B, n, n)).astype(np.float32) * 0.5
    A = A + np.transpose(A, (0, 2, 1))
    A += np.eye(n)[None] * (np.abs(A).sum(-1).max(-1)[:, None, None] + 1.0)
    b = rng.standard_normal((B, n)).astype(np.float32)
    x = np.asarray(pallas_lu_solve(jnp.asarray(A), jnp.asarray(b)))
    exp = np.linalg.solve(A.astype(np.float64),
                          b[..., None].astype(np.float64))[..., 0]
    err = np.max(np.abs(x - exp)) / np.max(np.abs(exp))
    assert err < 5e-6


def test_pallas_lu_size_guard():
    from nodal_tpu.ops.pallas_block_lu import lu_fits_vmem, pallas_lu_solve

    assert lu_fits_vmem(999)
    assert not lu_fits_vmem(2048)
    big = jnp.ones((1, 2048, 2048), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        pallas_lu_solve(big, jnp.ones((1, 2048), jnp.float32))


def test_pallas_lu_multi_rhs_interpret():
    from nodal_tpu.ops.pallas_block_lu import pallas_lu_solve_multi

    rng = np.random.default_rng(7)
    B, n, r = 3, 256, 5
    A = rng.standard_normal((B, n, n)).astype(np.float32) * 0.5
    A = A + np.transpose(A, (0, 2, 1))
    A += np.eye(n)[None] * (np.abs(A).sum(-1).max(-1)[:, None, None] + 1.0)
    R = rng.standard_normal((B, n, r)).astype(np.float32)
    X = np.asarray(pallas_lu_solve_multi(jnp.asarray(A), jnp.asarray(R)))
    exp = np.linalg.solve(A.astype(np.float64), R.astype(np.float64))
    err = np.max(np.abs(X - exp)) / np.max(np.abs(exp))
    assert err < 5e-5


def test_schur_block_assembler_matches_full_assembly():
    from nodal_tpu.batch import _schur_block_assembler
    from nodal_tpu.ops.pallas_block_lu import _pad

    circuit = _mesh_with_branches()
    stamps = circuit.stamps
    nk, kbe = stamps.n_kcl, stamps.n - stamps.n_kcl
    nk_pad = _pad(nk)
    blocks = _schur_block_assembler(stamps, jnp.float64, nk_pad)
    rng = np.random.default_rng(0)
    params = stamps.params * (1 + 0.1 * rng.standard_normal(
        len(stamps.params)))
    A, Bm, C, D, bk, bb = [np.asarray(t) for t in blocks(params)]
    G, b = assemble_dense(stamps, jnp.asarray(params, jnp.float64))
    G, b = np.asarray(G), np.asarray(b)
    np.testing.assert_array_equal(A[:nk, :nk], G[:nk, :nk])
    np.testing.assert_array_equal(A[nk:, nk:], np.eye(nk_pad - nk))
    assert not A[:nk, nk:].any() and not A[nk:, :nk].any()
    np.testing.assert_array_equal(Bm, G[:nk, nk:])
    np.testing.assert_array_equal(C, G[nk:, :nk])
    np.testing.assert_array_equal(D, G[nk:, nk:])
    np.testing.assert_array_equal(bk, b[:nk])
    np.testing.assert_array_equal(bb, b[nk:])


def test_schur_via_pallas_multi_matches_dense_interpret():
    # Mirrors the TPU schur fast path (batch.py) with the interpret-mode
    # kernel: block assembly -> multi-RHS VMEM LU -> Schur algebra.
    from nodal_tpu.batch import _schur_block_assembler
    from nodal_tpu.ops.pallas_block_lu import _pad, pallas_lu_solve_multi

    circuit = _mesh_with_branches()
    stamps = circuit.stamps
    nk, kbe = stamps.n_kcl, stamps.n - stamps.n_kcl
    blocks = _schur_block_assembler(stamps, jnp.float32, _pad(nk))
    batch = np.tile(stamps.params, (2, 1)).astype(np.float32)
    A, Bm, C, D, bk, bb = jax.vmap(blocks)(jnp.asarray(batch))
    R = jnp.concatenate([Bm, bk[..., None]], axis=-1)
    R = jnp.pad(R, [(0, 0), (0, A.shape[-1] - nk), (0, 0)])
    Y = pallas_lu_solve_multi(A, R)[:, :nk, :]
    YB, yb = Y[..., :kbe], Y[..., kbe]
    S = D - C @ YB
    xb = jnp.linalg.solve(S, (bb - (C @ yb[..., None])[..., 0])[..., None])[..., 0]
    xk = yb - (YB @ xb[..., None])[..., 0]
    x = np.asarray(jnp.concatenate([xk, xb], axis=-1))
    exp = _expected(circuit, batch[0])
    err = np.max(np.abs(x[0] - exp)) / np.max(np.abs(exp))
    assert err < 1e-4


def test_newton_inverse_jacobi_start_weakly_dominant():
    # Interior Laplacian rows have |diag| == sum|offdiag| (weak dominance);
    # the Jacobi-start Newton-Schulz must still converge.
    n = 128
    D = np.zeros((n, n))
    for i in range(n):
        D[i, i] = 4.0
        for j in (i - 1, i + 1, i - 8, i + 8):
            if 0 <= j < n:
                D[i, j] = -1.0
    X = np.asarray(block_lu._inv_block(jnp.asarray(D), 12))
    assert np.max(np.abs(np.eye(n) - X @ D)) < 1e-6
