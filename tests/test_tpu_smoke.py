"""Mosaic-compiled smoke tier (`pytest -m tpu`, VERDICT #5 / ADVICE #4).

The main suite pins JAX_PLATFORMS=cpu, so every Pallas kernel is only
*interpret*-tested there — Mosaic-specific constraints (8-row DMA
alignment, x32 BlockSpecs, VMEM budgets, double-buffering limits) are
unverified by it and historically only surfaced in the driver bench.  This
module compiles and runs the hot kernels on real hardware:

    NODAL_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_smoke.py -m tpu

(in environments where the TPU is reached through a differently-named PJRT
plugin, pass that platform name instead — e.g.
NODAL_TPU_TEST_PLATFORM=axon,cpu for this build's remote-TPU tunnel; the
tests key on ``jax.default_backend() == "tpu"``, which such plugins still
report.  Keep ``,cpu`` in the list: the f64 oracles run on the host CPU
backend, and TPU-f64 LU does not exist).

Interpret-mode passes do NOT validate Mosaic lowering; a recorded run of
this tier is the round's evidence that the kernels still compile.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="requires real TPU (NODAL_TPU_TEST_PLATFORM=tpu)",
    ),
]


def _f32(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_fused_jacobi_mosaic_single_block():
    from nodal_tpu.ops.grid import laplacian_matvec
    from nodal_tpu.ops.pallas_stencil import fused_jacobi

    rng = np.random.default_rng(0)
    x, r = _f32(rng, 256, 256), _f32(rng, 256, 256)
    got = np.asarray(fused_jacobi(x, r, weight=1.0, omega=0.8, sweeps=3))
    ref = x
    for _ in range(3):
        ref = ref + (0.8 / 4.0) * (r - laplacian_matvec(ref, 1.0))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_fused_jacobi_mosaic_tiled():
    # 1024 rows -> the gridded/tiled regime (DMA halos across tiles).
    from nodal_tpu.ops.grid import laplacian_matvec
    from nodal_tpu.ops.pallas_stencil import fused_jacobi

    rng = np.random.default_rng(1)
    x, r = _f32(rng, 1024, 256), _f32(rng, 1024, 256)
    got = np.asarray(fused_jacobi(x, r, weight=1.0, omega=0.8, sweeps=2))
    ref = x
    for _ in range(2):
        ref = ref + (0.8 / 4.0) * (r - laplacian_matvec(ref, 1.0))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_pcr_solve_mosaic():
    from nodal_tpu.ops.pallas_tridiag import pcr_solve_padded
    from nodal_tpu.ops.tridiag import tridiag_matvec

    rng = np.random.default_rng(2)
    B, n = 64, 1000
    dl = _f32(rng, B, n) * 0.3
    du = _f32(rng, B, n) * 0.3
    dl = dl.at[:, 0].set(0.0)
    du = du.at[:, -1].set(0.0)
    d = 2.0 + jnp.abs(_f32(rng, B, n))  # diagonally dominant
    b = _f32(rng, B, n)
    x = pcr_solve_padded(dl, d, du, b)
    r = np.asarray(b - tridiag_matvec(dl, d, du, x))
    assert np.max(np.abs(r)) / np.max(np.abs(np.asarray(b))) < 1e-4


def test_grid_solve_pallas_mega_kernel():
    # 512x512: the single mega-kernel V-cycle regime of ops/grid.py.
    from nodal_tpu.ops.grid import grid_equivalent_resistance

    h = w = 512
    r, info = grid_equivalent_resistance(
        h, w, (0, 0), (h - 1, w - 1), dtype=jnp.float32, tol=1e-6,
        mg=True, mg_backend="pallas",
    )
    assert bool(info.converged)
    assert int(info.iterations) < 80
    assert np.isfinite(float(r)) and float(r) > 0


def test_pallas_lu_mosaic():
    # The VMEM-resident blocked-LU mega-kernel (T=8 interleave, manual
    # HBM->VMEM DMA, raised scoped-vmem limit) — the general-topology
    # batched fast path.
    from nodal_tpu.ops.assemble import assemble_dense
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.ops.pallas_block_lu import pallas_lu_solve
    from nodal_tpu.utils.gridgen import grid_rows

    rows = list(grid_rows(10, 10, (0, 0), (9, 9)))
    rows.append(["src", "A", "1", "1", "g"])
    circuit = Circuit(Netlist.from_rows(rows))
    stamps = circuit.stamps
    B = 16
    batch = jnp.asarray(np.tile(stamps.params.astype(np.float32), (B, 1)))
    G, b = jax.vmap(
        lambda p: assemble_dense(stamps, p, dtype=jnp.float32)
    )(batch)
    x = np.asarray(pallas_lu_solve(G, b))
    # Host-side f64 reference (no CPU jax backend is registered when
    # JAX_PLATFORMS pins the TPU plugin).
    from nodal_tpu.models.stamps import stamp_values_np

    g_vals, rhs_vals = stamp_values_np(stamps, stamps.params)
    G0 = np.zeros((stamps.n, stamps.n))
    np.add.at(G0, (stamps.g_rows, stamps.g_cols), g_vals)
    b0 = np.zeros(stamps.n)
    np.add.at(b0, stamps.rhs_rows, rhs_vals)
    expected = np.linalg.solve(G0, b0)
    err = np.max(np.abs(x[0].astype(np.float64) - expected)) / np.max(
        np.abs(expected))
    assert err < 1e-2  # f32 no-pivot floor; batched path audits residuals


def test_pallas_lu_multi_rhs_mosaic():
    from nodal_tpu.ops.pallas_block_lu import pallas_lu_solve_multi

    rng = np.random.default_rng(3)
    B, n, r = 8, 256, 5
    A = rng.standard_normal((B, n, n)).astype(np.float32) * 0.5
    A = A + np.transpose(A, (0, 2, 1))
    A += np.eye(n)[None] * (np.abs(A).sum(-1).max(-1)[:, None, None] + 1.0)
    R = rng.standard_normal((B, n, r)).astype(np.float32)
    X = np.asarray(pallas_lu_solve_multi(jnp.asarray(A), jnp.asarray(R)))
    exp = np.linalg.solve(A.astype(np.float64), R.astype(np.float64))
    assert np.max(np.abs(X - exp)) / np.max(np.abs(exp)) < 1e-3


def test_pallas_band_mosaic_end_to_end():
    # The banded block-Thomas mega-kernel through BatchedSolver (RCM
    # reorder + band assembly + VMEM kernel + un-permute in one jit).
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.batch import BatchedSolver
    from nodal_tpu.utils.gridgen import grid_rows

    rows = list(grid_rows(9, 40, (0, 0), (8, 39)))
    rows.append(["src", "A", "1", "n1_1", "g"])
    circuit = Circuit(Netlist.from_rows(rows))
    solver = BatchedSolver(circuit, dtype=jnp.float32)
    assert solver.method == "sband"
    batch = np.tile(circuit.stamps.params.astype(np.float32), (32, 1))
    xs = solver(batch)
    res = np.asarray(solver.residuals(batch, np.asarray(xs)))
    assert np.max(res) < 1e-4


def test_pallas_band_multi_rhs_mosaic():
    from nodal_tpu.ops.pallas_band import pallas_band_solve_multi
    from nodal_tpu.ops.band import _K

    rng = np.random.default_rng(4)
    B, nb, r = 8, 3, 5
    n = nb * _K
    # random diagonally dominant block-tridiagonal band
    W = rng.standard_normal((B, nb, _K, 3 * _K)).astype(np.float32) * 0.1
    W[:, 0, :, :_K] = 0.0
    W[:, -1, :, 2 * _K:] = 0.0
    rowsum = np.abs(W).sum(-1)
    idx = np.arange(_K)
    W[:, :, idx, _K + idx] = rowsum[:, :, idx] + 1.0
    R = rng.standard_normal((B, n, r)).astype(np.float32)
    X = np.asarray(pallas_band_solve_multi(jnp.asarray(W), jnp.asarray(R)))
    # Host-side f64 reference (no CPU jax backend in the pinned-TPU run;
    # f64 LuDecomposition is unsupported on TPU): densify the band.
    A = np.zeros((B, n, n))
    for t in range(nb):
        lo = (t - 1) * _K
        for c in range(3 * _K):
            j = lo + c
            if 0 <= j < n:
                A[:, t * _K:(t + 1) * _K, j] = W[:, t, :, c]
    exp = np.linalg.solve(A, R.astype(np.float64))
    assert np.max(np.abs(X - exp)) / np.max(np.abs(exp)) < 1e-3


def test_pallas_band_stream_mosaic():
    # The grid-pipelined streaming tier (persistent scratch carry across
    # sequential grid steps, reversed index maps on the backward pass).
    from nodal_tpu.ops.pallas_band import pallas_band_solve_stream
    from nodal_tpu.ops.band import _K

    rng = np.random.default_rng(5)
    B, nb = 8, 20  # n=2560: past the VMEM-resident tier
    W = rng.standard_normal((B, nb, _K, 3 * _K)).astype(np.float32) * 0.1
    W[:, 0, :, :_K] = 0.0
    W[:, -1, :, 2 * _K:] = 0.0
    idx = np.arange(_K)
    W[:, :, idx, _K + idx] = np.abs(W).sum(-1)[:, :, idx] + 1.0
    b = rng.standard_normal((B, nb * _K)).astype(np.float32)
    x = np.asarray(pallas_band_solve_stream(jnp.asarray(W), jnp.asarray(b)))
    # host-side f64 band-matvec residual (no f64 dots on TPU)
    xb = x.astype(np.float64).reshape(B, nb, _K)
    z = np.zeros_like(xb[:, :1])
    x_lo = np.concatenate([z, xb[:, :-1]], axis=1)
    x_hi = np.concatenate([xb[:, 1:], z], axis=1)
    W64 = W.astype(np.float64)
    r = (np.einsum("bnij,bnj->bni", W64[..., :_K], x_lo)
         + np.einsum("bnij,bnj->bni", W64[..., _K:2 * _K], xb)
         + np.einsum("bnij,bnj->bni", W64[..., 2 * _K:], x_hi)
         ).reshape(B, nb * _K) - b
    assert np.max(np.abs(r)) / np.max(np.abs(b)) < 1e-4


def test_pallas_band_stream_wide_block_mosaic():
    # kb=256 blocks through the streaming kernel (the wide-band tier for
    # 3-D lattices / wide meshes) — Mosaic must tile the 256-wide matmuls.
    from nodal_tpu.ops.pallas_band import pallas_band_solve_stream

    kb = 256
    rng = np.random.default_rng(6)
    B, nb = 8, 3  # n = 768
    W = rng.standard_normal((B, nb, kb, 3 * kb)).astype(np.float32) * 0.05
    W[:, 0, :, :kb] = 0.0
    W[:, -1, :, 2 * kb:] = 0.0
    idx = np.arange(kb)
    W[:, :, idx, kb + idx] = np.abs(W).sum(-1)[:, :, idx] + 1.0
    b = rng.standard_normal((B, nb * kb)).astype(np.float32)
    x = np.asarray(pallas_band_solve_stream(jnp.asarray(W), jnp.asarray(b)))
    xb = x.astype(np.float64).reshape(B, nb, kb)
    z = np.zeros_like(xb[:, :1])
    x_lo = np.concatenate([z, xb[:, :-1]], axis=1)
    x_hi = np.concatenate([xb[:, 1:], z], axis=1)
    W64 = W.astype(np.float64)
    r = (np.einsum("bnij,bnj->bni", W64[..., :kb], x_lo)
         + np.einsum("bnij,bnj->bni", W64[..., kb:2 * kb], xb)
         + np.einsum("bnij,bnj->bni", W64[..., 2 * kb:], x_hi)
         ).reshape(B, nb * kb) - b
    assert np.max(np.abs(r)) / np.max(np.abs(b)) < 1e-4


def test_batched_tridiag_solver_end_to_end():
    # The bench fast path: band assembly + VMEM PCR under one jit.
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.batch import BatchedSolver
    from nodal_tpu.utils.gridgen import ladder_rows

    circuit = Circuit(Netlist.from_rows(ladder_rows(512)))
    solver = BatchedSolver(circuit, dtype=jnp.float32)
    assert solver.method == "tridiag"
    batch = np.tile(circuit.stamps.params, (128, 1))
    xs = solver(batch)
    res = np.asarray(solver.residuals(batch, np.asarray(xs)))
    assert np.max(res) < 1e-4


def test_batched_band_f64_on_tpu():
    # dtype=f64 on the TPU backend must route to f32 band solves + f64
    # band-space refinement (there is no f64 LU on TPU) — this regressed
    # once when the band method gated the Pallas tier on dtype==f32 and
    # fell back to an XLA scan whose f64 per-block LU cannot lower.
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.batch import BatchedSolver
    from nodal_tpu.utils.gridgen import grid_rows

    rows = list(grid_rows(9, 40, (0, 0), (8, 39)))
    rows.append(["src", "A", "1", "n1_1", "g"])
    circuit = Circuit(Netlist.from_rows(rows))
    solver = BatchedSolver(circuit, dtype=jnp.float64)
    assert solver.method == "sband"
    batch = np.tile(circuit.stamps.params, (8, 1))
    xs = solver(batch)
    res = np.asarray(solver.residuals(batch, np.asarray(xs)))
    assert np.max(res) < 1e-10  # refined: f64-level accuracy


def test_adjoint_gradient_through_band_kernel_mosaic():
    """jax.grad through the Mosaic-compiled band mega-kernel: the adjoint
    solve re-enters the same kernel with the cotangent as RHS; the
    gradient must match the host-f64 dense-autodiff oracle at the f32
    floor."""
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.batch import BatchedSolver
    from nodal_tpu.circuit import _cpu_device_or_none
    from nodal_tpu.ops.assemble import assemble_dense
    from nodal_tpu.utils.gridgen import grid_rows

    rows = list(grid_rows(9, 40, (0, 0), (8, 39)))
    rows.append(["src", "A", "1", "n1_1", "g"])
    circuit = Circuit(Netlist.from_rows(rows))
    solver = BatchedSolver(circuit, dtype=jnp.float32)
    assert solver.method == "sband"

    rng = np.random.default_rng(2)
    p = jnp.asarray(np.tile(circuit.stamps.params, (2, 1)).astype(
        np.float32) * rng.uniform(0.9, 1.1, (2, len(circuit.stamps.params))
                                  ).astype(np.float32))
    w = _f32(rng, 2, circuit.stamps.n)
    g = np.asarray(jax.grad(lambda q: jnp.sum(w * solver._solve(q)))(p))
    assert np.all(np.isfinite(g))

    cpu = _cpu_device_or_none()
    with jax.default_device(cpu), jax.enable_x64(True):

        def oracle(pi, wi):
            def f(q):
                G, b = assemble_dense(circuit.stamps, q,
                                      dtype=jnp.float64)
                return jnp.sum(wi * jnp.linalg.solve(G, b))

            return jax.grad(f)(pi)

        go = np.stack([
            np.asarray(oracle(jnp.asarray(np.asarray(p[i], np.float64)),
                              jnp.asarray(np.asarray(w[i], np.float64))))
            for i in range(2)
        ])
    rel = np.max(np.abs(g - go)) / np.max(np.abs(go))
    assert rel < 5e-4, rel


def test_refined_schur_on_tpu():
    """refine=True (and dtype=f64) on a branch-equation circuit must ride
    the f32 Schur band kernels + exact-COO f64 defect correction on TPU —
    the direct f64 XLA-scan tier cannot lower there (no f64 LU), which a
    round-3 review pass caught before it shipped."""
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.batch import BatchedSolver
    from nodal_tpu.utils.gridgen import grid_rows

    rows = list(grid_rows(9, 40, (0, 0), (8, 39)))
    rows.append(["e1", "E", "2", "1", "g"])
    rows.append(["d1", "VCCS", "0.5", "n3_3", "g", "1", "g"])
    circuit = Circuit(Netlist.from_rows(rows))

    solver = BatchedSolver(circuit, refine=True)
    assert solver.method == "schur"
    batch = np.tile(circuit.stamps.params, (4, 1))
    xs = solver(batch)
    res = np.asarray(solver.residuals(batch, np.asarray(xs)))
    assert np.max(res) < 1e-10, res  # refined: f64-level accuracy

    solver64 = BatchedSolver(circuit, dtype=jnp.float64)
    xs64 = solver64(np.tile(circuit.stamps.params, (2, 1)))
    res64 = np.asarray(solver64.residuals(
        np.tile(circuit.stamps.params, (2, 1)), np.asarray(xs64)))
    assert np.max(res64) < 1e-10, res64
