"""Scalar banded LDLᵀ tier: plan, assembly, scan solver, Pallas kernel.

The scalar tier replaces the kb=128 block-Thomas path on narrow bands
(ops/scalar_band.py); these tests pin its numerics to the dense f64
oracle and the kernel (interpret mode on CPU) to the scan reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nodal_tpu import Circuit, Netlist
from nodal_tpu.models.stamps import compile_stamps
from nodal_tpu.ops.assemble import assemble_dense
from nodal_tpu.ops.scalar_band import (
    make_scalar_band_plan,
    sband_matvec,
    sband_plan,
    scalar_band_solve_scan,
)
from nodal_tpu.utils.gridgen import grid_rows, ladder_rows


def _mesh(h, w, with_src=True):
    rows = list(grid_rows(h, w, (0, 0), (h - 1, w - 1)))
    if with_src:
        rows.append(["src", "A", "1", "1", "g"])
    return Circuit(Netlist.from_rows(rows))


def test_plan_shape_and_band():
    c = _mesh(13, 17)
    plan = make_scalar_band_plan(c.stamps)
    assert plan is not None
    assert plan.n == c.stamps.n
    assert plan.n_pad % 8 == 0
    # RCM bandwidth of an h×w grid is ~min(h,w)+1
    assert plan.w <= 15
    assert plan.W1 == plan.w + 1


def test_assembly_matches_dense():
    c = _mesh(9, 11)
    st = c.stamps
    plan = make_scalar_band_plan(st)
    U, b = jax.tree.map(
        np.asarray, plan.assemble(st, st.params, dtype=jnp.float64)
    )
    G, A = jax.tree.map(
        np.asarray, assemble_dense(st, st.params, dtype=jnp.float64)
    )
    Gp = G[np.ix_(plan.order, plan.order)]
    for k in range(plan.W1):
        d = np.diagonal(Gp, k)
        np.testing.assert_allclose(U[: len(d), k], d, atol=0)
    # pad rows: unit diagonal
    assert np.all(U[plan.n:, 0] == 1.0)
    assert np.all(U[plan.n:, 1:] == 0.0)
    bp = np.zeros(plan.n_pad)
    bp[: plan.n] = A[plan.order]
    np.testing.assert_allclose(b, bp, atol=0)


def test_scan_solver_vs_dense_f64():
    c = _mesh(9, 23)
    st = c.stamps
    plan = make_scalar_band_plan(st)
    with jax.enable_x64(True):
        U, b = plan.assemble(st, st.params, dtype=jnp.float64)
        x = plan.unpermute(scalar_band_solve_scan(U, b))
        G, A = assemble_dense(st, st.params, dtype=jnp.float64)
    x_ref = np.linalg.solve(np.asarray(G), np.asarray(A))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-12, atol=1e-12)


def test_scan_solver_multi_rhs_and_batch():
    c = _mesh(7, 9)
    st = c.stamps
    plan = make_scalar_band_plan(st)
    with jax.enable_x64(True):
        U, b = plan.assemble(st, st.params, dtype=jnp.float64)
        x1 = scalar_band_solve_scan(U, b)
        x2 = scalar_band_solve_scan(U, jnp.stack([b, 3.0 * b], axis=-1))
        xb = scalar_band_solve_scan(
            jnp.stack([U, 2.0 * U]), jnp.stack([b, b])
        )
    np.testing.assert_allclose(np.asarray(x2[:, 0]), np.asarray(x1),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(x2[:, 1]), 3 * np.asarray(x1),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xb[1]), np.asarray(x1) / 2,
                               rtol=1e-12)


def test_sband_matvec_roundtrip():
    c = _mesh(6, 8)
    st = c.stamps
    plan = make_scalar_band_plan(st)
    with jax.enable_x64(True):
        U, b = plan.assemble(st, st.params, dtype=jnp.float64)
        x = scalar_band_solve_scan(U, b)
        r = sband_matvec(U, x) - b
    assert float(jnp.abs(r).max()) < 1e-12


def test_pallas_kernel_interpret_matches_scan():
    """Interpret-mode run of the TPU kernel against the f64 scan (small
    case: interpret executes per-op in Python)."""
    from nodal_tpu.ops.pallas_scalar_band import pallas_scalar_band_solve

    c = _mesh(5, 6)
    st = c.stamps
    plan = make_scalar_band_plan(st)
    B = 3
    rng = np.random.default_rng(7)
    pb = st.params[None] * rng.uniform(0.9, 1.1, (B, len(st.params)))
    U, b = jax.vmap(
        lambda p: plan.assemble(st, p, dtype=jnp.float32)
    )(jnp.asarray(pb, jnp.float32))
    x = np.asarray(pallas_scalar_band_solve(U, b))
    with jax.enable_x64(True):
        xr = np.asarray(
            scalar_band_solve_scan(
                jnp.asarray(np.asarray(U), jnp.float64),
                jnp.asarray(np.asarray(b), jnp.float64),
            )
        )
    assert np.abs(x - xr).max() / np.abs(xr).max() < 1e-5


def test_plan_rejects_unsymmetric_and_wide():
    # Branch equations (E source) break symmetry of the full system.
    rows = list(grid_rows(5, 6, (0, 0), (4, 5)))
    rows.append(["e1", "E", "1", "1", "g"])
    st = Circuit(Netlist.from_rows(rows)).stamps
    assert make_scalar_band_plan(st) is None
    # Too-wide band: max_w gate.
    c = _mesh(30, 30)
    assert make_scalar_band_plan(c.stamps, max_w=8) is None


def test_plan_cached_on_stamps():
    c = _mesh(5, 5)
    p1 = sband_plan(c.stamps)
    p2 = sband_plan(c.stamps)
    assert p1 is p2 and p1 is not None


def test_ladder_prefers_natural_order():
    """A chain is already bandwidth-1; the plan must keep the natural
    ordering (w <= 2) rather than degrade it."""
    c = Circuit(Netlist.from_rows(ladder_rows(64)))
    plan = make_scalar_band_plan(c.stamps)
    assert plan is not None and plan.w <= 2


def test_stream_kernel_interpret_multi_chunk(monkeypatch):
    """Streaming tier crosses chunk boundaries correctly (interpret mode,
    chunk forced small so a ~200-row case spans several chunks)."""
    from nodal_tpu.ops import pallas_scalar_band as psb

    monkeypatch.setattr(psb, "_stream_chunk", lambda W1a: 64)
    rows = list(grid_rows(7, 30, (0, 0), (6, 29)))
    rows.append(["src", "A", "1", "1", "g"])
    st = Circuit(Netlist.from_rows(rows)).stamps
    plan = make_scalar_band_plan(st)
    B = 2
    rng = np.random.default_rng(3)
    pb = st.params[None] * rng.uniform(0.9, 1.1, (B, len(st.params)))
    U, b = jax.vmap(
        lambda p: plan.assemble(st, p, dtype=jnp.float32)
    )(jnp.asarray(pb, jnp.float32))
    R = jnp.stack([b, -2.0 * b], axis=-1)
    xs = np.asarray(psb.pallas_scalar_band_solve_stream_multi(U, R))
    with jax.enable_x64(True):
        xr = np.asarray(
            scalar_band_solve_scan(
                jnp.asarray(np.asarray(U), jnp.float64),
                jnp.asarray(np.asarray(b), jnp.float64),
            )
        )
    scale = np.abs(xr).max()
    assert np.abs(xs[..., 0] - xr).max() / scale < 1e-4
    assert np.abs(xs[..., 1] + 2 * xr).max() / scale < 1e-4


def test_midsize_mesh_routes_to_sband():
    """Past the VMEM tier the sband method stays selected (streaming
    kernel on TPU; scan elsewhere) — residuals at f64 via refinement."""
    from nodal_tpu.batch import BatchedSolver

    rows = list(grid_rows(5, 800, (0, 0), (4, 799)))  # n=4000, w ~ 6
    rows.append(["src", "A", "1", "1", "g"])
    c = Circuit(Netlist.from_rows(rows))
    solver = BatchedSolver(c, dtype=jnp.float64)
    assert solver.method == "sband"
    pb = np.tile(c.stamps.params, (2, 1))
    xs = np.asarray(solver(pb))
    res = np.asarray(solver.residuals(pb, xs))
    assert res.max() < 1e-10
