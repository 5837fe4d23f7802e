"""The refine="auto" accuracy contract (round-3 verdict item #4).

BatchedSolver's default tier must HOLD the 1e-6 accuracy north star
(BASELINE.json) instead of warning when the f32 kernels miss it: the
fused residual audit triggers exact-COO f64 defect correction on any
batch over the contract, including batches poisoned by negative Monte
Carlo draws (outside the no-pivot tiers' diagonal-dominance domain).
Clean batches must skip the escalation (checked structurally: the cond
branch taken is observable through the residual floor).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nodal_tpu import Circuit, Netlist
from nodal_tpu.batch import _CONTRACT_TOL, BatchedSolver, monte_carlo
from nodal_tpu.utils.gridgen import grid_rows, ladder_rows


def _mesh_circuit(h=25, w=40):
    rows = list(grid_rows(h, w, (0, 0), (h - 1, w - 1)))
    rows.append(["src", "A", "1", "1", "g"])
    return Circuit(Netlist.from_rows(rows))


def test_default_is_auto_and_returns_f64():
    s = BatchedSolver(_mesh_circuit())
    assert s.refine == "auto" and s._auto_escalate
    pb = np.tile(s.stamps.params, (4, 1)).astype(np.float32)
    xs = s(pb)
    assert xs.dtype == jnp.float64


def test_contract_holds_where_raw_f32_misses():
    """The bench mesh's raw f32 tier sits at ~4e-6 — over the contract —
    so the default must escalate it below 1e-6."""
    c = _mesh_circuit()
    rng = np.random.default_rng(0)
    pb = np.tile(c.stamps.params, (8, 1)).astype(np.float32)
    pb *= (1 + 0.05 * rng.standard_normal(pb.shape)).astype(np.float32)

    raw = BatchedSolver(c, refine=False)
    auto = BatchedSolver(c)
    res_raw = float(np.max(raw.residuals(pb, np.asarray(raw(pb)))))
    res_auto = float(np.max(auto.residuals(pb, np.asarray(auto(pb)))))
    assert res_raw > _CONTRACT_TOL          # the contract was really at risk
    assert res_auto <= _CONTRACT_TOL        # ...and the default held it


def test_poisoned_batch_comes_back_refined():
    """Negative draws on a few components (indefinite system, outside the
    diagonal-dominance domain) must be refined automatically — the
    pre-round-4 behavior was a log warning."""
    c = _mesh_circuit()
    rng = np.random.default_rng(3)
    B = 8
    pb = np.tile(c.stamps.params, (B, 1)).astype(np.float32)
    pb *= (1 + 0.05 * rng.standard_normal(pb.shape)).astype(np.float32)
    # Poison: flip a scattered subset of one sample's resistors negative.
    bad = rng.choice(pb.shape[1], size=25, replace=False)
    pb[2, bad] = -np.abs(pb[2, bad])

    auto = BatchedSolver(c)
    xs = np.asarray(auto(pb))
    res = auto.residuals(pb, xs)
    assert np.all(np.isfinite(xs))
    assert float(np.max(res)) <= _CONTRACT_TOL, float(np.max(res))


def test_first_defect_pass_is_unconditional():
    """Round-4 review item #2: a residual pre-gate cannot see
    κ(A)-amplified error, so the auto tier must ALWAYS run at least one
    f64 defect pass.  Observable: even a clean ladder (raw residual ~1e-8,
    under the old gate) comes back at the f64 floor."""
    c = Circuit(Netlist.from_rows(ladder_rows(64)))
    s = BatchedSolver(c)
    pb = np.tile(c.stamps.params, (4, 1)).astype(np.float32)
    res = float(np.max(s.residuals(pb, np.asarray(s(pb)))))
    assert res <= 1e-12


def _error_vs_sparse_f64_oracle(circuit, solver, pb):
    """Max relative error of solver(pb) against an independent sparse-LU
    f64 oracle (scipy splu on the host-assembled COO system)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from nodal_tpu.models.stamps import stamp_values_np

    xs = np.asarray(solver(pb), dtype=np.float64)
    worst = 0.0
    st = circuit.stamps
    for i in range(pb.shape[0]):
        g_vals, rhs_vals = stamp_values_np(st, pb[i].astype(np.float64))
        G = sp.coo_matrix(
            (g_vals, (st.g_rows, st.g_cols)), shape=(st.n, st.n)).tocsc()
        b = np.zeros(st.n)
        np.add.at(b, st.rhs_rows, rhs_vals)
        x_ref = spla.splu(G).solve(b)
        err = np.max(np.abs(xs[i] - x_ref)) / np.max(np.abs(x_ref))
        worst = max(worst, float(err))
    return worst


@pytest.mark.parametrize("n_nodes", [5000, 10000])
def test_contract_holds_in_error_at_midsize(n_nodes):
    """The north star is ERROR ≤1e-6 vs the f64 path (BASELINE.md:23).
    Round 4 measured the default tier at 5.1e-5 (n=5k) and 4.6e-4 (n=10k)
    because its gate watched the residual; the error-gated tier must put
    both under the contract while the raw tier demonstrably misses it."""
    h = 25
    rows = list(grid_rows(h, n_nodes // h, (0, 0), (h - 1, n_nodes // h - 1)))
    rows.append(["src", "A", "1", "1", "g"])
    c = Circuit(Netlist.from_rows(rows))
    rng = np.random.default_rng(1)
    pb = np.tile(c.stamps.params, (2, 1)).astype(np.float32)
    pb *= (1 + 0.05 * rng.standard_normal(pb.shape)).astype(np.float32)

    raw_err = _error_vs_sparse_f64_oracle(c, BatchedSolver(c, refine=False),
                                          pb)
    auto_err = _error_vs_sparse_f64_oracle(c, BatchedSolver(c), pb)
    assert raw_err > _CONTRACT_TOL      # the contract was really at risk...
    assert auto_err <= _CONTRACT_TOL, (raw_err, auto_err)  # ...and held


def test_monte_carlo_negative_draws_refined_not_warned(caplog):
    """The verdict's exact scenario: an MC sweep whose large tolerance
    draws negative values must come back refined (audit under the
    contract) with no accuracy warning logged."""
    import logging

    c = Circuit(Netlist.from_rows(ladder_rows(48)))
    tolerances = {f"rs{k}": 0.6 for k in range(48)}  # 60%: negative draws
    with caplog.at_level(logging.WARNING, logger="nodal_tpu.batch"):
        out = monte_carlo(c, tolerances, n=512, seed=5)
    assert float(out["max_residual"]) <= _CONTRACT_TOL
    assert not [r for r in caplog.records if "exceed residual" in r.message]


def test_gradients_flow_through_escalation():
    c = _mesh_circuit(9, 12)
    s = BatchedSolver(c)
    pb = jnp.asarray(np.tile(c.stamps.params, (2, 1)).astype(np.float32))
    g = jax.grad(lambda p: jnp.sum(s._solve(p)))(pb)
    assert np.isfinite(np.asarray(g)).all()
    # Against the f64 dense-autodiff oracle.
    from nodal_tpu.ops.assemble import assemble_dense

    def oracle(p):
        G, b = jax.vmap(
            lambda q: assemble_dense(c.stamps, q, dtype=jnp.float64)
        )(p.astype(jnp.float64))
        return jnp.sum(jnp.linalg.solve(G, b[..., None])[..., 0])

    g_ref = jax.grad(oracle)(pb.astype(jnp.float64))
    err = np.max(np.abs(np.asarray(g) - np.asarray(g_ref))) / max(
        float(np.max(np.abs(np.asarray(g_ref)))), 1.0)
    assert err < 1e-5, err
