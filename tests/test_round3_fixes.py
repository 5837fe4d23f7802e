"""Round-3 review items: lifted Schur cap, cache salt, advisor fixes."""

import numpy as np
import pytest

import jax.numpy as jnp

from nodal_tpu import Circuit, Netlist
from nodal_tpu.batch import BatchedSolver, _schur_supported, monte_carlo
from nodal_tpu.utils.gridgen import grid_rows, ladder_rows


def _branchy_mesh(h, w):
    rows = list(grid_rows(h, w, (0, 0), (h - 1, w - 1)))
    rows.append(["e1", "E", "2", "1", "g"])
    rows.append(["d1", "VCCS", "0.5", "n3_3", "g", "1", "g"])
    return Netlist.from_rows(rows)


def test_schur_probe_beyond_8192_banded():
    """The SPD probe must clear nk > 8192 via banded Cholesky (round-2
    review item #5: circuits past the old cap fell to pivoted LU)."""
    c = Circuit(_branchy_mesh(25, 400))  # nk = 10,000
    assert c.stamps.n_kcl > 8192
    assert _schur_supported(c.stamps)
    solver = BatchedSolver(c, dtype=jnp.float32)
    assert solver.method == "schur"

    B = 2
    pb = np.tile(c.stamps.params, (B, 1))
    xs = np.asarray(solver(pb))
    res = np.asarray(solver.residuals(pb, xs))
    assert res.max() < 1e-4, res


def test_schur_probe_rejects_source_held_node_at_scale():
    """A node held only by a voltage source keeps the node block singular;
    the banded probe must reject it (no silent-wrong no-pivot solve)."""
    rows = list(grid_rows(25, 400, (0, 0), (24, 399)))
    rows.append(["ef", "E", "1", "floaty", "g"])  # resistor-free node
    rows.append(["d1", "VCCS", "0.5", "n3_3", "g", "1", "g"])
    c = Circuit(Netlist.from_rows(rows))
    assert not _schur_supported(c.stamps)


def test_monte_carlo_exact_audit():
    """audit='exact' recomputes residuals in host f64 (round-2 advisor:
    callers of the pre-round-2 exact number need an opt-in)."""
    c = Circuit(Netlist.from_rows(ladder_rows(64)))
    out = monte_carlo(c, {"rs0": 0.05, "rp3": 0.05}, n=32, seed=1,
                      audit="exact")
    exact = out["max_residual"]
    out_fused = monte_carlo(c, {"rs0": 0.05, "rp3": 0.05}, n=32, seed=1)
    assert np.isfinite(exact)
    assert exact < 1e-5
    # Exact f64 audit agrees with the fused sweep-precision one on the
    # same draws.  Since round 5 the default tier defect-corrects every
    # batch, so BOTH numbers sit at the f64 noise floor — the ratio check
    # needs an absolute floor-level slack (two independently-rounded
    # ~1e-13 audits can differ by more than 1.5x).
    assert exact <= out_fused["max_residual"] * 1.5 + 1e-10


def test_equiv_many_gate_scale_invariant():
    """The equivalent_resistance_many residual gate normalizes by solution
    scale (round-2 advisor: raw absolute residual misfires on big-R
    netlists — ||X|| ~ R inflates the residual past a fixed tol)."""
    from nodal_tpu.equiv import equivalent_resistance_many

    rows = []
    for k in range(32):
        rows.append([f"rs{k}", "R", "1e9", f"n{k}", f"n{k + 1}"])
        rows.append([f"rp{k}", "R", "1e9", f"n{k}", "g"])
    nl = Netlist.from_rows(rows)
    vals = equivalent_resistance_many(
        nl, [("n0", "g"), ("n5", "g")], dtype=jnp.float32
    )
    assert np.all(np.isfinite(vals))
    ref = equivalent_resistance_many(nl, [("n0", "g"), ("n5", "g")])
    assert np.allclose(vals, ref, rtol=1e-3)


def test_band_plan_size_short_circuit():
    """Band planning must bail immediately on very large unknowns counts
    (round-2 advisor: O(nnz) interpreter time during auto-selection)."""
    from nodal_tpu.ops.band import _BAND_PLAN_MAX_N, make_band_plan
    from nodal_tpu.models.stamps import StampTensors

    n = _BAND_PLAN_MAX_N + 1
    stamps = StampTensors(
        n=n, n_kcl=n,
        g_rows=np.zeros(1, np.int32), g_cols=np.zeros(1, np.int32),
        g_coeff=np.ones(1), g_p1=np.zeros(1, np.int32),
        g_e1=np.zeros(1, np.int8), g_p2=np.zeros(1, np.int32),
        g_e2=np.zeros(1, np.int8),
        rhs_rows=np.zeros(0, np.int32), rhs_coeff=np.zeros(0),
        rhs_p1=np.zeros(0, np.int32), rhs_e1=np.zeros(0, np.int8),
        rhs_p2=np.zeros(0, np.int32), rhs_e2=np.zeros(0, np.int8),
        params=np.ones(1),
    )
    assert make_band_plan(stamps) is None


def test_failure_surface_at_scale_real_circuit():
    """Round-2 review item #7: a REAL (no monkeypatching) singular general
    circuit beyond the old 16,384-unknown dense-rescue cap must raise the
    typed error cleanly — previously that size returned NaN + logged error
    only via a monkeypatched unit test."""
    from numpy.linalg import LinAlgError

    rows = list(grid_rows(25, 800, (0, 0), (24, 799)))  # 20k nodes
    rows.append(["e1", "E", "2", "1", "g"])
    # Island tied in only through a VCCS output: connected graph, singular
    # G (island potential free up to a constant).
    rows.append(["ri", "R", "1", "x1", "x2"])
    rows.append(["dv", "VCCS", "0.5", "x1", "g", "1", "g"])
    nl = Netlist.from_rows(rows)
    c = Circuit(nl, sparse=True)
    assert c.stamps.n > 16384
    with pytest.raises(LinAlgError):
        c.solve()


def test_residual_warning_two_level_gate(caplog):
    """Round-2 review "What's weak" #2: an f32 solve can be ~1% wrong yet
    clear the 3e-2 singularity ceiling silently.  Residuals above 1e-4 now
    log a warning and mark the Solution stats, while still returning the
    answer (the gate's failure ceiling is unchanged)."""
    import logging

    c = Circuit(Netlist.from_rows(ladder_rows(16)))
    fn = c._solve_dense

    def degraded(params):
        x, _res, method = fn(params)
        return x, 1e-3, method  # in (warn=1e-4, fail=3e-2): keep + warn

    c._solve_dense = degraded
    with caplog.at_level(logging.WARNING, logger="nodal_tpu.circuit"):
        sol = c.solve()
    assert sol.stats.get("accuracy_warning") is True
    assert any("degraded" in r.message for r in caplog.records)

    # A clean solve neither warns nor marks the stats.
    c2 = Circuit(Netlist.from_rows(ladder_rows(16)))
    with caplog.at_level(logging.WARNING, logger="nodal_tpu.circuit"):
        sol2 = c2.solve()
    assert "accuracy_warning" not in sol2.stats
