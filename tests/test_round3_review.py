"""Round-3 mid-round code-review findings.

Each test pins one fix from the round-3 review pass: the A11 solver-cache
fingerprint, the band-plan size cliff, the dense-batch OOM guard, the
multi-probe large-n CG fallback, the singular-but-finite equiv tripwire,
and the bench module's import side effect.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from nodal_tpu import Circuit, Netlist
from nodal_tpu.batch import BatchedSolver
from nodal_tpu.utils.gridgen import grid_rows


def _symmetric_general_netlist():
    """Two ground-tied resistors in symmetric positions + an E source.

    Swapping ra/rb PERMUTES the deduped A11 value vector (the two diagonal
    entries trade places, off-diagonals are shared), so moment-based
    fingerprints (sum, sum-of-squares, length) collide while the system —
    and its solution — changes.
    """
    rows = [
        ["ra", "R", "2", "1", "g"],
        ["rb", "R", "5", "2", "g"],
        ["r13", "R", "1", "1", "3"],
        ["r23", "R", "1", "2", "3"],
        ["e1", "E", "1", "3", "g"],
    ]
    return Netlist.from_rows(rows)


def _dense_oracle(stamps, params):
    from nodal_tpu.models.stamps import stamp_values_np

    g_vals, rhs_vals = stamp_values_np(stamps, np.asarray(params, float))
    G = np.zeros((stamps.n, stamps.n))
    np.add.at(G, (stamps.g_rows, stamps.g_cols), g_vals)
    b = np.zeros(stamps.n)
    np.add.at(b, stamps.rhs_rows, rhs_vals)
    return np.linalg.solve(G, b)


def test_a11_solver_cache_keyed_by_exact_values():
    """Permuting component values must NOT hit a stale A11 solver: the old
    (sum, sumsq, len) fingerprint collides on swapped resistor values and
    the cached mv closure + AMG hierarchy then solve the wrong matrix."""
    from nodal_tpu.ops.sparse_schur import solve_general_sparse

    nl = _symmetric_general_netlist()
    c = Circuit(nl, sparse=True)
    stamps = c.stamps

    p0 = np.asarray(stamps.params, dtype=np.float64)
    x0, info0 = solve_general_sparse(stamps, p0)
    assert info0.converged
    np.testing.assert_allclose(x0, _dense_oracle(stamps, p0), atol=1e-9)

    # Swap ra <-> rb: same conductance multiset, different circuit.
    names = list(nl.components)
    ia, ib = names.index("ra"), names.index("rb")
    p1 = p0.copy()
    p1[[ia, ib]] = p1[[ib, ia]]
    x1, info1 = solve_general_sparse(stamps, p1)
    assert info1.converged
    np.testing.assert_allclose(x1, _dense_oracle(stamps, p1), atol=1e-9)
    # The two circuits genuinely differ — a stale-cache pass-through of x0
    # would not survive the oracle comparison above, but be explicit:
    assert not np.allclose(x0, x1)


def test_band_plan_survives_beyond_old_cap():
    """A 72k-node narrow mesh must still band: the round-3 planning cap
    (65,536) silently demoted it to a [B, n, n] dense tier that cannot be
    materialized.  RCM is scipy C code — planning stays cheap here."""
    from nodal_tpu.ops.band import make_band_plan

    rows = list(grid_rows(9, 8000, (0, 0), (8, 7999)))
    rows.append(["src", "A", "1", "n1_1", "g"])
    c = Circuit(Netlist.from_rows(rows))
    assert c.stamps.n > 65_536  # past the old planning cap (ground excl.)
    plan = make_band_plan(c.stamps)
    assert plan is not None and plan.nb >= 2
    solver = BatchedSolver(c)
    assert solver.method in ("band", "sband")


def test_large_unbanded_batch_raises_not_ooms():
    """Auto-selection must refuse the dense tier for big circuits with no
    banded structure instead of silently vmapping an n^2 factorization."""
    rng = np.random.default_rng(0)
    n = 17_000
    rows = [["rg", "R", "1", "n0", "g"]]
    # Random long-range edges: RCM cannot compress the bandwidth.
    for i in range(n - 1):
        rows.append([f"rc{i}", "R", "1", f"n{i}", f"n{i + 1}"])
    for k, j in enumerate(rng.integers(0, n, size=4000)):
        i = int((j * 7919 + 13) % n)
        if i != int(j):
            rows.append([f"rl{k}", "R", "1", f"n{j}", f"n{i}"])
    c = Circuit(Netlist.from_rows(rows))
    with pytest.raises(ValueError, match="dense batch tier"):
        BatchedSolver(c)


def test_equiv_many_large_unbanded_falls_to_cg(monkeypatch):
    """Above the dense bound with no band plan, the multi-probe path must
    solve per-pair with preconditioned CG, not assemble an [n, n] dense."""
    import nodal_tpu.equiv as equiv_mod
    import nodal_tpu.ops.band as band_mod

    rows = [
        ["r1", "R", "1", "1", "2"],
        ["r2", "R", "1", "2", "g"],
        ["r3", "R", "2", "1", "g"],
    ]
    nl = Netlist.from_rows(rows)
    ref = equiv_mod.equivalent_resistance_many(nl, [("1", "g"), ("2", "g")])

    monkeypatch.setattr(band_mod, "band_plan", lambda stamps: None)
    monkeypatch.setattr(equiv_mod, "_DENSE_MANY_MAX_N", 2)
    out = equiv_mod.equivalent_resistance_many(
        nl, [("1", "g"), ("2", "g")])
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_equiv_floating_probe_raises_even_when_garbage_is_finite():
    """A no-pivot solve of an exactly-singular system can return FINITE
    garbage (tiny rounding pivot) with a tiny backward error — the
    amplification tripwire must still route it to the connectivity
    diagnosis instead of returning a silent multi-gigaohm R_eq."""
    from nodal_tpu.equiv import equivalent_resistance_many
    from nodal_tpu.netlist import UnconnectedCircuitError

    rows = [
        ["rm", "R", "1", "1", "g"],
        # Floating chain with non-representable conductances: elimination
        # pivots cancel to rounding noise, not exact zero.
        ["rf1", "R", "0.333333333333333", "2", "3"],
        ["rf2", "R", "0.142857142857143", "3", "4"],
        ["rf3", "R", "0.090909090909091", "4", "2"],
    ]
    nl = Netlist.from_rows(rows)
    with pytest.raises(UnconnectedCircuitError):
        equivalent_resistance_many(nl, [("2", "3")])
    with pytest.raises(UnconnectedCircuitError):
        equivalent_resistance_many(nl, [("2", "3")], dtype=jnp.float32)


def test_equiv_connected_huge_resistance_still_passes():
    """The tripwire may only DIAGNOSE, never reject a connected netlist:
    enormous-but-legitimate R_eq values pass through."""
    from nodal_tpu.equiv import equivalent_resistance_many

    rows = [
        ["r1", "R", "1e12", "1", "2"],
        ["r2", "R", "1e12", "2", "g"],
        ["r3", "R", "1e-6", "1", "3"],
        ["r4", "R", "1e-6", "3", "g"],
    ]
    nl = Netlist.from_rows(rows)
    out = equivalent_resistance_many(nl, [("1", "g")])
    assert np.isfinite(out).all()
    # Parallel branches: (2e12 * 2e-6) / (2e12 + 2e-6) ~= 2e-6.
    np.testing.assert_allclose(out[0], 2e-6, rtol=1e-6)


def test_import_bench_has_no_side_effects():
    """`import bench` must not re-exec the importing process (the re-exec
    exists to set XLA log env vars before jax loads — script runs only)."""
    code = "import bench; print('imported-ok')"
    repo_root = pathlib.Path(__file__).resolve().parents[1]
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600, cwd=repo_root)
    assert res.returncode == 0, res.stderr
    assert "imported-ok" in res.stdout
