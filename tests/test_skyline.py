"""Native skyline LDLᵀ direct tier (cpp/skyline.cpp + ops/skyline.py).

Round-5 addition: the SuperLU-role host tier — RCM + profile LDLᵀ — that
now fronts the bordered elimination's backend chain.  Unit tests check
the factorization against scipy oracles; integration tests check tier
routing, fallback on infeasible profiles / non-SPD pivots, and that the
CG tiers still work when the native tier is disabled.
"""

import numpy as np
import pytest

from nodal_tpu import Circuit, Netlist
from nodal_tpu.ops import skyline
from nodal_tpu.utils.gridgen import grid_rows

pytestmark = pytest.mark.skipif(
    not skyline.available(), reason="native toolchain unavailable")


def _laplacian(h, w, seed=0, grounded=True):
    rng = np.random.default_rng(seed)
    n = h * w
    rows, cols, vals = [], [], []

    def add(a, b, g):
        rows.extend([a, b, a, b])
        cols.extend([a, b, b, a])
        vals.extend([g, g, -g, -g])

    for i in range(h):
        for j in range(w):
            k = i * w + j
            if i + 1 < h:
                add(k, k + w, rng.uniform(0.5, 2.0))
            if j + 1 < w:
                add(k, k + 1, rng.uniform(0.5, 2.0))
    if grounded:
        for k in range(0, n, 7):
            rows.append(k)
            cols.append(k)
            vals.append(rng.uniform(0.5, 2.0))
    return n, np.array(rows), np.array(cols), np.array(vals)


def test_factor_solve_matches_scipy():
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    n, rows, cols, vals = _laplacian(13, 17, seed=1)
    plan = skyline.plan_skyline(n, rows, cols)
    assert plan is not None and plan.profile_nnz > 0
    fact = skyline.factor(plan, rows, cols, vals)
    assert fact is not None
    rng = np.random.default_rng(2)
    B = rng.standard_normal((5, n))
    X = skyline.solve(fact, B)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()
    X_ref = spla.splu(A).solve(B.T).T
    assert np.max(np.abs(X - X_ref)) / np.max(np.abs(X_ref)) < 1e-10
    # 1-D RHS convenience form.
    x1 = skyline.solve(fact, B[0])
    np.testing.assert_allclose(x1, X[0])


def test_non_spd_pivot_returns_none():
    n, rows, cols, vals = _laplacian(6, 6, seed=3)
    # Flip one node's ground conductance hard negative: indefinite by
    # construction, so some pivot must go non-positive.
    rows = np.append(rows, 8)
    cols = np.append(cols, 8)
    vals = np.append(vals, -100.0)
    plan = skyline.plan_skyline(n, rows, cols)
    assert skyline.factor(plan, rows, cols, vals) is None


def test_profile_caps_reject():
    n, rows, cols, _ = _laplacian(10, 10)
    assert skyline.plan_skyline(n, rows, cols, max_nnz=10) is None
    assert skyline.plan_skyline(n, rows, cols, max_flops=10.0) is None


def _mesh_with_sources(h=12, w=12):
    rows = list(grid_rows(h, w))
    rows.append(["e0", "E", "1.5", "n0_1", "g"])
    rows.append(["d0", "VCCS", "0.3", f"n{h // 2}_2", "g", "n0_1", "g"])
    return Netlist.from_rows(rows)


def test_sparse_route_uses_skyline_and_matches_dense():
    c = Circuit(_mesh_with_sources(), sparse=True, dtype=np.float64)
    sol = c.solve()
    assert sol.stats["method"].endswith("schur-skyline")
    dense = Circuit(_mesh_with_sources(), dtype=np.float64).solve()
    err = np.max(np.abs(sol.result - dense.result)) / np.max(
        np.abs(dense.result))
    assert err < 1e-10
    assert sol.stats["residual"] < 1e-12


def test_cg_tier_still_works_with_skyline_disabled(monkeypatch):
    monkeypatch.setenv("NODAL_TPU_NO_SKYLINE", "1")
    nl = _mesh_with_sources()
    c = Circuit(nl, sparse=True, dtype=np.float64)
    sol = c.solve()
    assert "skyline" not in sol.stats["method"]
    dense = Circuit(_mesh_with_sources(), dtype=np.float64).solve()
    err = np.max(np.abs(sol.result - dense.result)) / np.max(
        np.abs(dense.result))
    assert err < 1e-8


def test_transpose_solve_shares_factorization():
    from nodal_tpu.models.stamps import compile_stamps, stamp_values_np
    from nodal_tpu.ops.sparse_schur import (
        solve_general_auto, solve_general_auto_transpose)

    nl = _mesh_with_sources()
    stamps = compile_stamps(nl)
    rng = np.random.default_rng(4)
    chat = rng.standard_normal(stamps.n)
    y, info = solve_general_auto_transpose(stamps, rhs=chat, tol=1e-11)
    assert bool(info.converged) and "skyline" in info.method
    g_vals, _ = stamp_values_np(stamps, np.asarray(stamps.params, float))
    z = np.zeros(stamps.n)
    np.add.at(z, stamps.g_cols.astype(np.int64),
              g_vals * y[stamps.g_rows.astype(np.int64)])
    rel = np.max(np.abs(chat - z)) / np.max(np.abs(chat))
    assert rel < 1e-10
    # Forward solve reuses the same cached factorization object.
    x, info_f = solve_general_auto(stamps, tol=1e-11)
    assert bool(info_f.converged) and "skyline" in info_f.method


def _vccs_border_netlist(h=10, w=20, m=24):
    rows = list(grid_rows(h, w))
    rows.append(["rg", "R", "1", "n0_0", "g"])
    rows.append(["src", "A", "1", f"n{h // 2}_{w // 2}", "g"])
    for k in range(m):
        i, j = k % (h - 1), (k * 7) % (w - 1)
        ci, cj = (k * 3) % h, (k * 11) % w
        rows.append([f"d{k}", "VCCS", "0.01", f"n{i}_{j}", "g",
                     f"n{ci}_{cj}", "g"])
    return Netlist.from_rows(rows)


def test_border_over_iterative_cap_solves_via_native(monkeypatch):
    """Round-4 verdict Missing #1: a controlled-source border beyond the
    iterative-tier cap must solve through the native direct tier instead
    of raising.  Shrunk twin of the bench_big_border_vccs stage (caps
    monkeypatched so 24 VCCS rows stand in for 8192)."""
    from nodal_tpu.models.stamps import stamp_values_np
    from nodal_tpu.ops import sparse_schur as ss

    monkeypatch.setattr(ss, "_BORDER_CAP", 8)
    nl = _vccs_border_netlist()
    c = Circuit(nl, sparse=True, dtype=np.float64)
    sol = c.solve()
    assert sol.stats["method"].endswith("schur-skyline")
    st = c.stamps
    g_vals, rhs_vals = stamp_values_np(st, st.params)
    b = np.zeros(st.n)
    np.add.at(b, st.rhs_rows, rhs_vals)
    y = np.zeros(st.n)
    np.add.at(y, st.g_rows.astype(np.int64),
              g_vals * sol.result[st.g_cols.astype(np.int64)])
    rel = np.max(np.abs(b - y)) / np.max(np.abs(b))
    assert rel <= 1e-9, rel


def test_border_over_cap_without_native_raises(monkeypatch):
    """The loud refusal survives for the case no tier can serve: border
    over the iterative cap AND the native tier disabled."""
    from nodal_tpu.ops import sparse_schur as ss

    monkeypatch.setattr(ss, "_BORDER_CAP", 8)
    monkeypatch.setenv("NODAL_TPU_NO_SKYLINE", "1")
    nl = _vccs_border_netlist()
    c = Circuit(nl, sparse=True, dtype=np.float64)
    with pytest.raises((ValueError, np.linalg.LinAlgError)):
        c.solve()


def test_resistive_sparse_oneshot_routes_through_skyline(monkeypatch):
    """Round 5: the purely resistive `-s` path (solver CLI, equiv probes)
    prefers the native direct tier — zero XLA compile on the cold path —
    and falls back to Krylov when disabled."""
    rows = list(grid_rows(8, 9, (0, 0), (7, 8)))
    rows.append(["src", "A", "1", "1", "g"])
    nl = Netlist.from_rows(rows)
    sol = Circuit(nl, sparse=True, dtype=np.float64).solve()
    assert sol.stats["method"] == "skyline"
    dense = Circuit(Netlist.from_rows(rows), dtype=np.float64).solve()
    err = np.max(np.abs(sol.result - dense.result)) / np.max(
        np.abs(dense.result))
    assert err < 1e-10 and sol.stats["residual"] < 1e-12

    monkeypatch.setenv("NODAL_TPU_NO_SKYLINE", "1")
    sol2 = Circuit(Netlist.from_rows(rows), sparse=True,
                   dtype=np.float64).solve()
    assert sol2.stats["method"] != "skyline"
    err2 = np.max(np.abs(sol2.result - dense.result)) / np.max(
        np.abs(dense.result))
    assert err2 < 1e-8


def test_pivot_failure_memoized_and_falls_back(monkeypatch):
    """A value vector that breaks SPD must fall back to the CG tiers once
    and remember the failure (no re-factorization per warm solve)."""
    from nodal_tpu.models.stamps import compile_stamps
    from nodal_tpu.ops import sparse_schur as ss

    nl = _mesh_with_sources(6, 6)
    stamps = compile_stamps(nl)

    calls = {"n": 0}
    orig = skyline.factor

    def counting_factor(*a, **k):
        calls["n"] += 1
        return None  # simulate a pivot failure

    monkeypatch.setattr(skyline, "factor", counting_factor)
    x, info = ss.solve_general_auto(stamps, tol=1e-9)
    assert bool(info.converged) and "skyline" not in info.method
    x2, _ = ss.solve_general_auto(stamps, tol=1e-9)
    assert calls["n"] == 1  # second solve did not retry the factor
    monkeypatch.setattr(skyline, "factor", orig)
