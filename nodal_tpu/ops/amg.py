"""Algebraic multigrid (smoothed aggregation) for general resistive
networks.

The matrix-free geometric multigrid (ops/grid.py) only applies to uniform
grids; arbitrary resistive netlists solve through the COO path, where plain
Jacobi-CG needs O(diameter) iterations.  This module builds a
smoothed-aggregation AMG hierarchy on the host — greedy neighborhood
aggregation, tentative piecewise-constant prolongation smoothed by one
damped-Jacobi step (``P = (I − ω D⁻¹A) P_tent``), exact Galerkin coarse
operators — and applies the V-cycle on device with segment-sum transfers
and weighted-Jacobi smoothing.  Smoothing the prolongator roughly halves
the CG iteration count over unsmoothed aggregation on irregular networks
(the classic SA result); set ``smooth_prolongation=False`` to get the
round-1 unsmoothed hierarchy.

Host setup uses scipy.sparse for the Galerkin triple product only; the
device path is pure JAX.  Setup is value-dependent, so each hierarchy
belongs to one parameter vector (Circuit.solve's single solve — exactly
where it's needed).

The V(1,1) cycle with symmetric smoothing and Galerkin coarse operators is
SPD, so plain (non-flexible) CG remains valid.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

_JACOBI_OMEGA = 0.7
#: Damping for the prolongator smoother: ω = 4/(3 λmax(D⁻¹A)); λmax ≤ 2
#: for Laplacian-like matrices, so 2/3 is the standard safe choice.
_P_SMOOTH_OMEGA = 2.0 / 3.0
#: Revert a level to the tentative (unsmoothed) prolongator when the
#: smoothed Galerkin operator's nnz exceeds this multiple of the fine
#: level's — on mesh-like graphs the ratio is ~2.2 and smoothing cuts CG
#: iterations ~5x; on expander-like graphs it blows past 25x while the
#: iteration count barely moves (measured on 200x200 weighted mesh: 82->16
#: iters; random ring+chords graph: 12->11 iters at 26x the memory).
_SA_FILL_CAP = 4.0
_COARSEST_N = 256
_COARSE_SWEEPS = 64
_MAX_LEVELS = 12


@dataclass(frozen=True)
class _Level:
    n: int
    rows: np.ndarray  # int32[nnz], row-sorted
    cols: np.ndarray
    vals: np.ndarray  # float64[nnz]
    diag: np.ndarray  # float64[n]
    # Prolongator COO (None at the coarsest level), row-sorted.
    p_rows: np.ndarray | None
    p_cols: np.ndarray | None
    p_vals: np.ndarray | None
    n_coarse: int


def _aggregate(n: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Greedy neighborhood aggregation: each seed swallows its unassigned
    neighbors; leftovers join a neighboring aggregate."""
    neighbors_start, neighbors = _adjacency(n, rows, cols)
    agg = np.full(n, -1, dtype=np.int32)
    next_agg = 0
    for v in range(n):
        if agg[v] >= 0:
            continue
        nbrs = neighbors[neighbors_start[v]:neighbors_start[v + 1]]
        if np.all(agg[nbrs] >= 0) and len(nbrs):
            agg[v] = agg[nbrs[0]]  # orphan joins a neighbor
            continue
        agg[v] = next_agg
        free = nbrs[agg[nbrs] < 0]
        agg[free] = next_agg
        next_agg += 1
    return agg


def _adjacency(n, rows, cols):
    off = rows != cols
    r, c = rows[off], cols[off]
    order = np.argsort(r, kind="stable")
    r, c = r[order], c[order]
    start = np.searchsorted(r, np.arange(n + 1))
    return start.astype(np.int64), c


def build_hierarchy(n, rows, cols, vals, *,
                    smooth_prolongation: bool = True) -> list[_Level]:
    """Host-side AMG setup from deduped COO (numpy float64 values)."""
    rows = np.asarray(rows, np.int32)
    cols = np.asarray(cols, np.int32)
    vals = np.asarray(vals, np.float64)
    levels: list[_Level] = []
    for _ in range(_MAX_LEVELS):
        diag = np.zeros(n)
        on_diag = rows == cols
        np.add.at(diag, rows[on_diag], vals[on_diag])
        if n <= _COARSEST_N:
            levels.append(_Level(n, rows, cols, vals, diag,
                                 None, None, None, 0))
            break
        agg = _aggregate(n, rows, cols)
        n_coarse = int(agg.max()) + 1
        if n_coarse >= n:  # no coarsening progress; stop
            levels.append(_Level(n, rows, cols, vals, diag,
                                 None, None, None, 0))
            break

        A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
        P_tent = sp.csr_matrix(
            (np.ones(n), (np.arange(n), agg)), shape=(n, n_coarse)
        )
        P = P_tent
        if smooth_prolongation:
            dinv = np.where(diag != 0, 1.0 / np.where(diag == 0, 1.0, diag),
                            1.0)
            # P <- (I - ω D⁻¹ A) P_tent: spreads each aggregate's basis
            # function over its neighbors, so the coarse space captures
            # smooth error the piecewise-constant space misses.
            P = P_tent - sp.diags(_P_SMOOTH_OMEGA * dinv) @ (A @ P_tent)
        Ac = (P.T @ A @ P).tocoo()
        Ac.eliminate_zeros()
        if smooth_prolongation and Ac.nnz > _SA_FILL_CAP * max(A.nnz, 1):
            # Expander-like level: smoothing buys nothing and the Galerkin
            # fill compounds down the hierarchy — revert to tentative.
            P = P_tent
            Ac = (P.T @ A @ P).tocoo()
            Ac.eliminate_zeros()

        Pc = P.tocoo()
        order = np.argsort(
            Pc.row.astype(np.int64) * n_coarse + Pc.col, kind="stable"
        )
        levels.append(_Level(
            n, rows, cols, vals, diag,
            Pc.row[order].astype(np.int32),
            Pc.col[order].astype(np.int32),
            Pc.data[order],
            n_coarse,
        ))

        order = np.argsort(
            Ac.row.astype(np.int64) * n_coarse + Ac.col, kind="stable"
        )
        rows = Ac.row[order].astype(np.int32)
        cols = Ac.col[order].astype(np.int32)
        vals = Ac.data[order]
        n = n_coarse
    return levels


def make_amg_preconditioner(levels: list[_Level], dtype):
    """Device-side V(1,1) application closure for the host hierarchy."""

    dev = [
        {
            "rows": jnp.asarray(lv.rows),
            "cols": jnp.asarray(lv.cols),
            "vals": jnp.asarray(lv.vals, dtype=dtype),
            "dinv": jnp.asarray(
                np.where(lv.diag != 0, 1.0 / np.where(lv.diag == 0, 1.0,
                                                      lv.diag), 1.0),
                dtype=dtype,
            ),
            "p_rows": None if lv.p_rows is None else jnp.asarray(lv.p_rows),
            "p_cols": None if lv.p_cols is None else jnp.asarray(lv.p_cols),
            "p_vals": (None if lv.p_vals is None
                       else jnp.asarray(lv.p_vals, dtype=dtype)),
            "n": lv.n,
            "nc": lv.n_coarse,
        }
        for lv in levels
    ]

    def matvec(lv, x):
        prods = lv["vals"] * x[lv["cols"]]
        return jax.ops.segment_sum(
            prods, lv["rows"], num_segments=lv["n"], indices_are_sorted=True
        )

    def smooth(lv, x, r):
        return x + _JACOBI_OMEGA * lv["dinv"] * (r - matvec(lv, x))

    def restrict(lv, res):
        # P^T res: scatter fine contributions into coarse slots.
        prods = lv["p_vals"] * res[lv["p_rows"]]
        return jax.ops.segment_sum(prods, lv["p_cols"],
                                   num_segments=lv["nc"])

    def prolong(lv, xc):
        # P xc: gather coarse values, weight, sum per fine row (sorted).
        prods = lv["p_vals"] * xc[lv["p_cols"]]
        return jax.ops.segment_sum(
            prods, lv["p_rows"], num_segments=lv["n"],
            indices_are_sorted=True,
        )

    def vcycle(r, i):
        lv = dev[i]
        if lv["p_rows"] is None:
            x = jnp.zeros_like(r)
            for _ in range(2):
                x = smooth(lv, x, r)

            def body(_, x):
                return smooth(lv, x, r)

            return jax.lax.fori_loop(0, _COARSE_SWEEPS, body, x)
        x = _JACOBI_OMEGA * lv["dinv"] * r  # one sweep from zero
        res = r - matvec(lv, x)
        x = x + prolong(lv, vcycle(restrict(lv, res), i + 1))
        return smooth(lv, x, r)

    def M(r):
        return vcycle(r, 0)

    return M
