"""Algebraic multigrid (unsmoothed aggregation) for general resistive
networks.

The matrix-free geometric multigrid (ops/grid.py) only applies to uniform
grids; arbitrary resistive netlists solve through the COO path, where plain
Jacobi-CG needs O(diameter) iterations.  This module builds an aggregation
AMG hierarchy on the host — greedy neighborhood aggregation, piecewise-
constant prolongation, exact Galerkin coarse operators (P^T A P computed by
relabel + merge on the COO triples) — and applies the V-cycle on device
with segment-sum restriction, gather prolongation and weighted-Jacobi
smoothing.  Used as a CG preconditioner for SPD (grounded-Laplacian)
systems; setup is value-dependent, so each hierarchy belongs to one
parameter vector (Circuit.solve's single solve — exactly where it's
needed).

The V(1,1) cycle with symmetric smoothing and Galerkin coarse operators is
SPD, so plain (non-flexible) CG remains valid.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

_JACOBI_OMEGA = 0.7
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
    agg: np.ndarray | None  # int32[n] fine-node -> aggregate id (None at coarsest)
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


def _galerkin(rows, cols, vals, agg, n_coarse):
    """P^T A P for piecewise-constant P: relabel COO by aggregate, merge."""
    r = agg[rows].astype(np.int64)
    c = agg[cols].astype(np.int64)
    key = r * n_coarse + c
    uniq, inverse = np.unique(key, return_inverse=True)
    merged = np.zeros(len(uniq))
    np.add.at(merged, inverse, vals)
    keep = merged != 0
    uniq, merged = uniq[keep], merged[keep]
    return (
        (uniq // n_coarse).astype(np.int32),
        (uniq % n_coarse).astype(np.int32),
        merged,
    )


def build_hierarchy(n, rows, cols, vals) -> list[_Level]:
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
            levels.append(_Level(n, rows, cols, vals, diag, None, 0))
            break
        agg = _aggregate(n, rows, cols)
        n_coarse = int(agg.max()) + 1
        if n_coarse >= n:  # no coarsening progress; stop
            levels.append(_Level(n, rows, cols, vals, diag, None, 0))
            break
        levels.append(_Level(n, rows, cols, vals, diag, agg, n_coarse))
        rows, cols, vals = _galerkin(rows, cols, vals, agg, n_coarse)
        order = np.argsort(rows.astype(np.int64) * n_coarse + cols,
                           kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]
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
            "agg": None if lv.agg is None else jnp.asarray(lv.agg),
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

    def vcycle(r, i):
        lv = dev[i]
        if lv["agg"] is None:
            x = jnp.zeros_like(r)
            for _ in range(2):
                x = smooth(lv, x, r)

            def body(_, x):
                return smooth(lv, x, r)

            return jax.lax.fori_loop(0, _COARSE_SWEEPS, body, x)
        x = _JACOBI_OMEGA * lv["dinv"] * r  # one sweep from zero
        res = r - matvec(lv, x)
        rc = jax.ops.segment_sum(res, lv["agg"], num_segments=lv["nc"])
        x = x + vcycle(rc, i + 1)[lv["agg"]]
        return smooth(lv, x, r)

    def M(r):
        return vcycle(r, 0)

    return M
