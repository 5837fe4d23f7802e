"""Matrix-free resistor-grid solver: stencil Laplacian + multigrid CG.

This is the framework's answer to the reference's headline use case — the
xkcd-356 infinite-resistor-grid problem (reference README.md:141-142) and
the 1M-node resistor-grid north star (BASELINE.json): equivalent resistance
across a uniform H×W grid of unit resistors.

The netlist path would spend all its time materializing 1M nodes of CSV and
COO; here the grid never becomes a netlist at all.  The MNA system for a
resistive grid is the graph Laplacian; its matvec is a 5-point stencil —
pure VPU work with perfect XLA fusion.  We solve the *Neumann* (ungrounded)
system ``L x = b`` with zero-sum ``b = e_a - e_b``, regularized by a
rank-one mean shift (``A = L + mean``), which is SPD on the whole space and
agrees with the grounded solve on potential *differences*; equivalent
resistance R = x[a] - x[b] is exactly the netlist-path answer.

Preconditioner: geometric multigrid V-cycle with Galerkin-exact coarse
operators.  Coarsening merges 2×2 node blocks; electrically, two parallel
unit resistors bridge adjacent blocks, so the coarse grid is again a uniform
resistor grid with doubled edge weight — ``P^T L_w P = L_{2w}`` holds
exactly for prolongation-by-replication, including boundary rows.  The
coarsest level runs many rolled Jacobi sweeps with mean projection — an
exact pinv solve would embed a constant matrix, which costs ~100 s of
remote-TPU compile time (NOTES.md).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from nodal_tpu.ops.cg import SolveInfo, cg

# Weighted-Jacobi smoothing factor: 4/5 is optimal-ish for the 2D 5-point
# stencil's high-frequency band.
_JACOBI_OMEGA = 0.8
_COARSEST_SIZE = 8  # stop coarsening when min(H, W) <= this
# Jacobi sweeps for the coarsest level.  An exact pinv matmul would be
# mathematically nicer, but a matmul against an embedded constant matrix
# costs ~100 s of remote-TPU compile time (measured); at <=8x8 a hundred
# pure-stencil sweeps (rolled into one fori_loop) solve the level to
# preconditioner accuracy and keep the whole V-cycle constant-free.
# Tuned on a 512-grid point-source problem: (sweeps=96, coarsest=8, nu=1)
# gives 42 CG iterations vs 50 for (48, 4, 1).
_COARSE_SWEEPS = 96


def _neighbor_sum_replicate(x):
    """Sum of 4-neighbor values under edge-replicate padding.

    Pad + slice + add (not ``.at[].add``): lowers to fused elementwise ops
    rather than scatters, and absorbs the boundary degree correction — for a
    boundary node the replicated 'neighbor' is the node itself, so
    ``4x - nbr_replicate(x) == deg⊙x - nbr_zero(x)`` exactly.  No H×W
    degree constant ever enters the executable.
    """
    xp = jnp.pad(x, 1, mode="edge")
    return xp[:-2, 1:-1] + xp[2:, 1:-1] + xp[1:-1, :-2] + xp[1:-1, 2:]


def laplacian_matvec(x, weight=1.0):
    """y = weight * (deg ⊙ x - Σ_neighbors x): the grid-graph Laplacian of
    an H×W grid of equal resistors (conductance ``weight`` per edge)."""
    return weight * (4.0 * x - _neighbor_sum_replicate(x))


def _dense_laplacian(h: int, w: int, weight: float) -> np.ndarray:
    """Materialized Laplacian for the exact coarsest-level solve."""
    n = h * w
    L = np.zeros((n, n))
    for i in range(h):
        for j in range(w):
            k = i * w + j
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < h and 0 <= jj < w:
                    L[k, k] += weight
                    L[k, ii * w + jj] -= weight
    return L


@dataclass(frozen=True)
class _Level:
    h: int
    w: int
    weight: float


@functools.lru_cache(maxsize=32)
def _build_levels(h: int, w: int, weight_factor: float = 1.0) -> tuple:
    """Geometric hierarchy: halve both dims while even.

    ``weight_factor`` is the per-level edge-weight multiplier: 2.0 for
    replication transfers (PᵀL_wP = L_2w exactly — two parallel unit
    resistors bridge adjacent 2×2 blocks), 1.0 for bilinear transfers
    (see _prolong_bilinear)."""
    levels = []
    weight = 1.0
    while True:
        levels.append(_Level(h, w, weight))
        if min(h, w) <= _COARSEST_SIZE or h % 2 or w % 2:
            break
        h, w, weight = h // 2, w // 2, weight * weight_factor
    return tuple(levels)


def _restrict(r):
    """2×2 block sum = P^T for prolongation-by-replication."""
    h, w = r.shape
    return r.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))


def _prolong(xc):
    """Replicate each coarse value over its 2×2 block (P)."""
    return jnp.repeat(jnp.repeat(xc, 2, axis=0), 2, axis=1)


def _prolong_bilinear(xc):
    """Separable cell-centered bilinear prolongation (1D weights 3/4, 1/4,
    edge-replicated at the boundary; every row sums to 1, so constants —
    the Neumann nullspace — are preserved exactly).

    Replication-prolongation caps the V-cycle at a ~0.65 CG contraction;
    bilinear drops the 1M-grid point-source solve from 55 to 8 CG
    iterations (measured, 1024², tol 1e-6).  Galerkin note: with this P
    and R = Pᵀ, the coarse operator matching PᵀLP on smooth modes is the
    *same-weight* grid Laplacian (no weight doubling as with replication)
    — empirically exact enough that coarse-weight factors 0.5/2.0 both
    diverge while 1.0 converges in single digits.
    """
    xp = jnp.pad(xc, 1, mode="edge")
    up = 0.75 * xp[1:-1, :] + 0.25 * xp[:-2, :]
    dn = 0.75 * xp[1:-1, :] + 0.25 * xp[2:, :]
    rows = jnp.stack([up, dn], axis=1).reshape(2 * xc.shape[0], xp.shape[1])
    left = 0.75 * rows[:, 1:-1] + 0.25 * rows[:, :-2]
    right = 0.75 * rows[:, 1:-1] + 0.25 * rows[:, 2:]
    return jnp.stack([left, right], axis=2).reshape(
        2 * xc.shape[0], 2 * xc.shape[1]
    )


def _restrict_bilinear(r):
    """Adjoint of :func:`_prolong_bilinear` (R = Pᵀ, verified by vdot
    identity in tests) — the out-of-range quarter weights of the
    edge-replicated prolongation fold back onto the boundary cells."""

    def fold_axis0(f):
        a = 0.75 * (f[0::2, :] + f[1::2, :])
        fp = jnp.pad(f, ((1, 1), (0, 0)))
        out = a + 0.25 * (fp[0:-2:2, :] + fp[3::2, :])
        out = out.at[0].add(0.25 * f[0]).at[-1].add(0.25 * f[-1])
        return out

    return fold_axis0(fold_axis0(r.T).T)


def make_mg_preconditioner(h: int, w: int, dtype, nu: int = 1,
                           backend: str = "auto"):
    """Symmetric V(nu, nu) multigrid cycle as a linear preconditioner.

    Returns M(r) ≈ L⁺ r (mean-zero in, mean-zero out), fixed and SPD, safe
    inside CG.

    ``backend="pallas"`` fuses the cycle into a handful of Pallas
    mega-kernels (nodal_tpu.ops.pallas_stencil): levels that fit VMEM run
    as ONE kernel, larger finest levels use the ghost-zone fused smoother.
    v5e is per-op-overhead bound at these sizes, so fewer launches beat any
    micro-optimization.  "auto" = pallas on TPU, xla elsewhere.
    """
    if backend == "auto":
        on_tpu = jax.default_backend() == "tpu"
        f32 = jnp.dtype(dtype) == jnp.float32
        backend = (
            "pallas"
            if (on_tpu and f32 and _pallas_shapes_ok(h, w, 4))
            else "xla"
        )
    if backend == "pallas":
        return _make_pallas_preconditioner(h, w, dtype, nu)
    levels = _build_levels(h, w, 1.0)  # bilinear transfers: same weight

    def jacobi(x, r, weight, sweeps):
        # Weighted Jacobi with the uniform interior diagonal 4*weight
        # (slightly underdamped on boundary rows — fine for a smoother).
        def sweep(x):
            res = r - laplacian_matvec(x, weight)
            return x + (_JACOBI_OMEGA / (4.0 * weight)) * res

        if sweeps <= 4:
            for _ in range(sweeps):
                x = sweep(x)
            return x
        # Long sweep chains (the coarsest level) roll into one fori_loop so
        # the traced graph stays small — compile time, not run time, is the
        # constraint here.
        return jax.lax.fori_loop(0, sweeps, lambda _, x: sweep(x), x)

    def vcycle(r, lv_idx):
        lv = levels[lv_idx]
        if lv_idx == len(levels) - 1:
            # Coarsest: many cheap sweeps on a tiny field, mean-projected
            # (the Neumann nullspace component must not accumulate).
            x = jacobi(jnp.zeros_like(r), r - jnp.mean(r), lv.weight,
                       _COARSE_SWEEPS)
            return x - jnp.mean(x)
        x = jacobi(jnp.zeros_like(r), r, lv.weight, nu)
        res = r - laplacian_matvec(x, lv.weight)
        x = x + _prolong_bilinear(vcycle(_restrict_bilinear(res), lv_idx + 1))
        return jacobi(x, r, lv.weight, nu)

    def M(r):
        out = vcycle(r, 0)
        return out - jnp.mean(out)

    return M


_PALLAS_VCYCLE_BYTES = 2 * 1024 * 1024  # mega-kernel cutoff (512^2 f32)


def _pallas_shapes_ok(h: int, w: int, itemsize: int) -> bool:
    """True iff the Pallas MG kernels support this hierarchy: every level
    above the mega-kernel cutoff must tile into 256-row bands with even
    dims, and the mega-kernel entry level must fit its VMEM budget (which
    an odd-dimension stop above ~4 MB would violate)."""
    while h * w * itemsize > _PALLAS_VCYCLE_BYTES:
        if h % 256 or h // 256 < 2 or w % 2 or h % 2:
            return False
        h, w = h // 2, w // 2
    return True


def _make_pallas_preconditioner(h: int, w: int, dtype, nu: int):
    from nodal_tpu.ops.pallas_stencil import (
        fused_presmooth_restrict,
        fused_prolong_postsmooth,
        fused_vcycle,
    )

    if not _pallas_shapes_ok(h, w, jnp.dtype(dtype).itemsize):
        raise ValueError(
            f"pallas MG backend does not support a {h}x{w} grid (levels "
            "above the VMEM cutoff must be even and 256-row-tileable); "
            "use mg_backend='xla'"
        )

    itemsize = jnp.dtype(dtype).itemsize

    def descend(r, weight):
        hh, ww = r.shape
        if hh * ww * itemsize <= _PALLAS_VCYCLE_BYTES or hh % 2 or ww % 2:
            return fused_vcycle(
                r, weight=weight, omega=_JACOBI_OMEGA, nu=nu,
                coarse_sweeps=_COARSE_SWEEPS, coarsest=_COARSEST_SIZE,
            )
        # Finest level(s): one kernel per V-cycle wing (V(1,1) form).
        # Bilinear transfers pair with a same-weight coarse operator
        # (_build_levels weight_factor=1.0 rationale).
        rc = fused_presmooth_restrict(r, weight=weight, omega=_JACOBI_OMEGA)
        zc = descend(rc, weight)
        return fused_prolong_postsmooth(r, zc, weight=weight,
                                        omega=_JACOBI_OMEGA)

    def M(r):
        out = descend(r, 1.0)
        return out - jnp.mean(out)

    return M


def make_grid_operator(h: int, w: int, dtype):
    """The SPD regularized Neumann operator ``A x = L x + mean(x)``.

    For mean-zero b, ``A x = b`` has the unique mean-zero solution of the
    singular system ``L x = b`` — potential differences match the grounded
    netlist solve exactly.
    """
    del h, w, dtype  # shape-independent: the stencil adapts to x

    def matvec(x):
        return laplacian_matvec(x) + jnp.mean(x)

    return matvec


def grid_solve(h, w, b, *, dtype=jnp.float32, tol=1e-7, maxiter=None, mg=True,
               mg_backend: str = "auto", fused_cg: bool = False):
    """Solve the grid system for an arbitrary zero-sum injection field ``b``.

    Returns ``(x, SolveInfo)`` with x mean-zero.  jit-friendly given static
    (h, w).
    """
    b = jnp.asarray(b, dtype=dtype)
    if maxiter is None:
        maxiter = 200 if mg else 20 * max(h, w)
    backend = mg_backend
    if backend == "auto":
        on_tpu = jax.default_backend() == "tpu"
        backend = (
            "pallas"
            if (
                on_tpu
                and jnp.dtype(dtype) == jnp.float32
                and _pallas_shapes_ok(h, w, jnp.dtype(dtype).itemsize)
            )
            else "xla"
        )
    M = (make_mg_preconditioner(h, w, dtype, backend=backend)
         if mg else None)
    itemsize = jnp.dtype(dtype).itemsize
    if (
        fused_cg
        and mg
        and backend == "pallas"
        and h * w * itemsize > _PALLAS_VCYCLE_BYTES
        and h % 256 == 0
        and h // 256 >= 2
    ):
        # Opt-in: CG algebra as fused Pallas kernels (ops.pallas_cg).
        # Measured at 1024²: 32 ms vs 33 ms with the plain loop — the MG
        # wings already dominate — at ~3x the compile time, so not default.
        from nodal_tpu.ops.pallas_cg import fused_grid_cg

        return fused_grid_cg(b - jnp.mean(b), M, tol=tol, maxiter=maxiter)
    matvec = make_grid_operator(h, w, dtype)
    return cg(matvec, b - jnp.mean(b), preconditioner=M, tol=tol, maxiter=maxiter)


def grid_equivalent_resistance_many(
    h: int,
    w: int,
    pairs,
    *,
    resistance: float = 1.0,
    dtype=jnp.float32,
    tol=1e-7,
    maxiter=None,
    mg: bool = True,
    mg_backend: str = "auto",
):
    """Equivalent resistance for MANY probe pairs at once.

    ``pairs`` is [P, 2, 2] int — P pairs of (row, col) probe coordinates.
    The operator is identical for every pair (only the injection field
    changes), so the whole family solves as one vmapped MG-CG program.
    Returns ``(R [P], residuals [P])``.
    """
    pairs = jnp.asarray(pairs)

    def one(pair):
        (ar, ac), (br, bc) = pair[0], pair[1]
        rhs = (
            jnp.zeros((h, w), dtype=dtype)
            .at[ar, ac].add(1.0)
            .at[br, bc].add(-1.0)
        )
        x, info = grid_solve(h, w, rhs, dtype=dtype, tol=tol,
                             maxiter=maxiter, mg=mg, mg_backend=mg_backend)
        return (x[ar, ac] - x[br, bc]) * resistance, info.residual

    return jax.vmap(one)(pairs)


def grid_equivalent_resistance(
    h: int,
    w: int,
    a: tuple[int, int],
    b: tuple[int, int],
    *,
    resistance: float = 1.0,
    dtype=jnp.float32,
    tol=1e-7,
    maxiter=None,
    mg: bool = True,
    mg_backend: str = "auto",
):
    """Equivalent resistance between grid nodes ``a`` and ``b`` on an H×W
    grid of equal resistors (1 A probe current, R = potential difference;
    reference equiv.py:31-61 semantics without the netlist).

    Returns ``(R, SolveInfo)``.
    """
    rhs = (
        jnp.zeros((h, w), dtype=dtype)
        .at[a[0], a[1]].add(1.0)
        .at[b[0], b[1]].add(-1.0)
    )
    x, info = grid_solve(h, w, rhs, dtype=dtype, tol=tol, maxiter=maxiter,
                         mg=mg, mg_backend=mg_backend)
    r = (x[a[0], a[1]] - x[b[0], b[1]]) * resistance
    return r, info
