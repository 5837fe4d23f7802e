"""Fused CG algebra for the grid solver: two Pallas kernels replace the
six XLA launches of each iteration's vector work.

Kernel S (stencil_partials): Lp plus per-tile partial reductions of p·Lp
and Σp in one pass — the matvec and its dot product together.
Kernel U (update_partials): x += αp, r -= α(Lp + mean_p), partial Σr² — the
two AXPYs and the convergence dot together.

Everything else (the 3-launch multigrid preconditioner, the z·r reduce and
the p update) stays on the existing paths.  Per-iteration launch count at
1024² drops from ~11 to ~7; on v5e, launches ARE the cost at this size
(NOTES.md), measured 33 ms → ~24 ms for the 1M-node solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nodal_tpu.ops.cg import SolveInfo
from nodal_tpu.ops.pallas_stencil import (
    _interpret,
    _lap,
    _TILE_ROWS,
    _x32_scope,
)


def _lane_pack(values):
    """Pack a few scalars into an [8, 128] tile (sublane 0, one lane each;
    zeros elsewhere) — the minimum Mosaic-aligned output block.  Summing
    the whole packed array over tiles therefore reduces each lane exactly
    once."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    out = jnp.zeros((8, 128), values[0].dtype)
    for i, v in enumerate(values):
        out = jnp.where(jnp.logical_and(subl == 0, lanes == i), v, out)
    return out


@functools.partial(jax.jit, static_argnames=("weight",))
def stencil_partials(p, *, weight: float = 1.0):
    """(Lp, partials[n_tiles, 128]) — partial lane 0: Σ p·Lp, lane 1: Σ p."""
    h, w = p.shape
    tb = _TILE_ROWS
    assert h % tb == 0 and h // tb >= 2, (h, tb)
    k = 8
    pp = jnp.pad(p, ((k, k), (0, 0)), mode="symmetric")
    win = tb + 2 * k
    n_tiles = h // tb

    def kernel(p_hbm, lp_ref, part_ref, p_vmem, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            p_hbm.at[pl.ds(pl.multiple_of(i * tb, 8), win), :], p_vmem, sem
        )
        cp.start()
        cp.wait()
        ptile = p_vmem[:]
        lp = _lap(ptile, weight)[k : k + tb, :]
        body = ptile[k : k + tb, :]
        lp_ref[:] = lp
        part_ref[:] = _lane_pack([jnp.sum(body * lp), jnp.sum(body)])

    with _x32_scope():
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=(
                jax.ShapeDtypeStruct((h, w), p.dtype),
                jax.ShapeDtypeStruct((n_tiles * 8, 128), p.dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec((tb, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((win, w), p.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=_interpret(),
        )(pp)


@jax.jit
def update_partials(x, r, p, lp, alpha, mean_p):
    """x' = x + αp;  r' = r - α(Lp + mean_p);  partials lane 0: Σ r'²."""
    h, w = x.shape
    tb = _TILE_ROWS
    assert h % tb == 0
    n_tiles = h // tb
    alpha = jnp.reshape(alpha.astype(x.dtype), (1, 1))
    mean_p = jnp.reshape(mean_p.astype(x.dtype), (1, 1))

    def kernel(a_ref, m_ref, x_ref, r_ref, p_ref, lp_ref, xo_ref, ro_ref,
               part_ref):
        a = a_ref[0, 0]
        mp = m_ref[0, 0]
        xo_ref[:] = x_ref[:] + a * p_ref[:]
        rn = r_ref[:] - a * (lp_ref[:] + mp)
        ro_ref[:] = rn
        part_ref[:] = _lane_pack([jnp.sum(rn * rn)])

    tile = lambda i: (i, 0)  # noqa: E731
    spec = pl.BlockSpec((tb, w), tile, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    with _x32_scope():
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=(
                jax.ShapeDtypeStruct((h, w), x.dtype),
                jax.ShapeDtypeStruct((h, w), x.dtype),
                jax.ShapeDtypeStruct((n_tiles * 8, 128), x.dtype),
            ),
            in_specs=[sspec, sspec, spec, spec, spec, spec],
            out_specs=(
                spec,
                spec,
                pl.BlockSpec((8, 128), tile, memory_space=pltpu.VMEM),
            ),
            interpret=_interpret(),
        )(alpha, mean_p, x, r, p, lp)


def fused_grid_cg(b, preconditioner, *, weight: float = 1.0,
                  tol: float = 1e-6, maxiter: int = 200):
    """CG on the rank-one-regularized grid operator with fused kernels.

    ``b`` must be mean-zero [h, w]; ``preconditioner`` maps residual fields
    to correction fields (the 3-launch Pallas MG).  Returns
    ``(x, SolveInfo)`` — same contract as ops.cg.cg.
    """
    h, w = b.shape
    n_total = h * w

    def dot(u, v):
        return jnp.vdot(u, v, precision=jax.lax.Precision.HIGHEST)

    b_norm2 = dot(b, b)
    atol2 = (tol * tol) * jnp.maximum(b_norm2, jnp.finfo(b.dtype).tiny)

    x0 = jnp.zeros_like(b)
    r0 = b  # A @ 0 = 0
    z0 = preconditioner(r0)
    rz0 = dot(r0, z0)
    state = (x0, r0, z0, z0, rz0, b_norm2, jnp.array(0, jnp.int32))

    def cond(state):
        *_, rr, k = state
        return jnp.logical_and(rr > atol2, k < maxiter)

    def body(state):
        x, r, z, p, rz, _rr, k = state
        lp, part_s = stencil_partials(p, weight=weight)
        p_lp = jnp.sum(part_s[:, 0])
        sum_p = jnp.sum(part_s[:, 1])
        mean_p = sum_p / n_total
        p_ap = p_lp + mean_p * sum_p  # pᵀ(L + mean)p
        alpha = rz / p_ap
        x, r, part_u = update_partials(x, r, p, lp, alpha, mean_p)
        rr = jnp.sum(part_u[:, 0])
        z = preconditioner(r)
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, rr, k + 1)

    x, r, *_rest, rr, k = jax.lax.while_loop(cond, body, state)
    res = jnp.sqrt(rr / jnp.maximum(b_norm2, jnp.finfo(b.dtype).tiny))
    return x, SolveInfo(residual=res, iterations=k, converged=res <= tol)
