"""Explicit-collective grid CG: shard_map + ppermute halo exchange.

The hand-scheduled counterpart to the GSPMD path
(:mod:`nodal_tpu.parallel.sharded`).  The grid's row (node) axis is sharded
over the ``sp`` mesh axis; each step of the 5-point stencil exchanges one
boundary row with each neighbor via ``lax.ppermute`` (riding ICI on real
hardware), and the CG dot products psum over ``sp``.  Everything else is
local VPU work, so the communication volume per iteration is
2·W elements + 3 scalar all-reduces — the textbook halo-exchange CG.

Useful when the GSPMD partitioner's choices need overriding, and as the
foundation for the Pallas ring-DMA variant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nodal_tpu.ops.cg import cg


def _exchange_halos(x, sp: int, axis: str = "sp"):
    """Fetch the last row of the previous shard and the first row of the
    next shard; replicate own boundary rows at the global edges (matching
    the edge-replicate Neumann stencil in ops.grid)."""
    idx = jax.lax.axis_index(axis)
    fwd = [(i, i + 1) for i in range(sp - 1)]  # shard i -> shard i+1
    bwd = [(i + 1, i) for i in range(sp - 1)]  # shard i+1 -> shard i
    from_above = jax.lax.ppermute(x[-1:, :], axis, fwd)
    from_below = jax.lax.ppermute(x[:1, :], axis, bwd)
    top = jnp.where(idx == 0, x[:1, :], from_above)
    bottom = jnp.where(idx == sp - 1, x[-1:, :], from_below)
    return top, bottom


def halo_laplacian_matvec(x, sp: int, axis: str = "sp", weight: float = 1.0):
    """Local block of ``L x`` for a row-sharded grid field.

    ``x`` is the local [H/sp, W] block.  Vertical neighbors across the shard
    boundary come from ppermute; horizontal neighbors are local
    edge-replicate padding.
    """
    top, bottom = _exchange_halos(x, sp, axis)
    xv = jnp.concatenate([top, x, bottom], axis=0)  # [hl+2, W]
    xp = jnp.pad(xv, ((0, 0), (1, 1)), mode="edge")
    nbr = xp[:-2, 1:-1] + xp[2:, 1:-1] + xp[1:-1, :-2] + xp[1:-1, 2:]
    return weight * (4.0 * x - nbr)


def make_halo_grid_solver(
    h: int,
    w: int,
    mesh: Mesh,
    *,
    dtype=jnp.float32,
    tol: float = 1e-6,
    maxiter: int | None = None,
):
    """Compile a batched grid solver with explicit collectives.

    Input ``b_batch [B, H, W]`` is sharded ``P('dp', 'sp', None)``: batches
    over dp, grid rows over sp.  Returns ``(x_batch, residuals)``.
    (Plain Jacobi-free CG — the multigrid-preconditioned variant lives on
    the GSPMD path; here the point is the explicit communication schedule.)
    """
    sp = mesh.shape["sp"]
    if h % sp:
        raise ValueError(f"grid rows {h} not divisible by sp={sp}")
    n_total = h * w
    iters = maxiter if maxiter is not None else 20 * max(h, w)

    def solve_one(b_local):
        # b_local: [H/sp, W] — one system's local row block.
        def matvec(x):
            lap = halo_laplacian_matvec(x, sp)
            gmean = jax.lax.psum(jnp.sum(x), "sp") / n_total
            return lap + gmean

        gmean_b = jax.lax.psum(jnp.sum(b_local), "sp") / n_total
        x, info = cg(
            matvec,
            b_local - gmean_b,
            tol=tol,
            maxiter=iters,
            axis_names=("sp",),
        )
        return x, info.residual

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp", "sp", None),),
        out_specs=(P("dp", "sp", None), P("dp")),
        check_vma=False,
    )
    def solve_local(b_block):
        # b_block: [B/dp, H/sp, W]
        return jax.vmap(solve_one)(b_block)

    def solver(b_batch):
        return jax.jit(solve_local)(jnp.asarray(b_batch, dtype=dtype))

    return solver
