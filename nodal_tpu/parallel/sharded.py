"""GSPMD-sharded solvers: annotate shardings, let XLA place collectives.

This is the primary multi-chip path (the scaling-book recipe): the batched
dense solve shards its batch axis across the whole mesh (pure data
parallelism — zero communication), and the grid solve shards the *node axis*
(grid rows) so one huge system spans chips; XLA's SPMD partitioner turns the
stencil's pad/slice ops into halo exchanges and the CG dot products into
``all-reduce``s over ICI automatically.

For the explicit hand-written collective variant (ppermute halo exchange
inside shard_map), see :mod:`nodal_tpu.parallel.halo`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nodal_tpu.models.stamps import StampTensors
from nodal_tpu.ops.assemble import assemble_dense
from nodal_tpu.ops import dense_solve
from nodal_tpu.ops.grid import grid_solve


def make_sharded_batch_solver(
    stamps: StampTensors, mesh: Mesh, *, dtype=jnp.float32, refine: bool = False
):
    """Compile a batch solver whose batch axis is sharded over every mesh
    axis (dp × sp treated as one data-parallel pool).

    Structure-aware like :class:`nodal_tpu.batch.BatchedSolver`, but
    restricted to the XLA-level solver implementations (PCR tridiagonal,
    scan block-Thomas, blocked LU) — those are plain XLA ops whose batch
    dimension GSPMD partitions with zero communication, whereas the Pallas
    mega-kernels are opaque custom calls the partitioner cannot split.
    ``refine=True`` keeps the dense f64-refined path.

    Returns a function ``params_batch [B, n_components] -> solutions [B, n]``
    with B divisible by the mesh size.
    """
    in_sharding = NamedSharding(mesh, P(("dp", "sp"), None))
    out_sharding = NamedSharding(mesh, P(("dp", "sp"), None))

    from nodal_tpu.ops import block_lu, tridiag
    from nodal_tpu.ops.assemble import assemble_tridiag, bandwidth
    from nodal_tpu.ops.band import band_plan, band_thomas_solve

    resistive = stamps.n == stamps.n_kcl
    plan = band_plan(stamps) if (resistive and not refine) else None

    if resistive and not refine and bandwidth(stamps) <= 1:

        def solve_batch(pb):
            dl, d, du, b = jax.vmap(
                lambda p: assemble_tridiag(stamps, p, dtype=dtype)
            )(pb)
            return tridiag.tridiag_solve(dl, d, du, b)

    elif plan is not None and plan.nb >= 2:

        def solve_batch(pb):
            W, b = jax.vmap(
                lambda p: plan.assemble(stamps, p, dtype=dtype)
            )(pb)
            return plan.unpermute(band_thomas_solve(W, b))

    elif resistive and not refine:

        def solve_batch(pb):
            G, b = jax.vmap(
                lambda p: assemble_dense(stamps, p, dtype=dtype)
            )(pb)
            return block_lu.blocked_solve(G, b)

    else:

        def single(params):
            G, b = assemble_dense(stamps, params, dtype=dtype)
            if refine:
                return dense_solve.solve_refined(G, b)
            return dense_solve.solve_dense(G, b)

        solve_batch = jax.vmap(single)

    return jax.jit(
        solve_batch, in_shardings=in_sharding, out_shardings=out_sharding
    )


def make_sharded_grid_solver(
    h: int,
    w: int,
    mesh: Mesh,
    *,
    dtype=jnp.float32,
    tol: float = 1e-6,
    maxiter: int | None = None,
    mg: bool = True,
    mg_backend: str = "auto",
):
    """Compile a batched grid solver with 2D sharding: the batch of systems
    over ``dp``, each system's row (node) axis over ``sp``.

    Returns ``b_batch [B, H, W] -> (x_batch [B, H, W], residuals [B])``.
    """
    if mg_backend == "auto":
        # Always the XLA cycle here: GSPMD partitions its pad/slice stencils
        # automatically, whereas Pallas kernels do not shard — and the mesh
        # may be virtual CPU devices while an accelerator is the session
        # default.
        mg_backend = "xla"
    in_sharding = NamedSharding(mesh, P("dp", "sp", None))
    out_sharding = (
        NamedSharding(mesh, P("dp", "sp", None)),
        NamedSharding(mesh, P("dp")),
    )

    def single(b):
        x, info = grid_solve(h, w, b, dtype=dtype, tol=tol, maxiter=maxiter,
                             mg=mg, mg_backend=mg_backend)
        return x, info.residual

    return jax.jit(
        jax.vmap(single), in_shardings=(in_sharding,), out_shardings=out_sharding
    )
