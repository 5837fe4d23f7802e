"""Pallas parallel-cyclic-reduction kernel: batched tridiagonal solves with
the whole reduction in VMEM.

The XLA PCR (ops/tridiag.py) materializes 4 band arrays per level in HBM —
~10 round trips over the batch.  Here a block of systems loads its bands
once, runs every reduction level in VMEM, and writes only the solution:
HBM traffic drops from ~40·B·n to 5·B·n values.  Measured on v5e at
n=1000, B=16k: ~4x over the XLA PCR (which itself is ~300x the reference's
per-solve cost).

The reduction itself mirrors ops/tridiag.py exactly (same padding and
decoupled-identity-row semantics); cross-validated in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nodal_tpu.ops.tridiag import _next_pow2

# VMEM budget for one kernel instance: 5 band/rhs buffers, double-buffered
# by the Pallas pipeline.  8 MB keeps clear of the ~16 MB VMEM ceiling.
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_tile(m: int, itemsize: int) -> int | None:
    """Batch tile that fits the VMEM budget, or None when even the minimum
    8-system tile would not fit (very long chains) — callers must fall back
    to the XLA PCR in that case."""
    tile = _VMEM_BUDGET // (5 * 2 * m * itemsize)
    if tile < 8:
        return None
    p = 8
    while p * 2 <= min(tile, 512):
        p *= 2
    return p


def pcr_fits_vmem(n: int, itemsize: int = 4) -> bool:
    """Whether the VMEM-resident PCR kernel supports chains of length n."""
    return _pick_tile(_next_pow2(n), itemsize) is not None


def _interpret() -> bool:
    # Shared helper (honors the force_interpret override used by the
    # virtual-CPU mesh dryruns — see pallas_block_lu).
    from nodal_tpu.ops.pallas_block_lu import _interpret as _shared

    return _shared()


def _x32_scope():
    """Trace pallas calls with 32-bit index types: gridded Mosaic kernels
    fail to compile when jax_enable_x64 leaks i64 into BlockSpec index
    maps (verified on v5e)."""
    return jax.enable_x64(False)


def _shift_lane(x, s: int, fill: float):
    """Shift along the last (lane) axis by s with fill; static s."""
    if s == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (abs(s),), fill, dtype=x.dtype)
    if s > 0:
        return jnp.concatenate([pad, x[..., :-s]], axis=-1)
    return jnp.concatenate([x[..., -s:], pad], axis=-1)


def pcr_solve(dl, d, du, b, *, tile: int | None = None):
    """Batched tridiagonal solve, one VMEM-resident PCR per batch tile.

    Args are [B, n] with the same conventions as ops.tridiag.tridiag_solve
    (dl[:,0] and du[:,n-1] ignored).  B must be a multiple of ``tile`` (the
    caller pads; BatchedSolver does).
    """
    B, n = d.shape
    m = _next_pow2(n)
    if tile is None:
        tile = _pick_tile(m, d.dtype.itemsize)
        if tile is None:
            raise ValueError(
                f"chain length {n} exceeds the VMEM PCR budget; use "
                "ops.tridiag.tridiag_solve (check pcr_fits_vmem first)"
            )
    if B % tile:
        raise ValueError(f"batch {B} not divisible by tile {tile}")

    levels = []
    s = 1
    while s < m:
        levels.append(s)
        s *= 2

    def kernel(dl_ref, d_ref, du_ref, b_ref, out_ref):
        # Mask the dangling couplings with iota compares (Mosaic has no
        # scatter, so no .at[].set in-kernel).
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
        a = jnp.where(col == 0, 0.0, dl_ref[:])
        c = jnp.where(col == n - 1, 0.0, du_ref[:])
        dd = d_ref[:]
        rhs = b_ref[:]
        if m != n:
            pad = m - n
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=-1
            )
            c = jnp.concatenate(
                [c, jnp.zeros((c.shape[0], pad), c.dtype)], axis=-1
            )
            dd = jnp.concatenate(
                [dd, jnp.ones((dd.shape[0], pad), dd.dtype)], axis=-1
            )
            rhs = jnp.concatenate(
                [rhs, jnp.zeros((rhs.shape[0], pad), rhs.dtype)], axis=-1
            )
        for s in levels:
            alpha = a / _shift_lane(dd, s, 1.0)
            gamma = c / _shift_lane(dd, -s, 1.0)
            a_new = -alpha * _shift_lane(a, s, 0.0)
            c_new = -gamma * _shift_lane(c, -s, 0.0)
            dd = (
                dd
                - alpha * _shift_lane(c, s, 0.0)
                - gamma * _shift_lane(a, -s, 0.0)
            )
            rhs = (
                rhs
                - alpha * _shift_lane(rhs, s, 0.0)
                - gamma * _shift_lane(rhs, -s, 0.0)
            )
            a, c = a_new, c_new
        out_ref[:] = (rhs / dd)[:, :n]

    block = lambda i: (i, 0)  # noqa: E731
    spec = pl.BlockSpec((tile, n), block, memory_space=pltpu.VMEM)
    with _x32_scope():
        return pl.pallas_call(
            kernel,
            grid=(B // tile,),
            out_shape=jax.ShapeDtypeStruct((B, n), d.dtype),
            in_specs=[spec] * 4,
            out_specs=spec,
            interpret=_interpret(),
        )(dl, d, du, b)


@functools.partial(jax.jit, static_argnames=("tile",))
def pcr_solve_padded(dl, d, du, b, tile: int | None = None):
    """pcr_solve with automatic batch padding to the tile multiple."""
    if tile is None:
        tile = _pick_tile(_next_pow2(d.shape[1]), d.dtype.itemsize)
        if tile is None:
            raise ValueError(
                f"chain length {d.shape[1]} exceeds the VMEM PCR budget; "
                "use ops.tridiag.tridiag_solve (check pcr_fits_vmem first)"
            )
    B = d.shape[0]
    pad = (-B) % tile
    if pad:
        ident = lambda x, fill: jnp.concatenate(  # noqa: E731
            [x, jnp.full((pad, x.shape[1]), fill, x.dtype)], axis=0
        )
        dl, du, b = ident(dl, 0.0), ident(du, 0.0), ident(b, 0.0)
        d = ident(d, 1.0)
    out = pcr_solve(dl, d, du, b, tile=tile)
    return out[:B]
