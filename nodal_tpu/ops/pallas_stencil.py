"""Pallas mega-kernels for the grid solver's hot loop.

The 1M-node grid CG is not bandwidth-bound on v5e — it is *op-overhead*
bound: a 4 MB elementwise op costs ~250 µs wall regardless of its math
(measured: axpy at 1024² reaches 43 GB/s vs 513 GB/s at 4096²).  The fix is
fewer, fatter ops: fuse K weighted-Jacobi sweeps (each a 5-point stencil +
axpy) into ONE kernel that keeps the field in VMEM.

Two regimes:

* **Single block** — fields up to ~2 MB (levels ≤ 512² f32) fit whole in
  VMEM alongside their RHS; the kernel runs all K sweeps in a fori_loop
  with zero HBM round-trips between sweeps.
* **Ghost-zone tiles** — bigger fields are split into row bands.  K sweeps
  need a K-row halo per side (information moves one row per sweep — the
  classic overlapped-trapezoid scheme).  The inputs are mirror-padded by K
  rows once outside the kernel ('symmetric' mode: x[-1] = x[0]), which is
  exactly the edge-replicate Neumann boundary extension — the stencil is
  reflection-symmetric, so mirrored ghosts stay consistent through every
  sweep and K-sweep tiles are bit-exact, not approximate.  Each tile then
  DMAs its uniform haloed row window HBM→VMEM and writes back only its
  body.

Horizontal boundaries never need ghosts (tiles span the full width; the
in-kernel edge pad is exact every sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-field VMEM budget for the single-block regime (bytes).  Three live
# field-sized buffers (x, r, padded temp) plus slack must fit in ~16 MB.
_SINGLE_BLOCK_BYTES = 2 * 1024 * 1024
_TILE_ROWS = 256


def _interpret() -> bool:
    # Mosaic is TPU-only; on CPU (tests, virtual meshes) run interpreted.
    return jax.default_backend() != "tpu"


def _x32_scope():
    """Trace pallas calls with 32-bit index types: gridded Mosaic kernels
    fail to compile when jax_enable_x64 leaks i64 into BlockSpec index
    maps (verified on v5e)."""
    return jax.enable_x64(False)


def _lap(v, weight: float):
    xp = jnp.pad(v, 1, mode="edge")
    nbr = xp[:-2, 1:-1] + xp[2:, 1:-1] + xp[1:-1, :-2] + xp[1:-1, 2:]
    return weight * (4.0 * v - nbr)


def _sweep(v, r, weight: float, omega: float):
    """One weighted-Jacobi sweep of the edge-replicate 5-point stencil."""
    return v + (omega / (4.0 * weight)) * (r - _lap(v, weight))


def _bilinear_matrix(m: int, dtype):
    """[m, m//2] separable cell-centered bilinear prolongation matrix (1D
    weights 3/4, 1/4; the out-of-range quarter weights fold back onto the
    edge cells = replicate boundary), built from iota comparisons (no
    embedded constants — those cost ~100s of remote-TPU compile).

    prolong = B x Bᵀ, restrict = Bᵀ v B — MXU matmuls, since Mosaic
    rejects strided slicing and reshape-based block reductions.  Bilinear
    (vs 2×2 replication) is what drops the 1M-grid point-source solve
    from 55 to 8 CG iterations (see grid._prolong_bilinear)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m // 2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m // 2), 1)
    base = (rows // 2 == cols).astype(dtype) * dtype.type(0.75)
    quarter = (
        (rows == 2 * cols - 1) | (rows == 2 * cols + 2)
    ).astype(dtype) * dtype.type(0.25)
    fold = (
        ((rows == 0) & (cols == 0))
        | ((rows == m - 1) & (cols == m // 2 - 1))
    ).astype(dtype) * dtype.type(0.25)
    return base + quarter + fold


def _bilinear_window_matrix(win: int, nc: int, offset: int, dtype):
    """[win, nc] bilinear prolongation rows for a haloed tile window: fine
    window row f maps to coarse rows around ``(f - offset) / 2``.  No edge
    folds — at interior tile seams the halo supplies the true neighbors,
    and at global edges the symmetric pad outside already duplicates the
    edge row (≡ the fold)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (win, nc), 0) - offset
    cols = jax.lax.broadcasted_iota(jnp.int32, (win, nc), 1)
    base = (
        (rows == 2 * cols) | (rows == 2 * cols + 1)
    ).astype(dtype) * dtype.type(0.75)
    quarter = (
        (rows == 2 * cols - 1) | (rows == 2 * cols + 2)
    ).astype(dtype) * dtype.type(0.25)
    return base + quarter


def _restrict_mm(v):
    R = _bilinear_matrix(v.shape[0], v.dtype)
    C = _bilinear_matrix(v.shape[1], v.dtype)
    return jnp.dot(
        jnp.dot(R.T, v, preferred_element_type=v.dtype), C,
        preferred_element_type=v.dtype,
    )


def _prolong_mm(x):
    R = _bilinear_matrix(x.shape[0] * 2, x.dtype)
    C = _bilinear_matrix(x.shape[1] * 2, x.dtype)
    return jnp.dot(
        jnp.dot(R, x, preferred_element_type=x.dtype), C.T,
        preferred_element_type=x.dtype,
    )


def _single_block_kernel(sweeps: int, weight: float, omega: float):
    def kernel(x_ref, r_ref, out_ref):
        r = r_ref[:]

        def body(_, v):
            return _sweep(v, r, weight, omega)

        out_ref[:] = jax.lax.fori_loop(0, sweeps, body, x_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("weight", "omega", "sweeps"))
def fused_jacobi(x, r, *, weight: float = 1.0, omega: float = 0.8,
                 sweeps: int = 1):
    """K fused weighted-Jacobi sweeps on the Neumann grid Laplacian.

    Semantically identical (up to f32 rounding order) to K successive XLA
    stencil sweeps, but one kernel launch and no intermediate HBM traffic.
    """
    h, w = x.shape
    nbytes = h * w * x.dtype.itemsize
    tb = _TILE_ROWS
    if nbytes <= _SINGLE_BLOCK_BYTES or h % tb or h // tb < 2:
        with _x32_scope():
            return pl.pallas_call(
                _single_block_kernel(sweeps, weight, omega),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=_interpret(),
            )(x, r)

    if sweeps > 4:
        raise ValueError("tiled fused_jacobi supports at most 4 sweeps")
    k = 4  # fixed halo: keeps every DMA window 8-row aligned for Mosaic
    n_tiles = h // tb
    # Mirror ('symmetric') padding == the Neumann boundary extension; the
    # vertical sweeps inside the kernel then never need boundary branches.
    xp = jnp.pad(x, ((k, k), (0, 0)), mode="symmetric")
    rp = jnp.pad(r, ((k, k), (0, 0)), mode="symmetric")
    win = tb + 2 * k  # multiple of 8

    def kernel(x_hbm, r_hbm, out_ref, x_vmem, r_vmem, sem):
        i = pl.program_id(0)
        start = pl.multiple_of(i * tb, 8)  # haloed window in padded array
        cp_x = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, win), :], x_vmem, sem.at[0]
        )
        cp_r = pltpu.make_async_copy(
            r_hbm.at[pl.ds(start, win), :], r_vmem, sem.at[1]
        )
        cp_x.start()
        cp_r.start()
        cp_x.wait()
        cp_r.wait()
        r_loc = r_vmem[:]

        def body(_, v):
            return _sweep(v, r_loc, weight, omega)

        out_ref[:] = jax.lax.fori_loop(0, sweeps, body, x_vmem[:])[
            k : k + tb, :
        ]

    with _x32_scope():
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (tb, w), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((win, w), x.dtype),
                pltpu.VMEM((win, w), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=_interpret(),
        )(xp, rp)


@functools.partial(jax.jit, static_argnames=("weight", "omega"))
def fused_presmooth_restrict(r, *, weight: float = 1.0, omega: float = 0.8):
    """Finest-level V-cycle descent wing in ONE tiled kernel:

        x   = (omega / 4w) * r          (one Jacobi sweep from zero)
        res = r - L x
        rc  = restrict(res)             (2x2 block sum, tile-local)

    Returns ``rc`` [h/2, w/2].  ``x`` is not materialized — the ascent wing
    (fused_prolong_postsmooth) reconstructs it from r, saving a full-field
    HBM round trip.  Tiles need a 1-row halo for L; the mirror pad supplies
    it exactly.
    """
    h, w = r.shape
    c = omega / (4.0 * weight)

    def small_kernel(r_ref, rc_ref):
        rr = r_ref[:]
        res = rr - _lap(c * rr, weight)
        rc_ref[:] = _restrict_mm(res)

    if h * w * r.dtype.itemsize <= _SINGLE_BLOCK_BYTES:
        with _x32_scope():
            return pl.pallas_call(
                small_kernel,
                out_shape=jax.ShapeDtypeStruct((h // 2, w // 2), r.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=_interpret(),
            )(r)

    tb = _TILE_ROWS
    assert h % tb == 0 and tb % 2 == 0
    k = 4
    rp = jnp.pad(r, ((k, k), (0, 0)), mode="symmetric")
    win = tb + 2 * k
    n_tiles = h // tb

    def kernel(r_hbm, rc_ref, r_vmem, sem):
        i = pl.program_id(0)
        start = pl.multiple_of(i * tb, 8)
        cp = pltpu.make_async_copy(
            r_hbm.at[pl.ds(start, win), :], r_vmem, sem
        )
        cp.start()
        cp.wait()
        rr = r_vmem[:]
        res = rr - _lap(c * rr, weight)  # [win, w]; halo rows feed restrict
        # Bilinear restrict straight off the haloed window: the quarter
        # weights reach one fine row beyond the tile, which the halo
        # supplies exactly (no fold at interior seams).
        Rw = _bilinear_window_matrix(win, tb // 2, k, res.dtype)
        C = _bilinear_matrix(w, res.dtype)
        rc_ref[:] = jnp.dot(
            jnp.dot(Rw.T, res, preferred_element_type=res.dtype), C,
            preferred_element_type=res.dtype,
        )

    with _x32_scope():
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct((h // 2, w // 2), r.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (tb // 2, w // 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((win, w), r.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=_interpret(),
        )(rp)


@functools.partial(jax.jit, static_argnames=("weight", "omega"))
def fused_prolong_postsmooth(r, zc, *, weight: float = 1.0,
                             omega: float = 0.8):
    """Finest-level V-cycle ascent wing in ONE tiled kernel:

        x  = (omega / 4w) * r + prolong(zc)   (pre-smooth value + coarse corr)
        x' = x + (omega / 4w) * (r - L x)     (post-smooth)

    Tiles need the coarse correction's halo too: ``zc`` rows are prolonged
    2x, so a 1-coarse-row halo covers the 1-fine-row stencil halo; both
    fields are mirror-padded outside the kernel.
    """
    h, w = r.shape
    c = omega / (4.0 * weight)

    def small_kernel(r_ref, zc_ref, out_ref):
        rr = r_ref[:]
        x = c * rr + _prolong_mm(zc_ref[:])
        out_ref[:] = x + c * (rr - _lap(x, weight))

    if h * w * r.dtype.itemsize <= _SINGLE_BLOCK_BYTES:
        with _x32_scope():
            return pl.pallas_call(
                small_kernel,
                out_shape=jax.ShapeDtypeStruct((h, w), r.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=_interpret(),
            )(r, zc)

    tb = _TILE_ROWS
    assert h % tb == 0
    # Fine halo 8 / coarse halo 4 keeps BOTH DMA windows 8-row aligned
    # (Mosaic rejects unaligned dynamic slices of tiled memrefs).
    k = 8
    kc = k // 2
    rp = jnp.pad(r, ((k, k), (0, 0)), mode="symmetric")
    zp = jnp.pad(zc, ((kc, kc), (0, 0)), mode="symmetric")
    win = tb + 2 * k
    winc = tb // 2 + 2 * kc
    n_tiles = h // tb

    def kernel(r_hbm, z_hbm, out_ref, r_vmem, z_vmem, sem):
        i = pl.program_id(0)
        cp_r = pltpu.make_async_copy(
            r_hbm.at[pl.ds(pl.multiple_of(i * tb, 8), win), :], r_vmem,
            sem.at[0],
        )
        cp_z = pltpu.make_async_copy(
            z_hbm.at[pl.ds(pl.multiple_of(i * (tb // 2), 8), winc), :],
            z_vmem, sem.at[1],
        )
        cp_r.start()
        cp_z.start()
        cp_r.wait()
        cp_z.wait()
        rr = r_vmem[:]
        # Bilinear prolongation over the haloed windows; fine/coarse halos
        # align (k = 2*kc) so the row map needs no offset, and window-edge
        # rows (where the no-fold matrix is wrong) sit ≥ 7 rows outside
        # the [k, k+tb) slice + 1-row stencil halo actually consumed.
        Bw = _bilinear_window_matrix(win, winc, 0, rr.dtype)
        C = _bilinear_matrix(w, rr.dtype)
        zf = jnp.dot(
            jnp.dot(Bw, z_vmem[:], preferred_element_type=rr.dtype), C.T,
            preferred_element_type=rr.dtype,
        )
        x = c * rr + zf
        out_ref[:] = (x + c * (rr - _lap(x, weight)))[k : k + tb, :]

    with _x32_scope():
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            out_shape=jax.ShapeDtypeStruct((h, w), r.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (tb, w), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((win, w), r.dtype),
                pltpu.VMEM((winc, w // 2), r.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=_interpret(),
        )(rp, zp)


@functools.partial(
    jax.jit, static_argnames=("weight", "omega", "nu", "coarse_sweeps",
                              "coarsest")
)
def fused_vcycle(r, *, weight: float = 1.0, omega: float = 0.8, nu: int = 1,
                 coarse_sweeps: int = 96, coarsest: int = 8):
    """One multigrid V(nu, nu) cycle as a SINGLE Pallas kernel.

    The whole level hierarchy lives in VMEM: smoothing is the fused stencil
    sweep, level transfers are MXU matmuls against iota-generated
    aggregation matrices, the coarsest level runs ``coarse_sweeps`` rolled
    Jacobi iterations.  Replaces ~4 ops/level × levels with ONE launch —
    the V-cycle's cost on v5e is per-op overhead, not FLOPs.

    Valid for fields whose hierarchy fits VMEM: ≤ 512×512 f32.  Bigger
    grids keep their finest level outside (see grid.make_mg_preconditioner)
    and call this on the first coarse level.
    """
    h, w = r.shape
    assert h * w * r.dtype.itemsize <= 4 * _SINGLE_BLOCK_BYTES // 2, (
        "fused_vcycle input too large for VMEM; restrict first"
    )

    def vcycle(rr, wt: float):
        hh, ww = rr.shape
        if min(hh, ww) <= coarsest or hh % 2 or ww % 2:
            rz = rr - jnp.mean(rr)

            def body(_, x):
                return _sweep(x, rz, wt, omega)

            x = jax.lax.fori_loop(0, coarse_sweeps, body, jnp.zeros_like(rr))
            return x - jnp.mean(x)
        x = jnp.zeros_like(rr)
        for _ in range(nu):
            x = _sweep(x, rr, wt, omega)
        res = rr - _lap(x, wt)
        # Bilinear transfers: the matching coarse operator keeps the SAME
        # edge weight (grid._build_levels weight_factor=1.0 rationale).
        x = x + _prolong_mm(vcycle(_restrict_mm(res), wt))
        for _ in range(nu):
            x = _sweep(x, rr, wt, omega)
        return x

    def kernel(r_ref, o_ref):
        out = vcycle(r_ref[:], weight)
        o_ref[:] = out - jnp.mean(out)

    with _x32_scope():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(r)
