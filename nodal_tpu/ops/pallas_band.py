"""Pallas mega-kernel block-Thomas: banded batched solves, all in VMEM.

TPU counterpart of ops/band.py's block-tridiagonal solver.  Each kernel
instance DMAs ``T`` systems' band storage (3·K·n values instead of the
full n² matrix) into VMEM and runs the whole Schur recursion + both block
sweeps without touching HBM again — the banded analogue of
ops/pallas_block_lu.py, with the same two TPU tricks:

* **System interleaving**: the Schur recursion is a chain of *dependent*
  128×128 matmuls (Newton-Schulz block inverses + couplings); ``T``
  independent systems are emitted round-robin so the MXU pipeline stays
  full instead of stalling on every link.
* **Lane-replicated RHS**: [K, 128] RHS mats keep every sweep op
  MXU-shaped; column 0 comes back via a one-hot contraction.

Versus the full blocked-LU kernel at n=1024 this removes the
Schur-complement panel updates (the fp32-HIGHEST-heavy part — ~840 of
~1600 matmul passes) and cuts the HBM read from 4 MB to 1.5 MB per
system.  Stability domain identical to ops/block_lu.py (no pivoting:
diagonally dominant / SPD; the block recursion IS the blocked-LU
elimination restricted to the band).

The reference has no banded or structure-aware solver at all (it calls
dense LAPACK / SuperLU, reference nodal.py:325-327); this kernel is the
TPU-native replacement for those calls on locally-connected circuits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nodal_tpu.ops.pallas_block_lu import (
    _interpret,
    _mm,
    _ns_inverse_many,
    _ns_inverse_many_adaptive,
    _x32_scope,
)

_K = 128  # MXU tile; plan block sizes kb are multiples of this

#: Band storage 1.5 KB/row + C/y state 1 KB/row, times T systems, must sit
#: under the ~100 MB scoped-VMEM budget with transients.
_MAX_N = 2048

#: The band path runs ALL-fp32 Newton-Schulz.  The Schur blocks of a
#: weakly-grounded chain approach the near-singular boundary operator of
#: the eliminated region, so the Jacobi-start contraction factor is
#: e0 = 1 − λmin/d ≈ 1 − 1e-4..1e-6: within bf16 input noise (~4e-3) of
#: the divergence boundary.  Mixed bf16 schedules tip individual batch
#: samples over e=1 and Newton leaves its basin entirely — measured on
#: real v5e with full-batch residual audits: a 25x400 mesh (nb=79) had
#: ~40% garbage samples (residuals 0.7..1e16, MORE mixed iterations →
#: NaN), and even the nb=8 bench mesh at B=1024 with all components
#: perturbed 5% had samples at residual 4e4.  fp32 noise (~1e-7) keeps
#: e below 1 for the same blocks (audited clean at every size).  Depth
#: scales the iteration count: convergence needs 2^k ≳ 14/(1−e0) and
#: λmin shrinks with the eliminated-region size.
_FP32_ITERS = 16        # regions up to 1024 unknowns
_FP32_ITERS_DEEP = 22   # larger eliminated regions (λmin ~ 1/region-size)
_DEEP_N = 1024


def _ns_schedule(nb: int, kb: int) -> tuple[int, int]:
    """(newton_iters, fp32_tail) by eliminated-region size nb·kb — the
    divergence physics scales with the region's node count, not its block
    count (a kb=256 band at nb=8 covers 2048 nodes)."""
    it = _FP32_ITERS if nb * kb <= _DEEP_N else _FP32_ITERS_DEEP
    return it, it


#: Extra ceiling the adaptive loop gets over the old fixed schedule: it
#: stops early on easy blocks, so the ceiling only bounds pathological
#: samples — and a higher one makes deep chains SAFER than fixed counts.
_ADAPTIVE_EXTRA = 8


def _resolve_ns(nb: int, kb: int, newton_iters, fp32_tail):
    """Map the public ``newton_iters``/``fp32_tail`` kwargs to
    (iters, tail, adaptive): None -> convergence-checked adaptive NS with
    ceiling schedule+_ADAPTIVE_EXTRA; an explicit count keeps the fixed
    all-fp32 behavior exactly (tests / callers that pinned a budget)."""
    if newton_iters is None:
        it, _ = _ns_schedule(nb, kb)
        it += _ADAPTIVE_EXTRA
        return it, it, True
    tail = newton_iters if fp32_tail is None else fp32_tail
    return newton_iters, tail, False


def _pick_T(nb: int, multi: bool) -> int:
    """Systems interleaved per kernel instance.

    Deeper interleave keeps the MXU pipeline fuller (measured at n=1000:
    T=8 -> 22.0k, T=16 -> 23.7k solves/s) but VMEM caps it: each system
    carries ~n·2.6 KB of band + recursion state, and the multi-RHS kernel
    adds n·1 KB of R/X blocks (T=16 at n=1024 multi overflows the 100 MB
    scoped budget — measured)."""
    n = nb * _K
    if multi:
        return 16 if n <= 512 else 8
    return 16 if n <= 1024 else 8


def band_fits_vmem(n: int, kb: int = _K) -> bool:
    """Whether the VMEM-resident block-Thomas kernel supports (n, kb).

    The monolithic kernel is kb=128-only; larger block sizes go through
    the streaming tier, which measured *equal* speed at n=1024 (20.7k vs
    20.4k solves/s on v5e) — there is nothing to gain from a monolithic
    variant per kb."""
    return kb == _K and -(-n // _K) * _K <= _MAX_N


def _unit_band(nb: int, kb: int = _K) -> jnp.ndarray:
    """[nb, kb, 3kb] band of the identity (batch-padding systems)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, kb, 3 * kb), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, kb, 3 * kb), 2)
    return (cols == rows + kb).astype(jnp.float32)


def _thomas_many(Ws, rhs_of, nb: int, iters: int, fp32_tail: int,
                 kb: int = _K, adaptive: bool = False):
    """Interleaved block-Thomas over T band refs.

    ``Ws[j]`` is a [n, 3kb] VMEM ref (rows of system j's band);
    ``rhs_of(j, t)`` yields block t's [kb, R] RHS mat.  Returns per-system
    lists of x blocks ([kb, R]), natural block order.  ``adaptive=True``
    runs the convergence-checked Newton-Schulz (``iters`` is then the
    ceiling, not the budget — see _ns_inverse_many_adaptive).
    """
    T = len(Ws)
    C_hist = [[None] * nb for _ in range(T)]
    y_hist = [[None] * nb for _ in range(T)]
    Cp = [None] * T
    yp = [None] * T
    for t in range(nb):
        lo, hi = t * kb, (t + 1) * kb
        Ds, bs = [], []
        for j in range(T):
            D = Ws[j][lo:hi, kb:2 * kb]
            bm = rhs_of(j, t)
            if t > 0:
                L = Ws[j][lo:hi, 0:kb]
                D = D - _mm(L, Cp[j])
                bm = bm - _mm(L, yp[j])
            Ds.append(D)
            bs.append(bm)
        Xs = (_ns_inverse_many_adaptive(Ds, iters, k=kb) if adaptive
              else _ns_inverse_many(Ds, iters, fp32_tail, k=kb))
        for j in range(T):
            y = _mm(Xs[j], bs[j])
            y_hist[j][t] = y
            yp[j] = y
            if t < nb - 1:
                C = _mm(Xs[j], Ws[j][lo:hi, 2 * kb:3 * kb])
                C_hist[j][t] = C
                Cp[j] = C
    xs = [[None] * nb for _ in range(T)]
    for j in range(T):
        xs[j][nb - 1] = y_hist[j][nb - 1]
    for t in range(nb - 2, -1, -1):
        for j in range(T):
            xs[j][t] = y_hist[j][t] - _mm(C_hist[j][t], xs[j][t + 1])
    return xs


def _make_kernel(nb: int, iters: int, tail: int, T: int,
                 adaptive: bool = False):
    n = nb * _K

    def kernel(w_hbm, b_ref, out_ref, W, sem):
        i = pl.program_id(0)
        start = pl.multiple_of(i * T, T)
        cp = pltpu.make_async_copy(w_hbm.at[pl.ds(start, T)], W, sem)
        cp.start()
        cp.wait()
        Ws = [W.at[j] for j in range(T)]
        ones = jnp.ones((1, _K), dtype=jnp.float32)
        e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, _K), 1) == 0).astype(
            jnp.float32
        )

        def rhs_of(j, t):
            # b rows [1, K] -> lane-replicated [K, 128] via outer product.
            return jax.lax.dot_general(
                b_ref[0, j:j + 1, t * _K:(t + 1) * _K], ones,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        xs = _thomas_many(Ws, rhs_of, nb, iters, tail, adaptive=adaptive)
        for j in range(T):
            xfull = jnp.concatenate(xs[j], axis=0)  # [n, 128]
            out_ref[0, j] = jax.lax.dot_general(
                e0, xfull, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[0]

    return kernel, n


def _make_multi_kernel(nb: int, iters: int, tail: int, T: int,
                       adaptive: bool = False):
    n = nb * _K

    def kernel(w_hbm, r_ref, out_ref, W, sem):
        i = pl.program_id(0)
        start = pl.multiple_of(i * T, T)
        cp = pltpu.make_async_copy(w_hbm.at[pl.ds(start, T)], W, sem)
        cp.start()
        cp.wait()
        Ws = [W.at[j] for j in range(T)]

        def rhs_of(j, t):
            return r_ref[j, t * _K:(t + 1) * _K, :]

        xs = _thomas_many(Ws, rhs_of, nb, iters, tail, adaptive=adaptive)
        for j in range(T):
            out_ref[j] = jnp.concatenate(xs[j], axis=0)

    return kernel, n


def _pad_batch(W, extra, pad: int):
    """Append ``pad`` well-conditioned identity systems."""
    nb, kb = W.shape[1], W.shape[2]
    unit = jnp.broadcast_to(_unit_band(nb, kb), (pad,) + W.shape[1:])
    return jnp.concatenate([W, unit], axis=0), jnp.concatenate(
        [extra, jnp.zeros((pad,) + extra.shape[1:], extra.dtype)], axis=0
    )


@functools.partial(jax.jit,
                   static_argnames=("newton_iters", "fp32_tail", "n_valid"))
def pallas_band_solve(W, b, *, newton_iters: int | None = None,
                      fp32_tail: int | None = None,
                      n_valid: int | None = None):
    """Batched banded solve: ``W`` [B, nb, K, 3K] block-band storage
    (ops.band.BandPlan.assemble), ``b`` [B, nb·K] -> x [B, nb·K] (f32).

    ``n_valid`` trims the padded tail from the result (the plan pads rows
    to a 128 multiple with a unit diagonal).
    """
    B_in, nb, kb, kb3 = W.shape
    if kb != _K or kb3 != 3 * _K:
        raise ValueError(
            f"band blocks must be [{_K}, {3 * _K}] (kb > 128 uses "
            f"pallas_band_solve_stream), got {W.shape}")
    n = nb * _K
    if n > _MAX_N:
        raise ValueError(
            f"pallas_band_solve supports n <= {_MAX_N} (VMEM budget); got "
            f"{n} — use pallas_band_solve_stream"
        )
    newton_iters, fp32_tail, adaptive = _resolve_ns(
        nb, kb, newton_iters, fp32_tail)
    W = W.astype(jnp.float32)
    b = b.astype(jnp.float32)
    T = _pick_T(nb, multi=False)
    B = -(-B_in // T) * T
    if B != B_in:
        W, b = _pad_batch(W, b, B - B_in)

    kernel, _ = _make_kernel(nb, newton_iters, fp32_tail, T,
                             adaptive=adaptive)
    with _x32_scope():
        x = pl.pallas_call(
            kernel,
            grid=(B // T,),
            out_shape=jax.ShapeDtypeStruct((B // T, T, n), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # band stays in HBM
                pl.BlockSpec((1, T, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((T, n, 3 * _K), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(W.reshape(B, n, 3 * _K), b.reshape(B // T, T, n))
    out_n = n_valid if n_valid is not None else n
    return x.reshape(B, n)[:B_in, :out_n]


@functools.partial(jax.jit, static_argnames=("newton_iters", "fp32_tail"))
def pallas_band_solve_multi(W, R, *, newton_iters: int | None = None,
                            fp32_tail: int | None = None):
    """Batched banded MULTI-RHS solve: ``W`` [B, nb, K, 3K],
    ``R`` [B, nb·K, r] with r <= 128 -> X [B, nb·K, r] (f32).

    The RHS lanes carry up to 128 distinct right-hand sides — one banded
    Thomas pass solves a whole Schur-complement column block
    ``A⁻¹ [B | b]`` (batch.BatchedSolver's branch-equation path).
    """
    B_in, nb, kb, kb3 = W.shape
    if kb != _K or kb3 != 3 * _K:
        raise ValueError(f"band blocks must be [{_K}, {3 * _K}], got {W.shape}")
    n = nb * _K
    r_in = R.shape[-1]
    if n > _MAX_N:
        raise ValueError(
            f"pallas_band_solve_multi supports n <= {_MAX_N}; got {n}"
        )
    if r_in > _K:
        raise ValueError(f"at most {_K} right-hand sides, got {r_in}")
    newton_iters, fp32_tail, adaptive = _resolve_ns(
        nb, kb, newton_iters, fp32_tail)
    W = W.astype(jnp.float32)
    R = R.astype(jnp.float32)
    if r_in != _K:
        R = jnp.pad(R, [(0, 0), (0, 0), (0, _K - r_in)])
    T = _pick_T(nb, multi=True)
    B = -(-B_in // T) * T
    if B != B_in:
        W, R = _pad_batch(W, R, B - B_in)

    kernel, _ = _make_multi_kernel(nb, newton_iters, fp32_tail, T,
                                   adaptive=adaptive)
    with _x32_scope():
        x = pl.pallas_call(
            kernel,
            grid=(B // T,),
            out_shape=jax.ShapeDtypeStruct((B, n, _K), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((T, n, _K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, n, _K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((T, n, 3 * _K), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(W.reshape(B, n, 3 * _K), R)
    return x[:B_in, :, :r_in]


# ---------------------------------------------------------------------------
# Streaming variant: n beyond the VMEM-resident limit.
#
# The monolithic kernel above holds a system's whole band + recursion
# history in VMEM (n <= 2048).  For larger banded systems the Schur
# recursion is instead driven by the Pallas *grid pipeline*: grid
# (batch-group, block-row) with the block-row dimension sequential
# ("arbitrary" semantics), band blocks streamed in via BlockSpec (the
# pipeline double-buffers the DMAs), and the (C, y) recursion state kept
# in VMEM scratch, which persists across grid steps on TPU.  The forward
# pass emits C_t and y_t to HBM; the backward pass replays them in
# reverse block order (a reversed BlockSpec index map).  Numerically
# identical to the monolithic kernel; HBM traffic grows by the C/y
# round trip (~2·K·n·4 B per system), still far below the dense n².
#
# Without this tier, banded circuits past 2048 unknowns fell back to the
# XLA scan Thomas whose per-block pivoted solves crawl on TPU (measured:
# 325 solves/s at n=5000, B=64 — the streaming kernel is ~15x that).
# ---------------------------------------------------------------------------

#: Streaming-tier cap on n·kb (forward-pass C storage is kb·n·4 B per
#: system, [B, nb, kb, kb] in HBM — at the cap and B=256 that is ~4 GB).
_MAX_NKB_STREAM = 32768 * 128

_STREAM_T = 8  # systems per grid step (VMEM: carries + double-buffered DMA)


def band_fits_stream(n: int, kb: int = _K) -> bool:
    """Whether the streaming block-Thomas kernel supports (n, kb)."""
    return (-(-n // kb) * kb) * kb <= _MAX_NKB_STREAM


def _ones_row():
    return jnp.ones((1, _K), dtype=jnp.float32)


def _e0_row():
    return (jax.lax.broadcasted_iota(jnp.int32, (1, _K), 1) == 0).astype(
        jnp.float32
    )


def _replicate(row):
    """[1, kb] row -> [kb, 128] lane-replicated mat (HIGHEST: exact copy)."""
    return jax.lax.dot_general(
        row, _ones_row(), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _extract_row(mat):
    """[kb, 128] lane-replicated mat -> [1, kb] row (one-hot, HIGHEST)."""
    return jax.lax.dot_general(
        _e0_row(), mat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _make_fwd_stream_kernel(iters: int, tail: int, T: int, multi: bool,
                            kb: int, adaptive: bool = False):
    def kernel(w_ref, b_ref, c_ref, y_ref, Cp, Yp):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            # Block row 0 has an all-zero L panel by construction, so the
            # carry is multiplied by zero — but uninitialized VMEM may
            # hold NaN patterns (NaN·0 = NaN), so clear it once per group.
            Cp[...] = jnp.zeros_like(Cp)
            Yp[...] = jnp.zeros_like(Yp)

        Ds, bs = [], []
        for j in range(T):
            L = w_ref[j, 0, :, 0:kb]
            D = w_ref[j, 0, :, kb:2 * kb] - _mm(L, Cp[j])
            bm = b_ref[j, 0] if multi else _replicate(b_ref[j, 0:1, 0])
            bm = bm - _mm(L, Yp[j])
            Ds.append(D)
            bs.append(bm)
        Xs = (_ns_inverse_many_adaptive(Ds, iters, k=kb) if adaptive
              else _ns_inverse_many(Ds, iters, tail, k=kb))
        for j in range(T):
            y = _mm(Xs[j], bs[j])
            C = _mm(Xs[j], w_ref[j, 0, :, 2 * kb:3 * kb])
            Cp[j] = C
            Yp[j] = y
            c_ref[j, 0] = C
            if multi:
                y_ref[j, 0] = y
            else:
                y_ref[j, 0:1, 0] = _extract_row(y)

    return kernel


def _make_bwd_stream_kernel(T: int, multi: bool):
    def kernel(c_ref, y_ref, x_ref, Xc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            # The last block row's U panel is all-zero, so C_{nb-1} = 0
            # kills the carry — but clear once against NaN·0.
            Xc[...] = jnp.zeros_like(Xc)

        for j in range(T):
            y = y_ref[j, 0] if multi else _replicate(y_ref[j, 0:1, 0])
            x = y - _mm(c_ref[j, 0], Xc[j])
            Xc[j] = x
            if multi:
                x_ref[j, 0] = x
            else:
                x_ref[j, 0:1, 0] = _extract_row(x)

    return kernel


def _band_solve_stream(W, R_or_b, *, newton_iters: int, fp32_tail: int,
                       multi: bool, adaptive: bool = False):
    """Shared driver for the streaming tiers (R_or_b already padded/f32)."""
    B, nb, kb, _ = W.shape
    n = nb * kb
    T = _STREAM_T
    vm = 100 * 1024 * 1024
    fwd_map = lambda i, t: (i, t, 0, 0)  # noqa: E731
    rev_map = lambda i, t: (i, nb - 1 - t, 0, 0)  # noqa: E731

    def spec(block, index_map):
        return pl.BlockSpec((T, 1) + block, index_map,
                            memory_space=pltpu.VMEM)

    # y carries [kb, 128] mats in multi mode, [1, kb] rows otherwise.
    y_block = (kb, _K) if multi else (1, kb)
    rhs3 = R_or_b.reshape((B, nb) + y_block)
    y_shape = jax.ShapeDtypeStruct((B, nb) + y_block, jnp.float32)

    with _x32_scope():
        C, Y = pl.pallas_call(
            _make_fwd_stream_kernel(newton_iters, fp32_tail, T, multi, kb,
                                    adaptive=adaptive),
            grid=(B // T, nb),
            out_shape=(
                jax.ShapeDtypeStruct((B, nb, kb, kb), jnp.float32),
                y_shape,
            ),
            in_specs=[
                spec((kb, 3 * kb), fwd_map),
                spec(y_block, fwd_map),
            ],
            out_specs=(
                spec((kb, kb), fwd_map),
                spec(y_block, fwd_map),
            ),
            scratch_shapes=[
                pltpu.VMEM((T, kb, kb), jnp.float32),
                pltpu.VMEM((T, kb, _K), jnp.float32),  # y carry [kb, 128]
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=vm,
            ),
            interpret=_interpret(),
        )(W, rhs3)

        X = pl.pallas_call(
            _make_bwd_stream_kernel(T, multi),
            grid=(B // T, nb),
            out_shape=y_shape,
            in_specs=[
                spec((kb, kb), rev_map),
                spec(y_block, rev_map),
            ],
            out_specs=spec(y_block, rev_map),
            scratch_shapes=[pltpu.VMEM((T, kb, _K), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=vm,
            ),
            interpret=_interpret(),
        )(C, Y)
    return X


@functools.partial(jax.jit,
                   static_argnames=("newton_iters", "fp32_tail", "n_valid"))
def pallas_band_solve_stream(W, b, *, newton_iters: int | None = None,
                             fp32_tail: int | None = None,
                             n_valid: int | None = None):
    """Streaming batched banded solve for n beyond the VMEM tier.

    Same contract as :func:`pallas_band_solve`, plus kb > 128 block sizes
    (wide bands); supports ``band_fits_stream(n, kb)`` (32k unknowns at
    kb=128, scaling down as 1/kb).
    """
    B_in, nb, kb, kb3 = W.shape
    if kb % _K or kb3 != 3 * kb:
        raise ValueError(
            f"band blocks must be [kb, 3*kb] with kb a multiple of {_K}, "
            f"got {W.shape}")
    n = nb * kb
    if not band_fits_stream(n, kb):
        raise ValueError(
            f"pallas_band_solve_stream supports n*kb <= {_MAX_NKB_STREAM}; "
            f"got {n}*{kb} — use ops.band.band_thomas_solve"
        )
    newton_iters, fp32_tail, adaptive = _resolve_ns(
        nb, kb, newton_iters, fp32_tail)
    W = W.astype(jnp.float32)
    b = b.astype(jnp.float32)
    T = _STREAM_T
    B = -(-B_in // T) * T
    if B != B_in:
        W, b = _pad_batch(W, b, B - B_in)
    X = _band_solve_stream(W, b, newton_iters=newton_iters,
                           fp32_tail=fp32_tail, multi=False,
                           adaptive=adaptive)
    out_n = n_valid if n_valid is not None else n
    return X.reshape(B, n)[:B_in, :out_n]


@functools.partial(jax.jit, static_argnames=("newton_iters", "fp32_tail"))
def pallas_band_solve_multi_stream(W, R, *, newton_iters: int | None = None,
                                   fp32_tail: int | None = None):
    """Streaming batched banded MULTI-RHS solve (r <= 128); see
    :func:`pallas_band_solve_multi` for the contract.  Supports kb > 128
    block sizes like :func:`pallas_band_solve_stream`."""
    B_in, nb, kb, kb3 = W.shape
    if kb % _K or kb3 != 3 * kb:
        raise ValueError(
            f"band blocks must be [kb, 3*kb] with kb a multiple of {_K}, "
            f"got {W.shape}")
    n = nb * kb
    r_in = R.shape[-1]
    if not band_fits_stream(n, kb):
        raise ValueError(
            f"pallas_band_solve_multi_stream supports n*kb <= "
            f"{_MAX_NKB_STREAM}; got {n}*{kb}"
        )
    if r_in > _K:
        raise ValueError(f"at most {_K} right-hand sides, got {r_in}")
    newton_iters, fp32_tail, adaptive = _resolve_ns(
        nb, kb, newton_iters, fp32_tail)
    W = W.astype(jnp.float32)
    R = R.astype(jnp.float32)
    if r_in != _K:
        R = jnp.pad(R, [(0, 0), (0, 0), (0, _K - r_in)])
    T = _STREAM_T
    B = -(-B_in // T) * T
    if B != B_in:
        W, R = _pad_batch(W, R, B - B_in)
    X = _band_solve_stream(W, R, newton_iters=newton_iters,
                           fp32_tail=fp32_tail, multi=True,
                           adaptive=adaptive)
    return X.reshape(B, n, _K)[:B_in, :, :r_in]
