"""Pallas mega-kernel dense solve: the whole no-pivot blocked LU in VMEM.

The XLA blocked LU (ops/block_lu.py) materializes every shrinking Schur
complement in HBM — ~100 GB of intermediate traffic for a [1024, 1000,
1000] batch, which makes it memory-bound at ~6-8k solves/s on v5e even
though the arithmetic is pure MXU matmuls.  This kernel keeps each
system's entire matrix resident in VMEM (4 MB at n=1024) and performs the
factorization and both triangular sweeps without touching HBM: traffic
drops to read-G + read-b + write-x, near the information-theoretic
minimum.

Two TPU-specific tricks:

* **System interleaving.**  One system's factorization is a ~220-deep
  chain of *dependent* 128x128 matmuls (Newton-Schulz inverses + panel
  updates) — pure MXU latency, ~0.8 µs per link, that throughput cannot
  hide.  Each kernel instance therefore carries ``T`` independent systems
  and emits their chains interleaved, so the MXU pipeline stays full
  (measured on v5e, n=1000: 5.4k solves/s at T=1 -> 10.3k at T=8).
* **Lane-replicated RHS.**  The RHS is carried as an [n, 128] matrix so
  every triangular-sweep op is an MXU-shaped [m, 128] matmul; column 0 is
  extracted with a one-hot contraction (no sublane transpose, which
  Mosaic dislikes).

All dots run at ``Precision.HIGHEST`` (Mosaic ``contract_precision<fp32>``).
Stability domain matches ops/block_lu.py: diagonally dominant / SPD
systems (all-resistor MNA); the per-panel inverse is Newton-Schulz with
the Jacobi start (see block_lu._inv_block).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K = 128  # panel size = MXU tile

#: Systems interleaved per kernel instance (VMEM: T x 4 MB matrices).
#: Measured on v5e at n=1000, B=1024: T=1 -> 5.4k, T=4 -> 9.5k,
#: T=6 -> 8.7k, T=8 -> 10.3k solves/s.
_T = 8

# T x (n, n) matrix scratch + RHS mats + Schur transients must fit VMEM
# (v5e: 128 MiB physical; we raise Mosaic's 16 MB default scoped limit).
_MAX_N = 1024


def lu_fits_vmem(n: int) -> bool:
    """Whether the VMEM-resident blocked-LU kernel supports n unknowns."""
    return _pad(n) <= _MAX_N


def _pad(n: int) -> int:
    return -(-n // _K) * _K


#: Trace-time override for :func:`_interpret` — ``None`` defers to the
#: session default backend.  Needed when a virtual-CPU mesh coexists with
#: an initialized TPU default backend (driver dryruns): the shard_map'ed
#: kernels must lower in interpret mode for the CPU devices even though
#: ``jax.default_backend()`` says "tpu".
_INTERPRET_FORCED: bool | None = None


@contextlib.contextmanager
def force_interpret(value: bool):
    """Force (or forbid) pallas interpret mode for calls traced inside.

    Caveat: the kernel entry points are ``jax.jit``-cached by shapes and
    static args only — a signature already traced OUTSIDE this scope
    replays its baked interpret flag (the unsafe direction fails loudly:
    a non-interpret executable cannot run on CPU devices)."""
    global _INTERPRET_FORCED
    prev = _INTERPRET_FORCED
    _INTERPRET_FORCED = value
    try:
        yield
    finally:
        _INTERPRET_FORCED = prev


def _interpret() -> bool:
    if _INTERPRET_FORCED is not None:
        return _INTERPRET_FORCED
    return jax.default_backend() != "tpu"


def _x32_scope():
    """Trace pallas calls with 32-bit index types (i64 index maps fail to
    compile on Mosaic when jax_enable_x64 is on — see pallas_tridiag)."""
    return jax.enable_x64(False)


def _eye(k: int, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (rows == cols).astype(dtype)


def _mm(a, b, precision=jax.lax.Precision.HIGHEST):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def _ns_inverse_many(Ds, iters: int, fp32_tail: int | None = None,
                     k: int = _K):
    """Interleaved Newton-Schulz inverses of T [K, K] diagonally dominant
    blocks, Jacobi start (block_lu._inv_block rationale).  The T chains
    are independent — emitting them round-robin keeps the MXU pipeline
    full where a single chain would stall on every dependency.

    ``fp32_tail`` sets how many closing iterations run 6-pass fp32; the
    earlier ones run single-pass bf16.  DEFAULT IS ALL-fp32 (tail =
    iters): near-singular Schur blocks of weakly grounded systems sit
    within bf16 input noise (~4e-3) of the ||I − X0 D|| = 1 divergence
    boundary, and full-batch residual audits on real v5e found individual
    samples tipping over for every mixed schedule tried (band path:
    residuals up to 1e16; this LU kernel: stalls to ~1e-3 median on the
    same mesh).  Callers whose blocks are provably strongly dominant may
    pass a small tail to reclaim the bf16 speed.  Interpret mode does not
    model bf16 and shows none of this.
    """
    if fp32_tail is None:
        fp32_tail = iters  # all-fp32: the safe default (see above)
    I = _eye(k, Ds[0].dtype)
    I2 = 2.0 * I
    Xs = []
    for D in Ds:
        d = jnp.sum(D * I, axis=1, keepdims=True)  # [K, 1] diagonal
        Xs.append(I * (1.0 / d))
    for it in range(iters):
        # Mosaic supports only DEFAULT (1-pass bf16) and HIGHEST (6-pass)
        # contract precisions — Precision.HIGH fails to lower, so a graded
        # 3-pass tail is not an option here.
        prec = (jax.lax.Precision.HIGHEST if it >= iters - fp32_tail
                else jax.lax.Precision.DEFAULT)
        Ts = [_mm(D, X, prec) for D, X in zip(Ds, Xs)]
        Xs = [_mm(X, I2 - T, prec) for X, T in zip(Xs, Ts)]
    return Xs


#: Adaptive-NS stopping threshold on max|I - D·X| *before* an update; the
#: closing update squares it (quadratic convergence), so stopping here
#: lands the final inverse at the fp32 noise floor.  1e-5 rather than 1e-3:
#: block-inverse error compounds through the Schur recursion with the
#: chain's conditioning (measured: 1e-3 stopping left 0.38 end-to-end
#: error on the 3-D-lattice wide-band test; 1e-5 costs ~1 extra iteration
#: per block and restores fixed-count quality).
_NS_ADAPTIVE_TOL = 1e-5


def _ns_inverse_many_adaptive(Ds, max_iters: int, k: int = _K,
                              tol: float = _NS_ADAPTIVE_TOL):
    """All-fp32 Newton-Schulz with an in-kernel convergence check.

    Fixed-count NS (``_ns_inverse_many``) must budget for the WORST block
    of the worst sample (16-22 iterations, the 14/(1−ρ) bound), but most
    blocks of most samples converge far earlier — NS is ~70% of the band
    kernel's matmuls (round-2 review item #3).  The residual
    ``max|I − D·X|`` falls out of the iteration's own first matmul
    (T = D·X), so checking costs one VPU reduction; the tile of T systems
    stops as soon as every member is below ``tol``.  The loop also runs
    LONGER than the old fixed counts when a hard sample needs it
    (``max_iters`` is the new ceiling, not the budget), which tightens the
    deep-chain safety story rather than trading it away.

    Batched [T, k, k] dot_generals replace the unrolled per-system
    round-robin: the T chains stay independent inside one op, so the MXU
    pipeline interleaving is preserved by the batch dimension itself.
    """
    D = jnp.stack(Ds)  # [T, k, k]
    I = _eye(k, D.dtype)
    d = jnp.sum(D * I, axis=2, keepdims=True)  # [T, k, 1] diagonals
    X0 = I * (1.0 / d)

    def bmm(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def cond(carry):
        _, _, r_old, it = carry
        return jnp.logical_and(it < max_iters, r_old > tol)

    def body(carry):
        X, r_new, _, it = carry
        T = bmm(D, X)
        X = bmm(X, 2.0 * I - T)
        r = jnp.max(jnp.abs(T - I))
        return X, r, r_new, it + 1

    # The stop condition lags the residual by one iteration, so the loop
    # always runs one extra squaring past detection: max|I−DX| is an
    # elementwise norm, up to k× below the operator norm that governs the
    # solve error, and the extra quadratic step erases that gap
    # scale-freely (measured: single-step stopping at 1e-5 left 2.2e-4
    # end-to-end error on the kb=256 lattice test; lagged stopping matches
    # the fixed-count kernels).
    X, _, _, _ = jax.lax.while_loop(
        cond, body,
        (X0, jnp.float32(jnp.inf), jnp.float32(jnp.inf), jnp.int32(0)),
    )
    return [X[j] for j in range(D.shape[0])]


#: Fixed Newton-Schulz budget of the no-pivot LU kernel (the 14/(1−ρ)
#: bound for its diagonally-dominant panel blocks — see _ns_inverse_many).
_LU_NS_ITERS = 14

#: Adaptive ceiling margin over the fixed budget (mirrors pallas_band's
#: _ADAPTIVE_EXTRA): the convergence check stops easy blocks early, so the
#: higher ceiling only bounds pathological samples — strictly safer.
_LU_ADAPTIVE_EXTRA = 8


def _resolve_lu_ns(newton_iters, fp32_tail):
    """(iters, tail, adaptive) from the public kwargs: None selects the
    convergence-checked adaptive NS; an explicit count keeps fixed all-fp32
    behavior exactly (pinned-budget callers / bit-compat tests)."""
    if newton_iters is None:
        it = _LU_NS_ITERS + _LU_ADAPTIVE_EXTRA
        return it, it, True
    tail = newton_iters if fp32_tail is None else fp32_tail
    return newton_iters, tail, False


def _factor_inplace_many(As, n: int, iters: int, fp32_tail: int | None = None,
                         adaptive: bool = False):
    """Right-looking no-pivot blocked LU on T VMEM matrix refs, panel
    steps interleaved across systems.

    Packed format: diagonal blocks hold Dinv, sub-diagonal panels hold L,
    super-diagonal rows hold U (Schur-stage values, untouched later)."""
    if fp32_tail is None:
        fp32_tail = iters
    nb = n // _K
    for t in range(nb):
        lo, hi = t * _K, (t + 1) * _K
        Ds = [A[lo:hi, lo:hi] for A in As]
        Xs = (_ns_inverse_many_adaptive(Ds, iters) if adaptive
              else _ns_inverse_many(Ds, iters, fp32_tail))
        for A, X in zip(As, Xs):
            A[lo:hi, lo:hi] = X
        if t < nb - 1:
            Ls = [_mm(A[hi:n, lo:hi], X) for A, X in zip(As, Xs)]
            for A, L in zip(As, Ls):
                A[hi:n, lo:hi] = L
            for A, L in zip(As, Ls):
                A[hi:n, hi:n] = A[hi:n, hi:n] - _mm(L, A[lo:hi, hi:n])


def _solve_packed_many(As, rhss, n: int):
    """Both triangular sweeps with packed factors, T systems interleaved.
    ``rhss`` are [n, 128] lane-replicated.  Returns T of x [n, 128]."""
    nb = n // _K
    ys = [[r[t * _K:(t + 1) * _K, :] for t in range(nb)] for r in rhss]
    for t in range(nb - 1):
        lo, hi = t * _K, (t + 1) * _K
        deltas = [_mm(A[hi:n, lo:hi], y[t]) for A, y in zip(As, ys)]
        for y, delta in zip(ys, deltas):
            for s in range(t + 1, nb):
                y[s] = y[s] - delta[(s - t - 1) * _K:(s - t) * _K, :]
    xs = [[None] * nb for _ in As]
    for t in range(nb - 1, -1, -1):
        lo, hi = t * _K, (t + 1) * _K
        accs = []
        for A, y, x in zip(As, ys, xs):
            acc = y[t]
            if t < nb - 1:
                xb = jnp.concatenate(x[t + 1:], axis=0)
                acc = acc - _mm(A[lo:hi, hi:n], xb)
            accs.append(acc)
        for j, (A, acc) in enumerate(zip(As, accs)):
            xs[j][t] = _mm(A[lo:hi, lo:hi], acc)  # Dinv_t @ acc
    return [jnp.concatenate(x, axis=0) for x in xs]


def _make_kernel(n: int, iters: int, fp32_tail: int,
                 adaptive: bool = False):
    def kernel(g_hbm, b_ref, out_ref, A, sem):
        i = pl.program_id(0)
        start = pl.multiple_of(i * _T, _T)
        cp = pltpu.make_async_copy(g_hbm.at[pl.ds(start, _T)], A, sem)
        cp.start()
        cp.wait()

        ones = jnp.ones((1, _K), dtype=jnp.float32)
        e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, _K), 1) == 0).astype(
            jnp.float32
        )
        As = [A.at[j] for j in range(_T)]
        # b rows [1, n] -> lane-replicated [n, 128] via outer products.
        b_mats = [
            jax.lax.dot_general(
                b_ref[0, j:j + 1, :], ones, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            for j in range(_T)
        ]

        _factor_inplace_many(As, n, iters, fp32_tail,
                             adaptive=adaptive)
        x_mats = _solve_packed_many(As, b_mats, n)

        # Column 0 back to [1, n] rows: contract the lane axis with a
        # one-hot (no sublane->lane transpose).
        for j in range(_T):
            out_ref[0, j] = jax.lax.dot_general(
                e0, x_mats[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[0]

    return kernel


def _make_multi_kernel(n: int, iters: int, fp32_tail: int,
                       adaptive: bool = False):
    def kernel(g_hbm, r_ref, out_ref, A, sem):
        i = pl.program_id(0)
        start = pl.multiple_of(i * _T, _T)
        cp = pltpu.make_async_copy(g_hbm.at[pl.ds(start, _T)], A, sem)
        cp.start()
        cp.wait()
        As = [A.at[j] for j in range(_T)]
        rhs_mats = [r_ref[j] for j in range(_T)]
        _factor_inplace_many(As, n, iters, fp32_tail,
                             adaptive=adaptive)
        x_mats = _solve_packed_many(As, rhs_mats, n)
        for j in range(_T):
            out_ref[j] = x_mats[j]

    return kernel


@functools.partial(jax.jit, static_argnames=("newton_iters", "fp32_tail"))
def pallas_lu_solve_multi(G, R, *, newton_iters: int | None = None,
                          fp32_tail: int | None = None):
    """Batched dense no-pivot MULTI-RHS solve: ``G`` [B, n, n],
    ``R`` [B, n, r] with r <= 128 -> X [B, n, r].

    The kernel's RHS carrier is an [n, 128] lane matrix either way (the
    single-RHS path lane-replicates one vector); here the lanes hold up to
    128 *distinct* right-hand sides, so a whole Schur-complement column
    block ``A⁻¹ [B | b]`` costs the same factorization plus one extra
    HBM round trip for R/X.  Same padding/stability rules as
    :func:`pallas_lu_solve`; ``G`` must already be 128-padded with a unit
    diagonal (assemble_dense(pad_to=...)).
    """
    B_in, n, _ = G.shape
    r_in = R.shape[-1]
    if n % _K or n > _MAX_N:
        raise ValueError(
            f"pallas_lu_solve_multi needs 128-padded n <= {_MAX_N}, got {n}"
        )
    if r_in > _K:
        raise ValueError(f"at most {_K} right-hand sides, got {r_in}")
    newton_iters, fp32_tail, adaptive = _resolve_lu_ns(
        newton_iters, fp32_tail)
    G = G.astype(jnp.float32)
    R = R.astype(jnp.float32)
    if r_in != _K:
        R = jnp.pad(R, [(0, 0), (0, 0), (0, _K - r_in)])
    B = -(-B_in // _T) * _T
    if B != B_in:
        pad = B - B_in
        eye = jnp.broadcast_to(jnp.eye(n, dtype=G.dtype), (pad, n, n))
        G = jnp.concatenate([G, eye], axis=0)
        R = jnp.concatenate(
            [R, jnp.ones((pad, n, _K), R.dtype)], axis=0
        )

    with _x32_scope():
        x = pl.pallas_call(
            _make_multi_kernel(n, newton_iters, fp32_tail,
                               adaptive=adaptive),
            grid=(B // _T,),
            out_shape=jax.ShapeDtypeStruct((B, n, _K), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # G stays in HBM
                pl.BlockSpec((_T, n, _K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_T, n, _K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_T, n, n), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(G, R)
    return x[:B_in, :, :r_in]


@functools.partial(jax.jit,
                   static_argnames=("newton_iters", "fp32_tail", "n_valid"))
def pallas_lu_solve(G, b, *, newton_iters: int | None = None,
                    fp32_tail: int | None = None,
                    n_valid: int | None = None):
    """Batched dense no-pivot solve, ``_T`` VMEM-resident systems per
    kernel instance.  ``G`` [B, n, n], ``b`` [B, n] (f32) -> x [B, n].

    n is padded to a multiple of 128 (identity diagonal on the pad, like
    block_lu._pad_to_block); B is padded to a multiple of ``_T``.
    Requires ``lu_fits_vmem(n)``.  Callers that assemble directly into
    the padded shape (assemble_dense(pad_to=...)) pass ``n_valid`` to get
    the unpadded solution back without a multi-GB pad copy here.
    """
    B_in, n_in, _ = G.shape
    if n_valid is not None and n_in % _K == 0:
        out_n = n_valid
    else:
        out_n = n_in
    n = _pad(n_in)
    if n > _MAX_N:
        raise ValueError(
            f"pallas_lu_solve supports n <= {_MAX_N} (VMEM budget); "
            f"got {n_in} — use ops.block_lu.blocked_solve"
        )
    newton_iters, fp32_tail, adaptive = _resolve_lu_ns(
        newton_iters, fp32_tail)
    G = G.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if n != n_in:
        pad = n - n_in
        G = jnp.pad(G, [(0, 0), (0, pad), (0, pad)])
        G = G.at[:, n_in:, n_in:].add(jnp.eye(pad, dtype=G.dtype))
        b = jnp.pad(b, [(0, 0), (0, pad)])
    B = -(-B_in // _T) * _T
    if B != B_in:
        # Pad with identity systems (unit rhs) — cheap and well-conditioned.
        pad = B - B_in
        eye = jnp.broadcast_to(jnp.eye(n, dtype=G.dtype), (pad, n, n))
        G = jnp.concatenate([G, eye], axis=0)
        b = jnp.concatenate([b, jnp.ones((pad, n), b.dtype)], axis=0)

    with _x32_scope():
        # b/out carry the (groups, T, n) layout so each block's trailing
        # two dims equal the array's own trailing dims (full-dimension
        # blocks are exempt from Mosaic's (8, 128) divisibility rule).
        x = pl.pallas_call(
            _make_kernel(n, newton_iters, fp32_tail,
                         adaptive=adaptive),
            grid=(B // _T,),
            out_shape=jax.ShapeDtypeStruct((B // _T, _T, n), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # G stays in HBM
                pl.BlockSpec((1, _T, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _T, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_T, n, n), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            # T 4 MB matrices + Schur transients exceed Mosaic's default
            # 16 MB scoped-vmem budget; v5e has 128 MiB physical VMEM.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(G, b.reshape(B // _T, _T, n))
    return x.reshape(B, n)[:B_in, :out_n]
