"""Native skyline (profile) LDLᵀ direct solver for SPD node blocks.

The host-direct tier of the bordered elimination (ops/sparse_schur.py):
RCM-order the resistively-grounded node block, pack its lower profile,
factor once in C++ (cpp/skyline.cpp), then answer every right-hand side —
the YB border columns, the source column, defect-correction passes, and
adjoint/transpose solves (A11 is symmetric) — with one O(profile)
forward/backward sweep.  This is the role SuperLU plays for the reference
(/root/reference/nodal/nodal.py:325), built natively instead of imported:
no XLA program, no compile latency, no Krylov iteration on the critical
path.

Feasibility is decided from the pattern alone (:func:`plan_skyline`):
RCM keeps mesh-like circuit graphs narrow (a 100×1000 grid profiles at
~100 entries/row), and the caps below bound memory and factor FLOPs so
pathological orderings fall back to the AMG-CG tiers automatically.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

_CPP = os.path.join(os.path.dirname(__file__), "..", "..", "cpp",
                    "skyline.cpp")

#: Profile-entry cap (f64 each): 2e8 ≈ 1.6 GB of factor storage.
MAX_PROFILE_NNZ = int(float(os.environ.get(
    "NODAL_TPU_SKYLINE_MAX_NNZ", "2e8")))
#: Factor-FLOP cap: ~4e10 MACs ≈ a few seconds single-threaded.
MAX_FACTOR_FLOPS = float(os.environ.get(
    "NODAL_TPU_SKYLINE_MAX_FLOPS", "4e10"))


class SkylineUnavailable(RuntimeError):
    pass


@lru_cache(maxsize=1)
def _load():
    src = os.path.abspath(_CPP)
    if not os.path.exists(src):
        raise SkylineUnavailable(f"source not found: {src}")
    # -march=native: the factor/solve inner loops are FMA chains — the
    # baseline x86-64 target leaves AVX2/FMA on the table.  The .so is
    # cached per (source, flags) hash in a per-machine tmp dir, so a
    # host-specific binary never travels.
    flags = ["-O3", "-march=native", "-funroll-loops", "-std=c++17",
             "-shared", "-fPIC", "-fopenmp"]
    with open(src, "rb") as fh:
        digest = hashlib.sha256(
            fh.read() + " ".join(flags).encode()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "nodal_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"skyline_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", *flags, src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise SkylineUnavailable(
                f"native build failed: {detail}") from None
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    lib.sk_factor.restype = ctypes.c_int64
    lib.sk_factor.argtypes = [ctypes.c_int64] + [ctypes.c_void_p] * 4
    lib.sk_solve.restype = None
    lib.sk_solve.argtypes = ([ctypes.c_int64] + [ctypes.c_void_p] * 5
                             + [ctypes.c_int64])
    lib.sk_solve_blocked.restype = None
    lib.sk_solve_blocked.argtypes = lib.sk_solve.argtypes
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


@dataclass(frozen=True)
class SkylinePlan:
    """Pattern-only factorization plan (reusable across parameter values)."""

    n: int
    perm: np.ndarray      # int64[n]: position -> original index (RCM)
    iperm: np.ndarray     # int64[n]: original index -> position
    jmin: np.ndarray      # int32[n]: first column of each permuted row
    rowptr: np.ndarray    # int64[n+1]: row spans into the profile array
    profile_nnz: int
    factor_flops: float


@dataclass
class SkylineFactor:
    plan: SkylinePlan
    sky: np.ndarray   # float64[profile_nnz]: L off-diagonals
    diag: np.ndarray  # float64[n]: D


def plan_skyline(
    n: int,
    rows: np.ndarray,
    cols: np.ndarray,
    *,
    max_nnz: int | None = None,
    max_flops: float | None = None,
) -> SkylinePlan | None:
    """RCM + profile computation from the symmetric pattern; ``None`` when
    the profile blows past the memory/FLOP caps (caller falls back)."""
    from nodal_tpu.ops.band import rcm_order

    if n == 0:
        return SkylinePlan(0, np.zeros(0, np.int64), np.zeros(0, np.int64),
                           np.zeros(0, np.int32), np.zeros(1, np.int64),
                           0, 0.0)
    perm = np.asarray(rcm_order(n, rows, cols), dtype=np.int64)
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n, dtype=np.int64)

    pi = iperm[np.asarray(rows, dtype=np.int64)]
    pj = iperm[np.asarray(cols, dtype=np.int64)]
    hi = np.maximum(pi, pj)
    lo = np.minimum(pi, pj)
    jmin = np.arange(n, dtype=np.int64)
    np.minimum.at(jmin, hi, lo)
    widths = np.arange(n, dtype=np.int64) - jmin
    profile_nnz = int(widths.sum())
    # Off-diagonal row j of the factor is consumed as a dot-product
    # operand once per later row overlapping it; the classic estimate
    # Σ w_i² / 2 bounds the MAC count.
    flops = float(np.sum(widths.astype(np.float64) ** 2)) / 2.0
    if profile_nnz > (max_nnz if max_nnz is not None else MAX_PROFILE_NNZ):
        return None
    if flops > (max_flops if max_flops is not None else MAX_FACTOR_FLOPS):
        return None
    rowptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(widths, out=rowptr[1:])
    return SkylinePlan(n, perm, iperm, jmin.astype(np.int32), rowptr,
                       profile_nnz, flops)


def factor(
    plan: SkylinePlan,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
) -> SkylineFactor | None:
    """Pack COO values (duplicates accumulate) into the profile and factor
    in place.  ``None`` on a non-positive pivot (not SPD — fall back)."""
    lib = _load()
    n = plan.n
    sky = np.zeros(plan.profile_nnz, dtype=np.float64)
    diag = np.zeros(n, dtype=np.float64)
    pi = plan.iperm[np.asarray(rows, dtype=np.int64)]
    pj = plan.iperm[np.asarray(cols, dtype=np.int64)]
    vals = np.asarray(vals, dtype=np.float64)
    on_diag = pi == pj
    np.add.at(diag, pi[on_diag], vals[on_diag])
    low = pi > pj  # keep the lower triangle only (input is symmetric)
    ii, jj, vv = pi[low], pj[low], vals[low]
    slots = plan.rowptr[ii] + (jj - plan.jmin[ii])
    np.add.at(sky, slots, vv)
    rc = lib.sk_factor(n, _ptr(plan.jmin), _ptr(plan.rowptr), _ptr(sky),
                       _ptr(diag))
    if rc != 0:
        return None
    return SkylineFactor(plan, sky, diag)


def solve(fact: SkylineFactor, B: np.ndarray) -> np.ndarray:
    """Solve A X^T = B^T for a [c, n] batch of right-hand-side rows."""
    lib = _load()
    plan = fact.plan
    B = np.asarray(B, dtype=np.float64)
    squeeze = B.ndim == 1
    if squeeze:
        B = B[None]
    X = np.ascontiguousarray(B[:, plan.perm])
    # Blocked kernel for multi-RHS batches: streams the factor once per
    # 48-RHS block instead of once per RHS (the per-RHS sweep measured
    # 0.26 GFLOP/s on a 8192-RHS border — pure L-traffic bound).
    fn = lib.sk_solve if X.shape[0] == 1 else lib.sk_solve_blocked
    fn(plan.n, _ptr(plan.jmin), _ptr(plan.rowptr),
       _ptr(fact.sky), _ptr(fact.diag), _ptr(X), X.shape[0])
    out = X[:, plan.iperm]
    return out[0] if squeeze else out


def available() -> bool:
    try:
        _load()
        return True
    except SkylineUnavailable:
        return False
