"""Banded (block-tridiagonal) direct solver: host planning + XLA reference.

Most real circuits are *locally* connected — 2D meshes, buses, ladders
with cross-ties — so after a bandwidth-minimizing reordering their MNA
matrix has half-bandwidth w far below n.  The dense blocked LU
(ops/block_lu.py, ops/pallas_block_lu.py) spends O(n³/3) MXU flops and
4 MB/system of HBM traffic on a matrix that is ~99% structural zeros.

This module reorders the system with reverse Cuthill-McKee (host-side,
once per topology), stores it block-tridiagonally with kb×kb blocks
(kb ∈ {128, 256, 384} — the smallest multiple of the MXU tile that
covers the half-bandwidth), and solves with no-pivot block-Thomas:

    S_0 = D_0
    S_i = D_i − L_i S_{i-1}^{-1} U_{i-1}        (Schur recursion)
    x via one forward + one backward block sweep

Work drops from O(n³/3) to O(n·K²) and per-system memory from n² to
3·K·n — at n=1024 that is ~2.7× fewer matmul passes and ~2.7× less HBM
traffic than the full blocked LU.  The Schur recursion preserves diagonal
dominance (same no-pivot stability domain as ops/block_lu.py: the block
sequence here *is* the blocked-LU elimination restricted to the band).

The reference stamps into scipy containers and calls SuperLU with no
structure awareness (reference nodal.py:325,350); there is no banded or
reordered path to port — this is the TPU-native replacement.

Layout: ``W[b, B_r, r, c]`` holds block row ``B_r`` as the [K, 3K]
concatenation ``[L | D | U]`` (columns ``(B_r−1)·K .. (B_r+2)·K`` of the
reordered matrix).  :func:`band_thomas_solve` is the run-anywhere XLA
implementation (used on CPU, for f64 refinement, and as the test oracle);
ops/pallas_band.py holds the VMEM-resident TPU kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from nodal_tpu.models.stamps import StampTensors, stamp_values

_K = 128  # MXU tile; block sizes are multiples of this

#: Candidate block sizes.  Cost scales as n·kb², so the plan picks the
#: smallest that covers the half-bandwidth; past 384 the dense/AMG paths
#: win and the plan returns None.
_KB_CHOICES = (128, 256, 384)


def rcm_order(n: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the symmetrized sparsity graph.

    Returns ``order`` with ``order[new] = old``; disconnected components
    are traversed in min-degree order.  Host work, done once per topology
    and cached on the stamps.  Uses scipy.sparse.csgraph's C implementation
    when available — the pure-numpy BFS below walks edges in interpreter
    time (~seconds per 1M edges, round-2 advisor finding) and is kept only
    as a fallback.
    """
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        off = rows != cols
        adj = sp.csr_matrix(
            (np.ones(int(off.sum()), dtype=np.float32),
             (rows[off], cols[off])),
            shape=(n, n),
        )
        perm = reverse_cuthill_mckee(adj, symmetric_mode=False)
        return np.asarray(perm, dtype=np.int64)
    except ImportError:  # pragma: no cover - scipy is a baked-in dep
        pass
    # Symmetrize + dedup; drop the diagonal.
    r = np.concatenate([rows, cols]).astype(np.int64)
    c = np.concatenate([cols, rows]).astype(np.int64)
    keep = r != c
    r, c = r[keep], c[keep]
    key = r * n + c
    key = np.unique(key)
    r, c = key // n, key % n
    # CSR-ish adjacency: neighbors of i are adj[ptr[i]:ptr[i+1]], sorted by
    # (degree, id) so the BFS visits low-degree neighbors first (the CM
    # heuristic).
    degree = np.bincount(r, minlength=n)
    order_by_deg = np.lexsort((c, degree[c], r))
    r, c = r[order_by_deg], c[order_by_deg]
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(r, minlength=n), out=ptr[1:])

    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    seeds = np.lexsort((np.arange(n), degree))  # min-degree component seeds
    for seed in seeds:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        head, pos = pos, pos + 1
        while head < pos:  # BFS; `order` doubles as the queue
            u = order[head]
            head += 1
            for v in c[ptr[u]:ptr[u + 1]]:
                if not visited[v]:
                    visited[v] = True
                    order[pos] = v
                    pos += 1
    return order[::-1].copy()  # the "reverse" in RCM


@dataclass
class BandPlan:
    """Host-side plan turning COO stamp entries into block-band storage.

    Built once per (topology, unknown-subset) by :func:`make_band_plan`;
    consumed by :meth:`assemble` inside jit/vmap (all arrays here are
    compile-time constants).
    """

    n: int            # unknowns covered by this plan
    kb: int           # block size (multiple of the 128 MXU tile)
    n_pad: int        # n rounded up to a multiple of kb
    nb: int           # number of kb-sized block rows
    halfbw: int       # half-bandwidth after reordering
    order: np.ndarray  # [n] order[new] = old
    rank: np.ndarray   # [n] rank[old] = new
    sel: np.ndarray    # stamp-entry indices included in this plan
    g_flat: np.ndarray    # flat scatter targets into [n_pad * 3K]
    rhs_sel: np.ndarray   # rhs-entry indices with row < n
    rhs_perm_rows: np.ndarray  # permuted rhs rows
    unit_flat: np.ndarray      # unit-diagonal flat targets for pad rows

    def assemble(self, stamps: StampTensors, params, dtype=None):
        """Band + RHS assembly for one parameter vector (jit/vmap-friendly).

        Returns ``(W, b)``: ``W`` [nb, kb, 3kb] block-band storage, ``b``
        [n_pad] reordered RHS.
        """
        params = jnp.asarray(params, dtype=dtype)
        g_vals, rhs_vals = stamp_values(stamps, params)
        return self.assemble_from_values(g_vals, rhs_vals)

    def assemble_from_values(self, g_vals, rhs_vals):
        """Like :meth:`assemble`, from already-evaluated stamp values —
        for callers that also scatter the same values elsewhere (the Schur
        band assembler) and must not trace the evaluation twice.

        Uses the gather-fold construction when the per-row entry count is
        small (the common case — local circuits have a handful of stamps
        per matrix row): W is produced by ONE fused output pass comparing
        each row's few band-column targets against an iota, instead of a
        scatter-add into a zero-initialized [n_pad·3kb] buffer.  XLA's TPU
        scatter measured ~4x off stream bandwidth here (14 ms of the 57 ms
        batched mesh solve at B=1024); the same rewrite removed the 13 ms
        tridiagonal-assembly scatter in round 2.  Falls back to the
        scatter for dense rows.
        """
        gf = self._gather_fold()
        if gf is not None:
            entry_ids, cols, valid, fill = gf
            # Masked gather: real slots read their stamp value, padding
            # slots contribute 0, pad-row unit diagonals contribute 1 —
            # no assumption about len(g_vals) (self.sel indexes the FULL
            # raw stamp vector, whose length the plan doesn't know).
            rowvals = (g_vals[entry_ids] * valid.astype(g_vals.dtype)
                       + fill.astype(g_vals.dtype))     # [n_pad, width]
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (self.n_pad, cols.shape[1], 3 * self.kb), 2
            )
            # Fused broadcast-compare-reduce: each output element reads the
            # row's `width` (value, column) pairs — no scatter, one pass.
            W = jnp.sum(
                rowvals[:, :, None]
                * (cols[:, :, None] == iota).astype(g_vals.dtype),
                axis=1,
            ).reshape(self.nb, self.kb, 3 * self.kb)
        else:
            flat = jnp.zeros(self.n_pad * 3 * self.kb, dtype=g_vals.dtype)
            flat = flat.at[self.g_flat].add(g_vals[self.sel])
            if len(self.unit_flat):
                flat = flat.at[self.unit_flat].add(1.0)
            W = flat.reshape(self.nb, self.kb, 3 * self.kb)
        b = jnp.zeros(self.n_pad, dtype=rhs_vals.dtype)
        b = b.at[self.rhs_perm_rows].add(rhs_vals[self.rhs_sel])
        return W, b

    #: Rows denser than this fall back to the scatter path (the gather-fold
    #: pass costs width compares per output element).
    _GATHER_FOLD_MAX_WIDTH = 16

    def _gather_fold(self):
        """Lazily-built per-row gather lists: (entry_ids, band_cols, valid,
        fill), each [n_pad, width], or None when rows are too dense.

        ``entry_ids`` indexes the raw stamp value vector (``self.sel``
        semantics); ``valid`` is 1.0 on real slots and 0.0 on padding /
        unit slots (whose gathered value is discarded); ``fill`` carries
        the constant contribution of non-real slots (1.0 for pad-row unit
        diagonals, 0.0 otherwise).
        """
        cached = self.__dict__.get("_gf_cache", False)
        if cached is not False:
            return cached
        import os

        out = None
        if os.environ.get("NODAL_TPU_BAND_ASSEMBLY") != "scatter":
            rows = self.g_flat // (3 * self.kb)
            cols = self.g_flat % (3 * self.kb)
            urows = self.unit_flat // (3 * self.kb)
            ucols = self.unit_flat % (3 * self.kb)
            all_rows = np.concatenate([rows, urows])
            counts = np.bincount(all_rows, minlength=self.n_pad)
            width = int(counts.max()) if len(all_rows) else 1
            if width <= self._GATHER_FOLD_MAX_WIDTH and len(self.sel):
                entry_ids = np.zeros((self.n_pad, width), dtype=np.int64)
                band_cols = np.zeros((self.n_pad, width), dtype=np.int32)
                valid = np.zeros((self.n_pad, width), dtype=np.float32)
                fill = np.zeros((self.n_pad, width), dtype=np.float32)
                slot = np.zeros(self.n_pad, dtype=np.int64)
                for r, i, cc in zip(rows, self.sel.astype(np.int64),
                                    cols.astype(np.int32)):
                    entry_ids[r, slot[r]] = i
                    band_cols[r, slot[r]] = cc
                    valid[r, slot[r]] = 1.0
                    slot[r] += 1
                for r, cc in zip(urows, ucols.astype(np.int32)):
                    band_cols[r, slot[r]] = cc
                    fill[r, slot[r]] = 1.0
                    slot[r] += 1
                # numpy, not jnp: the cache outlives any single trace, and
                # device arrays created inside shard_map are tracers.
                out = (entry_ids, band_cols, valid, fill)
        self.__dict__["_gf_cache"] = out
        return out

    def rhs_to_band(self, rhs, dtype=None):
        """Natural-order [..., m] RHS (m ≥ n; only the first-n banded
        unknowns are used — the Schur paths pass the full MNA vector) ->
        [..., n_pad] in band order, zero-padded.  The inverse of
        :meth:`unpermute` on the solution side; shared by every caller
        that feeds an explicit RHS (adjoint solves, refinement passes)."""
        dt = dtype if dtype is not None else rhs.dtype
        out = jnp.zeros(rhs.shape[:-1] + (self.n_pad,), dt)
        sel = jnp.take(rhs, jnp.asarray(self.order), axis=-1).astype(dt)
        return out.at[..., : self.n].set(sel)

    def unpermute(self, x, *, rows_axis: int = -1):
        """Map a solution on the reordered unknowns back to natural order.

        ``rows_axis`` names the axis of length ``n_pad`` that carries the
        reordered unknowns (pass -2 for multi-RHS [..., n_pad, r] arrays —
        an explicit argument, because shape-sniffing would misfire when the
        RHS count happens to equal n_pad).  Returns length-``n`` on that
        axis, in the original MNA numbering.
        """
        assert x.shape[rows_axis] == self.n_pad, (x.shape, self.n_pad)
        return jnp.take(x, jnp.asarray(self.rank), axis=rows_axis)


#: Plan nothing above this many unknowns.  Keeps auto-selection cheap on
#: very large netlists (round-2 advisor finding) — RCM itself is scipy C
#: code, but the scatter-target/gather-table construction is O(nnz) numpy
#: per topology.  The bound must stay ABOVE any size the band tiers can
#: actually serve: callers demote a None plan to dense/iterative paths,
#: and an over-tight cap silently pushed 75k-node narrow meshes onto a
#: [B, n, n] dense tier that cannot exist (round-3 review finding).  At
#: 262144 unknowns band storage is ~400 MB/sample f32 — past that no
#: direct batch tier is sensible and the stencil/AMG paths take over.
_BAND_PLAN_MAX_N = 262144


def make_band_plan(
    stamps: StampTensors, n_limit: int | None = None,
    max_kb: int = _KB_CHOICES[-1],
) -> BandPlan | None:
    """Band plan for the leading ``n_limit`` unknowns (default: all).

    ``n_limit=stamps.n_kcl`` plans the resistive node block only — the
    Schur branch-equation path solves that block banded and keeps the few
    branch rows dense.  Returns None when the reordered half-bandwidth
    exceeds ``max_kb`` (the block-tridiagonal layout can't represent it).
    """
    n = stamps.n if n_limit is None else n_limit
    if n == 0 or n > _BAND_PLAN_MAX_N:
        return None
    if n_limit is None:
        sel = np.arange(len(stamps.g_rows), dtype=np.int64)
    else:
        sel = np.nonzero((stamps.g_rows < n) & (stamps.g_cols < n))[0]
    rows = stamps.g_rows[sel].astype(np.int64)
    cols = stamps.g_cols[sel].astype(np.int64)
    if len(rows) == 0:
        return None
    natural_bw = int(np.max(np.abs(rows - cols)))
    order = rcm_order(n, rows, cols)
    rank = np.argsort(order)
    rcm_bw = int(np.max(np.abs(rank[rows] - rank[cols])))
    if natural_bw <= rcm_bw:  # keep the netlist's own ordering if no worse
        order = np.arange(n, dtype=np.int64)
        rank = order
        halfbw = natural_bw
    else:
        halfbw = rcm_bw
    kb = next((k for k in _KB_CHOICES if halfbw <= k <= max_kb), None)
    if kb is None:
        return None
    n_pad = -(-n // kb) * kb
    nb = n_pad // kb
    pr, pc = rank[rows], rank[cols]
    # Block-band flat index: row r', column c' lands in block B_r = r'//kb
    # at band column c' − (B_r − 1)·kb ∈ [0, 3kb)  (guaranteed by
    # halfbw ≤ kb).
    g_flat = pr * (3 * kb) + (pc - (pr // kb) * kb + kb)
    pad_rows = np.arange(n, n_pad, dtype=np.int64)
    unit_flat = pad_rows * (3 * kb) + (pad_rows % kb) + kb
    rhs_sel = np.nonzero(stamps.rhs_rows < n)[0]
    rhs_perm_rows = rank[stamps.rhs_rows[rhs_sel].astype(np.int64)]
    return BandPlan(
        n=n, kb=kb, n_pad=n_pad, nb=nb, halfbw=halfbw,
        order=order, rank=rank, sel=sel,
        g_flat=g_flat.astype(np.int64),
        rhs_sel=rhs_sel, rhs_perm_rows=rhs_perm_rows.astype(np.int64),
        unit_flat=unit_flat,
    )


def band_plan(stamps: StampTensors) -> BandPlan | None:
    """Cached full-system band plan (None if not bandable)."""
    cached = getattr(stamps, "_band_plan", False)
    if cached is False:
        cached = make_band_plan(stamps)
        stamps._band_plan = cached  # type: ignore[attr-defined]
    return cached


def node_band_plan(stamps: StampTensors) -> BandPlan | None:
    """Cached band plan of the resistive node block (for the Schur path)."""
    cached = getattr(stamps, "_node_band_plan", False)
    if cached is False:
        cached = make_band_plan(stamps, n_limit=stamps.n_kcl)
        stamps._node_band_plan = cached  # type: ignore[attr-defined]
    return cached


def band_matvec(W, x):
    """Block-band matvec ``y = W·x``: x [..., n_pad] -> y [..., n_pad].

    One f64 pass of this is the residual audit / refinement workhorse —
    O(n·K) instead of the dense O(n²).
    """
    nb, kb = W.shape[-3], W.shape[-2]
    xb = x.reshape(x.shape[:-1] + (nb, kb))
    zeros = jnp.zeros_like(xb[..., :1, :])
    x_lo = jnp.concatenate([zeros, xb[..., :-1, :]], axis=-2)
    x_hi = jnp.concatenate([xb[..., 1:, :], zeros], axis=-2)
    L = W[..., :, :kb]
    D = W[..., :, kb:2 * kb]
    U = W[..., :, 2 * kb:]
    hp = jax.lax.Precision.HIGHEST
    y = (
        jnp.einsum("...ij,...j->...i", L, x_lo, precision=hp)
        + jnp.einsum("...ij,...j->...i", D, xb, precision=hp)
        + jnp.einsum("...ij,...j->...i", U, x_hi, precision=hp)
    )
    return y.reshape(x.shape)


def band_thomas_solve(W, b):
    """No-pivot block-Thomas solve — the run-anywhere XLA implementation.

    ``W`` [..., nb, K, 3K], ``b`` [..., nb*K] (vector) or [..., nb*K, r]
    (multi-RHS).  jit/vmap-friendly; any float dtype (this is also the f64
    path).  Stability domain: diagonally dominant / SPD systems, like
    ops.block_lu.  On TPU the Pallas kernel (ops/pallas_band.py) replaces
    this with a VMEM-resident version.
    """
    nb, kb = W.shape[-3], W.shape[-2]
    vector_rhs = b.ndim == W.ndim - 2
    if vector_rhs:
        b = b[..., None]
    r = b.shape[-1]
    bb = b.reshape(b.shape[:-2] + (nb, kb, r))
    # Scan axis must lead: [..., nb, K, c] -> [nb, ..., K, c].
    lead = lambda t: jnp.moveaxis(t, -3, 0)  # noqa: E731
    Ls = lead(W[..., :, :kb])
    Ds = lead(W[..., :, kb:2 * kb])
    Us = lead(W[..., :, 2 * kb:])
    bs = lead(bb)

    def fwd(carry, inp):
        Cp, yp = carry
        L, D, U, bi = inp
        S = D - L @ Cp
        rhs = bi - L @ yp
        sol = jnp.linalg.solve(S, jnp.concatenate([U, rhs], axis=-1))
        C = sol[..., :kb]
        y = sol[..., kb:]
        return (C, y), (C, y)

    shape = W.shape[:-3]
    dtype = b.dtype
    C0 = jnp.zeros(shape + (kb, kb), dtype)
    y0 = jnp.zeros(shape + (kb, r), dtype)
    _, (Cs, ys) = jax.lax.scan(fwd, (C0, y0), (Ls, Ds, Us, bs))

    def bwd(x_next, inp):
        C, y = inp
        x = y - C @ x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(y0), (Cs, ys), reverse=True)
    x = jnp.moveaxis(xs, 0, -3).reshape(b.shape)
    return x[..., 0] if vector_rhs else x
