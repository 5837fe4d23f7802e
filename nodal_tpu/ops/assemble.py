"""On-device MNA system assembly: one fused scatter-add per netlist.

Replaces the reference's per-element ``G[i, j] +=`` writes into numpy /
``dok_matrix`` (reference nodal.py:347-397, the measured bottleneck —
9.25 s stamping vs 0.79 s solve at 40k nodes, SURVEY.md §2.3).  Here the
index arrays are compile-time constants, so XLA lowers the whole assembly to
a single scatter-add; only the *values* depend on runtime parameters, which
makes ``vmap`` over parameter sweeps free of re-assembly cost.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from nodal_tpu.models.stamps import StampTensors, stamp_values


def assemble_dense(stamps: StampTensors, params, dtype=None):
    """Assemble the dense MNA system ``(G, b)`` for one parameter vector.

    jit/vmap-friendly.  ``params`` is the component-value vector in netlist
    order (``stamps.params`` holds the netlist's own values).
    """
    params = jnp.asarray(params, dtype=dtype)
    g_vals, rhs_vals = stamp_values(stamps, params)
    n = stamps.n
    G = jnp.zeros((n, n), dtype=params.dtype).at[stamps.g_rows, stamps.g_cols].add(
        g_vals
    )
    b = jnp.zeros(n, dtype=params.dtype).at[stamps.rhs_rows].add(rhs_vals)
    return G, b


def assemble_rhs(stamps: StampTensors, params, dtype=None):
    """Assemble only the RHS vector ``b`` (for probe-source sweeps where G
    is fixed)."""
    params = jnp.asarray(params, dtype=dtype)
    _, rhs_vals = stamp_values(stamps, params)
    return jnp.zeros(stamps.n, dtype=params.dtype).at[stamps.rhs_rows].add(rhs_vals)


def bandwidth(stamps: StampTensors) -> int:
    """Matrix bandwidth of the stamp template in natural node order.

    The stamp compiler's structural view of the circuit: 1 means
    tridiagonal (chain/ladder topologies), enabling the PCR fast path."""
    if len(stamps.g_rows) == 0:
        return 0
    return int(np.max(np.abs(stamps.g_rows.astype(np.int64) - stamps.g_cols)))


def _band_entry_indices(stamps: StampTensors):
    """Host-side: stamp-entry index lists per diagonal offset (-1, 0, +1),
    cached on the stamps object."""
    cached = getattr(stamps, "_band_indices", None)
    if cached is None:
        off = stamps.g_rows.astype(np.int64) - stamps.g_cols
        cached = {
            o: np.nonzero(off == o)[0].astype(np.int32) for o in (-1, 0, 1)
        }
        stamps._band_indices = cached  # type: ignore[attr-defined]
    return cached


def assemble_tridiag(stamps: StampTensors, params, dtype=None):
    """Assemble the three bands + RHS directly (no dense G at all).

    Valid when ``bandwidth(stamps) <= 1``.  Returns ``(dl, d, du, b)``,
    each [n]: per-system assembly traffic drops from O(n²) to O(n).
    """
    params = jnp.asarray(params, dtype=dtype)
    g_vals, rhs_vals = stamp_values(stamps, params)
    n = stamps.n
    bands = _band_entry_indices(stamps)

    def band(offset):
        idx = bands[offset]
        out = jnp.zeros(n, dtype=params.dtype)
        return out.at[stamps.g_rows[idx]].add(g_vals[idx])

    dl = band(1)  # G[i, i-1]
    d = band(0)
    du = band(-1)  # G[i, i+1]
    b = jnp.zeros(n, dtype=params.dtype).at[stamps.rhs_rows].add(rhs_vals)
    return dl, d, du, b
