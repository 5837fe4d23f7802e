"""On-device MNA system assembly: one fused scatter-add per netlist.

Replaces the reference's per-element ``G[i, j] +=`` writes into numpy /
``dok_matrix`` (reference nodal.py:347-397, the measured bottleneck —
9.25 s stamping vs 0.79 s solve at 40k nodes, SURVEY.md §2.3).  Here the
index arrays are compile-time constants, so XLA lowers the whole assembly to
a single scatter-add; only the *values* depend on runtime parameters, which
makes ``vmap`` over parameter sweeps free of re-assembly cost.
"""

from __future__ import annotations

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
