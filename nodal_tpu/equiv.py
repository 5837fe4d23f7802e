"""Two-point equivalent resistance of resistive networks.

Parity target: reference equiv.py:22-61.  Works the same way — inject a 1 A
probe current source between the two nodes, solve, read off the potential
difference — but as a pure function over a rebuilt netlist: no ``deepcopy``,
and the probe source gets a guaranteed-fresh name (the reference hardcodes
``a1`` and silently clobbers an existing component of that name — quirk Q4,
SURVEY.md §2.4).

For large structured grids, prefer :mod:`nodal_tpu.ops.grid`'s matrix-free
path, which never materializes the netlist at all.
"""

from __future__ import annotations

from nodal_tpu.circuit import Circuit
from nodal_tpu.netlist import Netlist


def check_resistive(netlist: Netlist) -> bool:
    """True iff every component in the netlist is a resistor
    (reference equiv.py:22-28)."""
    return all(c.type == "R" for c in netlist.components.values())


def equivalent_resistance(
    netlist: Netlist, a: str, b: str, sparse: bool = False, *, dtype=None
) -> float:
    """Equivalent resistance seen through nodes ``a`` and ``b``.

    Injects a 1 A source from ``a`` to ``b`` and returns ``e(a) - e(b)``
    (reference equiv.py:31-61).

    Raises:
        ValueError: the netlist contains a non-resistor component.
        KeyError: either probe node is absent from the netlist.
    """
    if not check_resistive(netlist):
        raise ValueError("Network is not resistive")
    for node in (a, b):
        if node not in netlist.nodenum and node != netlist.ground:
            raise KeyError(f"Node `{node}` not found in netlist")

    probe = netlist.fresh_name("a1")
    probed = netlist.with_component([probe, "A", "1", a, b])
    solution = Circuit(probed, sparse=sparse, dtype=dtype).solve()

    return _potential_difference(solution, probed, a, b)


def equivalent_resistance_stamps(stamps, row_a: int, row_b: int, *,
                                 dtype=None, tol: float = 1e-9) -> float:
    """Equivalent resistance directly from compiled stamp tensors.

    ``row_a``/``row_b`` are MNA row indices of the probe nodes (-1 for the
    ground/reference node).  Injects the unit probe current straight into
    the RHS vector — no netlist mutation, no re-parse — and solves the SPD
    resistive system with preconditioned CG.  This is the path the
    ``nodal-resistance`` CLI takes for large netlists via the native parser
    (nodal_tpu.utils.native).
    """
    import jax.numpy as jnp

    from nodal_tpu.ops.sparse import solve_sparse_system

    if stamps.n != stamps.n_kcl:
        raise ValueError("Network is not resistive")
    if dtype is None:
        import jax

        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    rhs = jnp.zeros(stamps.n, dtype=dtype)
    if row_a >= 0:
        rhs = rhs.at[row_a].add(1.0)
    if row_b >= 0:
        rhs = rhs.at[row_b].add(-1.0)

    x, info = solve_sparse_system(stamps, stamps.params, dtype=dtype,
                                  tol=tol, rhs=rhs)
    if not bool(info.converged):
        raise RuntimeError(
            f"CG did not converge (residual {float(info.residual):.2e})"
        )
    ea = float(x[row_a]) if row_a >= 0 else 0.0
    eb = float(x[row_b]) if row_b >= 0 else 0.0
    return ea - eb


def _potential_difference(solution, probed, a, b):

    # Ground is the 0 V reference; the literal label "g" is special-cased to
    # 0 exactly as the reference does (equiv.py:55-61) even when a different
    # node was elected ground.
    def potential(node: str) -> float:
        if node == "g":
            return 0.0
        if node == probed.ground:
            return 0.0
        return float(solution.result[probed.nodenum[node]])

    return potential(a) - potential(b)
