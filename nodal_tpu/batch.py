"""Batched parameter sweeps: vmap over stamp values.

The reference has no batching story at all (SURVEY.md §2.5 — one
``solve()`` per process).  Here a netlist topology compiles once; a sweep is
``vmap`` over the component-value vector, so assembling + factoring B
systems is a single XLA program on the MXU.  This is the ≥10k solves/sec
@1k-nodes target path (BASELINE.json).

Typical use:

    circuit = Circuit(netlist)
    sweep = BatchedSolver(circuit)                    # compile once
    results = sweep(params_batch)                     # [B, n] solutions

    # Monte Carlo tolerance analysis on resistor values:
    stats = monte_carlo(circuit, {"r1": 0.05, "r2": 0.05}, n=10_000, seed=0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nodal_tpu.circuit import Circuit
from nodal_tpu.models.stamps import StampTensors
from nodal_tpu.ops.assemble import assemble_dense
from nodal_tpu.ops import dense_solve


class BatchedSolver:
    """Compiled vmapped assemble+solve for one netlist topology.

    Args:
        circuit: the compiled circuit (topology + default params).
        dtype: batch numerics; default float32 — the TPU fast path.  Use
            ``refine=True`` to add f64-residual iterative refinement on top
            of the f32 factorization (f64-level accuracy at f32 speed for
            well-conditioned systems).
        refine: mixed-precision refinement (see ops.dense_solve).
    """

    def __init__(self, circuit: Circuit, *, dtype=jnp.float32, refine: bool = False):
        self.stamps: StampTensors = circuit.stamps
        self.dtype = dtype
        self.refine = refine

        def single(params):
            G, b = assemble_dense(self.stamps, params, dtype=dtype)
            if refine:
                return dense_solve.solve_refined(G, b)
            return dense_solve.solve_dense(G, b)

        self._solve = jax.jit(jax.vmap(single))

    def __call__(self, params_batch):
        """Solve for a [B, n_components] batch of parameter vectors.

        Returns [B, n_unknowns] solutions (potentials then branch currents).
        """
        params_batch = jnp.asarray(params_batch, dtype=self.dtype)
        if params_batch.ndim != 2:
            raise ValueError(
                f"params_batch must be [B, n_components], got {params_batch.shape}"
            )
        return self._solve(params_batch)

    def params_with(self, overrides: dict[str, np.ndarray]):
        """Build a params batch from per-component value arrays.

        ``overrides`` maps component name -> [B] array; all other components
        keep their netlist values.
        """
        arrays = list(overrides.values())
        if not arrays:
            raise ValueError("no overrides given")
        B = len(arrays[0])
        batch = np.tile(self.stamps.params, (B, 1))
        for name, values in overrides.items():
            batch[:, self.stamps.param_slot[name]] = np.asarray(values)
        return batch


def monte_carlo(
    circuit: Circuit,
    tolerances: dict[str, float],
    n: int,
    *,
    seed: int = 0,
    dtype=jnp.float32,
    refine: bool = False,
):
    """Monte Carlo component-tolerance sweep.

    Each named component's value is drawn i.i.d. normal around its netlist
    value with relative standard deviation ``tolerances[name]``.  Returns a
    dict with the solution batch and summary stats.
    """
    solver = BatchedSolver(circuit, dtype=dtype, refine=refine)
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, len(tolerances))
    overrides = {}
    for (name, rel_sigma), k in zip(tolerances.items(), keys):
        nominal = circuit.stamps.params[circuit.stamps.param_slot[name]]
        noise = 1.0 + rel_sigma * jax.random.normal(k, (n,), dtype=jnp.float32)
        overrides[name] = nominal * np.asarray(noise)
    batch = solver.params_with(overrides)
    solutions = solver(batch)
    return {
        "solutions": solutions,
        "mean": jnp.mean(solutions, axis=0),
        "std": jnp.std(solutions, axis=0),
        "params": batch,
    }
