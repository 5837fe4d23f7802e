"""Benchmark harness: one JSON line on stdout.

Primary metric: batched solves/sec on a 1k-node ladder network (the
reference's dense repeat-solve measures 36.2 solves/s on CPU —
BASELINE.md).  Extra fields report the 1M-node resistor-grid multigrid-CG
solve (reference extrapolation: ~4-5 min of Python stamping alone before
SuperLU even starts).

Runs on whatever jax's default backend is (the real TPU under the driver);
``--platform cpu`` forces the host backend for local smoke runs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Reference baseline: dense repeat solve on 1k-unknown ladder, measured on
# the session CPU (BASELINE.md): 27.6 ms/solve.
BASELINE_SOLVES_PER_SEC = 36.2


def _ladder_circuit(n_nodes):
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.utils.gridgen import ladder_rows

    return Circuit(Netlist.from_rows(ladder_rows(n_nodes)))


def _mesh_circuit(n_nodes):
    """General-topology benchmark circuit: a 2D resistor mesh (bandwidth
    ~min(h,w), NOT a chain) with a current source — exercises the blocked
    no-pivot LU / Pallas LU path instead of the tridiag PCR fast path."""
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.utils.gridgen import grid_rows

    h = 25
    w = (n_nodes + h - 1) // h
    rows = list(grid_rows(h, w, (0, 0), (h - 1, w - 1)))
    rows.append(["src", "A", "1", "1", "g"])
    return Circuit(Netlist.from_rows(rows))


def _branch_circuit(n_nodes):
    """Branch-equation benchmark circuit: the same mesh driven by a
    voltage source plus a VCCS — MNA gains branch rows (zero diagonal),
    exercising the Schur-complement path."""
    from nodal_tpu import Circuit, Netlist
    from nodal_tpu.utils.gridgen import grid_rows

    h = 25
    w = (n_nodes + h - 1) // h
    rows = list(grid_rows(h, w, (0, 0), (h - 1, w - 1)))
    rows.append(["e1", "E", "2", "1", "g"])
    rows.append(["d1", "VCCS", "0.5", "n3_3", "g", "1", "g"])
    return Circuit(Netlist.from_rows(rows))


def bench_batched_solves(circuit, batch: int, reps: int, method: str = "auto"):
    """Throughput of the structure-aware batched solver.

    Timing is forced honest: a device-side checksum of every solution batch
    is fetched to the host inside the timed region (``block_until_ready``
    alone does not synchronize through the remote-TPU tunnel).
    """
    import jax
    import jax.numpy as jnp

    from nodal_tpu.batch import BatchedSolver

    solver = BatchedSolver(circuit, dtype=jnp.float32, method=method)

    rng = np.random.default_rng(0)
    base = circuit.stamps.params.astype(np.float32)
    mega = jnp.asarray(
        base * (1.0 + 0.05 * rng.standard_normal((batch, len(base)))),
        dtype=jnp.float32,
    )

    checksum = jax.jit(lambda p: jnp.sum(solver._solve(p)))
    # Warm-up/compile.
    out = solver(mega)
    float(checksum(mega))

    t0 = time.perf_counter()
    for _ in range(reps):
        _ = float(checksum(mega))  # scalar fetch = full completion barrier
    dt = (time.perf_counter() - t0) / reps
    solves_per_sec = batch / dt

    # Accuracy spot check: f64 reference solve of the same perturbed sample,
    # assembled on the host CPU backend (native f64; no emulated-f64 TPU
    # compile).
    from nodal_tpu.ops.assemble import assemble_dense

    sample = np.asarray(mega[0], dtype=np.float64)
    with jax.default_device(jax.devices("cpu")[0]):
        G, b = assemble_dense(
            circuit.stamps, jnp.asarray(sample, dtype=jnp.float64)
        )
        expected = np.linalg.solve(np.asarray(G), np.asarray(b))
    got = np.asarray(out[0], dtype=np.float64)
    err = float(np.max(np.abs(got - expected)) / np.max(np.abs(expected)))
    # Full-batch residual audit (assembly-free COO matvec, f64 on host):
    # sample-0 error checks alone once hid a 40%-of-samples divergence of
    # the deep-chain bf16 Newton-Schulz schedule.
    audit = float(jnp.max(solver.residuals(np.asarray(mega), np.asarray(out))))
    return solves_per_sec, dt, err, audit, solver.method


def bench_grid(n: int, tol: float, k: int = 4):
    """1M-node grid equivalent resistance.

    Reports BOTH the single-call latency (includes one host->device
    dispatch round trip — ~25 ms through the remote-TPU tunnel, which
    dominates now that the solve itself converges in single digits) and
    the marginal per-solve time measured as k chained solves in ONE
    program with one scalar fetch.
    """
    import jax
    import jax.numpy as jnp

    from nodal_tpu.ops.grid import grid_equivalent_resistance

    a, b = (n // 2, n // 2), (n // 2 + 1, n // 2 + 2)
    run = jax.jit(
        lambda: grid_equivalent_resistance(n, n, a, b, dtype=jnp.float32, tol=tol)
    )
    # Warm-up/compile; scalar fetches force completion.
    r, info = run()
    float(r)
    t0 = time.perf_counter()
    r, info = run()
    r = float(r)
    iters = int(info.iterations)
    dt = time.perf_counter() - t0

    @jax.jit
    def run_k():
        # Chain k solves through the probe offset so XLA cannot collapse
        # them; accumulate a checksum so one fetch drains everything.
        total = jnp.float32(0.0)
        for i in range(k):
            ri, _ = grid_equivalent_resistance(
                n, n, a, (n // 2 + 1 + i, n // 2 + 2), dtype=jnp.float32,
                tol=tol,
            )
            total = total + ri
        return total

    float(run_k())
    t0 = time.perf_counter()
    float(run_k())
    marginal = (time.perf_counter() - t0) / k
    return r, dt, iters, marginal


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None, help="force jax platform")
    parser.add_argument("--nodes", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=16384)
    parser.add_argument("--general-batch", type=int, default=1024,
                        help="batch for the dense-path metrics ([B, n, n] "
                        "matrices must fit HBM)")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--method", default="auto")
    parser.add_argument("--skip-general", action="store_true")
    parser.add_argument("--grid", type=int, default=1024)
    parser.add_argument("--grid-tol", type=float, default=1e-6)
    parser.add_argument("--skip-grid", action="store_true")
    parser.add_argument("--midsize-nodes", type=int, default=5000,
                        help="streaming-band-tier metric (0 disables): a "
                        "25-row mesh past the VMEM-resident kernel's limit")
    parser.add_argument("--midsize-batch", type=int, default=256)
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # x64 on: the accuracy cross-checks need a true f64 reference (the fast
    # paths request f32 explicitly, so this does not slow them down).
    jax.config.update("jax_enable_x64", True)
    from nodal_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    backend = jax.default_backend()

    solves_per_sec, dt, err, audit, method = bench_batched_solves(
        _ladder_circuit(args.nodes), args.batch, args.reps, args.method
    )
    extra = {
        "backend": backend,
        "solver_method": method,
        "batch_size": args.batch,
        "batched_wall_s": round(dt, 4),
        "batched_rel_err_vs_f64": err,
        "batched_max_residual": audit,
    }
    if not args.skip_general:
        # General (non-chain) topology: the round-1 review's headline gap.
        gen_sps, gen_dt, gen_err, gen_audit, gen_method = bench_batched_solves(
            _mesh_circuit(args.nodes), args.general_batch, args.reps
        )
        br_sps, br_dt, br_err, br_audit, br_method = bench_batched_solves(
            _branch_circuit(args.nodes), args.general_batch, args.reps
        )
        extra.update(
            {
                "general_solves_per_sec_1000_nodes": round(gen_sps, 2),
                "general_method": gen_method,
                "general_batch_size": args.general_batch,
                "general_rel_err_vs_f64": gen_err,
                "general_max_residual": gen_audit,
                "general_vs_baseline": round(gen_sps / BASELINE_SOLVES_PER_SEC, 2),
                "branch_solves_per_sec_1000_nodes": round(br_sps, 2),
                "branch_method": br_method,
                "branch_rel_err_vs_f64": br_err,
                "branch_max_residual": br_audit,
                "branch_vs_baseline": round(br_sps / BASELINE_SOLVES_PER_SEC, 2),
            }
        )
    if not args.skip_general and args.midsize_nodes:
        # Mid-size tier: past the VMEM-resident band kernel, exercising the
        # streaming (grid-pipelined) block-Thomas path.
        mid_sps, mid_dt, mid_err, mid_audit, mid_method = bench_batched_solves(
            _mesh_circuit(args.midsize_nodes), args.midsize_batch, 2
        )
        extra.update(
            {
                "midsize_nodes": args.midsize_nodes,
                "midsize_solves_per_sec": round(mid_sps, 2),
                "midsize_method": mid_method,
                "midsize_rel_err_vs_f64": mid_err,
                "midsize_max_residual": mid_audit,
            }
        )
    if not args.skip_grid:
        r, grid_dt, iters, marginal = bench_grid(args.grid, args.grid_tol)
        extra.update(
            {
                "grid_n": args.grid * args.grid,
                "grid_solve_s": round(grid_dt, 4),
                "grid_solve_marginal_s": round(marginal, 4),
                "grid_cg_iters": iters,
                "grid_R_knights_move": round(r, 6),
            }
        )

    print(
        json.dumps(
            {
                "metric": f"batched_solves_per_sec_{args.nodes}_nodes",
                "value": round(solves_per_sec, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 2),
                **extra,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
