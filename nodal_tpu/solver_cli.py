"""``nodal-solver`` command line: solve a CSV netlist and print the solution.

Parity target: reference solver.py — same positional netlist path, same
``-s/--sparse`` flag, same exit codes (missing file → 1, unconnected
circuit → 1), same printed format.  Additional flags select precision and
print solver statistics.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Solve electrical circuits using nodal analysis"
    )
    parser.add_argument(
        "netlist_path", metavar="FILE", help="csv file describing the netlist"
    )
    parser.add_argument(
        "-s", "--sparse", action="store_true", help="use the sparse/iterative backend"
    )
    parser.add_argument(
        "--dtype",
        choices=("f32", "f64"),
        default="f64",
        help="numeric precision (default f64; f32 is the fast TPU path)",
    )
    parser.add_argument(
        "--stats", action="store_true", help="print timing statistics to stderr"
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    if args.dtype == "f64":
        import nodal_tpu

        nodal_tpu.enable_x64()

    import time

    from nodal_tpu import Circuit, Netlist, UnconnectedCircuitError

    t0 = time.perf_counter()
    try:
        netlist = Netlist(args.netlist_path)
    except FileNotFoundError:
        sys.exit(1)
    t1 = time.perf_counter()

    circuit = Circuit(netlist, sparse=args.sparse)
    try:
        solution = circuit.solve()
    except UnconnectedCircuitError:
        sys.exit(1)
    t2 = time.perf_counter()

    print(solution)
    if args.stats:
        print(
            f"parse: {t1 - t0:.4f}s  compile+solve: {t2 - t1:.4f}s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
