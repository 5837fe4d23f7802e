"""``nodal-resistance`` command line: two-point equivalent resistance.

Parity target: reference equiv.py:64-89 — probe nodes are hardcoded to
``1`` and ``g``, same error messages and exit codes, same ``R = ...``
output line.  ``--nodes A B`` overrides the probe pair (extension).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Calculate equivalent resistance using nodal analysis\n"
        "Label nodes as '1' and 'g' to mark where to connect to the network."
    )
    parser.add_argument(
        "netlist_path",
        metavar="FILE",
        help="csv file describing the resistive network",
    )
    parser.add_argument(
        "-s", "--sparse", action="store_true", help="use the sparse/iterative backend"
    )
    parser.add_argument(
        "--nodes",
        nargs=2,
        metavar=("A", "B"),
        default=("1", "g"),
        help="probe node pair (default: 1 g)",
    )
    parser.add_argument(
        "--dtype",
        choices=("f32", "f64"),
        default="f64",
        help="numeric precision (default f64)",
    )
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    if args.dtype == "f64":
        import nodal_tpu

        nodal_tpu.enable_x64()

    from nodal_tpu import Netlist
    from nodal_tpu.equiv import equivalent_resistance

    try:
        netlist = Netlist(args.netlist_path)
    except FileNotFoundError:
        sys.exit(1)

    try:
        r = equivalent_resistance(
            netlist, args.nodes[0], args.nodes[1], sparse=args.sparse
        )
    except ValueError:
        print("Invalid netlist\n")
        print("Resistors are the only component allowed in the circuit")
        sys.exit(1)
    except KeyError as e:
        print("Invalid netlist\n")
        print(e.args[0])
        sys.exit(1)

    print(f"R = {r}")


if __name__ == "__main__":
    main()
