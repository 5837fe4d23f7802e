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
    parser.add_argument(
        "--native",
        choices=("auto", "on", "off"),
        default="auto",
        help="use the C++ netlist parser + direct CG path (auto: for "
        "netlists over 256 KiB)",
    )
    return parser


_NATIVE_SIZE_THRESHOLD = 256 * 1024


def _try_native(args) -> float | None:
    """Native fast path: C++ parse -> stamp tensors -> CG.  Returns the
    resistance, or None to fall back to the Python front-end."""
    import os

    if args.native == "off":
        return None
    try:
        size = os.path.getsize(args.netlist_path)
    except OSError:
        return None  # let the normal path produce the exit-1 behavior
    if args.native == "auto" and size < _NATIVE_SIZE_THRESHOLD:
        return None
    try:
        from nodal_tpu.equiv import equivalent_resistance_stamps
        from nodal_tpu.utils import native

        with open(args.netlist_path, "rb") as fh:
            stamps, symbols = native.parse_stamps(fh.read())
        if not symbols.all_resistive:
            raise ValueError("Network is not resistive")
        ia = symbols.node_index(args.nodes[0])
        ib = symbols.node_index(args.nodes[1])
        return equivalent_resistance_stamps(stamps, ia, ib)
    except native.NativeUnavailable:
        return None
    except NotImplementedError:
        # OPAMP rows: a non-resistive netlist — same surface as ValueError.
        raise ValueError("Network is not resistive") from None
    except RuntimeError as e:
        print("Solver error\n")
        print(e.args[0])
        sys.exit(1)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from nodal_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.dtype == "f64":
        import nodal_tpu

        nodal_tpu.enable_x64()

    from nodal_tpu import Netlist
    from nodal_tpu.equiv import equivalent_resistance

    try:
        r = _try_native(args)
    except ValueError:
        print("Invalid netlist\n")
        print("Resistors are the only component allowed in the circuit")
        sys.exit(1)
    except KeyError as e:
        print("Invalid netlist\n")
        print(e.args[0])
        sys.exit(1)

    if r is None:
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
