"""Cross-validation of the C++ stamp compiler against the Python lowering.

The Python front-end (netlist.py + models/stamps.py) is the semantic
reference; the native path must assemble bit-identical systems for every
fixture and for randomized netlists."""

import numpy as np
import pytest

import jax.numpy as jnp

from nodal_tpu import Circuit, Netlist
from nodal_tpu.ops.assemble import assemble_dense

import fixtures as fx

native = pytest.importorskip("nodal_tpu.utils.native")

try:
    native._load()
    HAVE_NATIVE = True
except native.NativeUnavailable as e:  # pragma: no cover
    HAVE_NATIVE = False
    REASON = str(e)

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="native build unavailable"
)


def _assemble(stamps, params):
    G, b = assemble_dense(stamps, jnp.asarray(params, dtype=jnp.float64))
    return np.asarray(G), np.asarray(b)


def assert_same_system(text):
    nl = Netlist.from_rows(
        [[f.strip() for f in r.split(",")] for r in text.strip().splitlines()
         if r.strip() and not r.startswith("#")]
    )
    py_stamps = Circuit(nl).stamps
    nat_stamps, symbols = native.parse_stamps(text)

    assert nat_stamps.n == py_stamps.n
    assert nat_stamps.n_kcl == py_stamps.n_kcl
    Gp, bp = _assemble(py_stamps, py_stamps.params)
    Gn, bn = _assemble(nat_stamps, nat_stamps.params)
    np.testing.assert_array_equal(Gn, Gp)
    np.testing.assert_array_equal(bn, bp)
    assert symbols.ground == nl.ground
    for node, idx in nl.nodenum.items():
        assert symbols.node_index(node) == idx


@pytest.mark.parametrize(
    "name",
    ["DIVIDER", "CIRCUIT_161", "BUFFER", "OPMODEL_AMPLIFIER",
     "OPMODEL_BUFFER", "ALL_TYPES", "RESISTIVE_3", "UNCONNECTED_0"],
)
def test_native_matches_python_fixture(name):
    assert_same_system(getattr(fx, name))


def test_native_matches_python_random_grids():
    from nodal_tpu.utils.gridgen import grid_csv

    for h, w in [(3, 4), (5, 5)]:
        assert_same_system(grid_csv(h, w, (0, 0), (h - 1, w - 1)))


def test_native_random_mixed_networks():
    rng = np.random.default_rng(0)
    for trial in range(5):
        rows = []
        n_nodes = 6
        names = [str(i) for i in range(1, n_nodes)] + ["g"]
        for k in range(12):
            a, b = rng.choice(names, 2, replace=False)
            rows.append(f"r{k},R,{rng.uniform(0.5, 5):.3f},{a},{b}")
        rows.append(f"e0,E,{rng.uniform(1, 5):.3f},1,g")
        rows.append(f"a0,A,{rng.uniform(1, 5):.3f},2,g")
        rows.append(f"d0,VCCS,{rng.uniform(0.1, 2):.3f},3,g,1,g")
        rows.append(f"f0,CCCS,{rng.uniform(0.1, 2):.3f},4,g,1,g,e0")
        assert_same_system("\n".join(rows) + "\n")


def test_native_error_messages():
    with pytest.raises(ValueError, match="Missing arguments"):
        native.parse_stamps("garbage\n")
    with pytest.raises(ValueError, match="Unknown type"):
        native.parse_stamps("v1,VoltageSource,5,1,2\n")
    with pytest.raises(KeyError, match="nope"):
        native.parse_stamps("r1,R,1,1,g\nf1,CCCS,3,2,g,1,g,nope\n")
    with pytest.raises(ValueError, match="null resistance"):
        native.parse_stamps("r1,R,0,1,g\ne1,E,1,1,g\n")


def test_native_parse_speed_sanity():
    # Not a perf assertion, just exercises a large grid end to end.
    from nodal_tpu.utils.gridgen import grid_csv

    text = grid_csv(40, 40, (0, 0), (39, 39))
    stamps, symbols = native.parse_stamps(text)
    assert stamps.n == 40 * 40 - 1
    assert symbols.node_index("1") >= 0
