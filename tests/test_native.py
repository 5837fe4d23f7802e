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


# -- round-2 advisor findings (ADVICE.md) -------------------------------------


def test_native_control_first_node_ordering():
    # Node 'x' first appears in a CONTROL field, then as a terminal AFTER
    # node 'y'.  Row numbering must follow first-*terminal*-appearance order
    # (the Python degrees-dict order), not interning order: the old parser
    # gave x a row before y, permuting G vs the Python lowering.
    assert_same_system(
        "d1,VCVS,2,1,g,x,g\n"
        "r0,R,1,y,1\n"
        "r1,R,1,x,y\n"
        "r2,R,1,x,g\n"
    )


def test_native_dangling_control_node_rejected():
    # A control node never used as a terminal is a floating unknown; the
    # Python path raises KeyError from its nodenum lookup.  The native
    # parser used to accept it silently (singular system).
    text = "r1,R,1,1,g\nr2,R,1,2,g\nd1,VCVS,2,2,g,zz,g\n"
    with pytest.raises(KeyError):
        native.parse_stamps(text)
    with pytest.raises(KeyError):
        nl = Netlist.from_rows(
            [r.split(",") for r in text.strip().splitlines()])
        Circuit(nl)


def test_native_dangling_control_ground_tiebreak_unaffected():
    # Control-only appearances must not perturb the max-degree ground
    # election either; 'm' (degree 3) wins over '1' (degree 2) in both
    # lowerings even though the VCCS control field references '1' first.
    text = (
        "d1,VCCS,0.5,2,m,1,m\n"
        "r1,R,1,1,m\n"
        "r2,R,1,m,2\n"
        "r3,R,1,m,3\n"
        "r4,R,1,3,1\n"
    )
    assert_same_system(text)
    _, symbols = native.parse_stamps(text)
    assert symbols.ground == "m"


def test_native_quoted_fields_match_csv_reader(tmp_path):
    # RFC-4180 quoting: csv.reader strips quotes, unescapes '""', and keeps
    # commas inside quotes.  The old splitter kept the raw bytes, silently
    # changing the topology of reference-valid quoted netlists.
    text = (
        '"r1",R,1,"1",g\n'
        '"r,2",R,2,1,"n odd"\n'
        '"r""q",R,3,"n odd",g\n'
    )
    p = tmp_path / "quoted.csv"
    p.write_text(text)
    nl = Netlist(str(p))  # csv.reader path
    py_stamps = Circuit(nl).stamps
    nat_stamps, symbols = native.parse_stamps(text)
    assert symbols.ground == nl.ground
    Gp, bp = _assemble(py_stamps, py_stamps.params)
    Gn, bn = _assemble(nat_stamps, nat_stamps.params)
    np.testing.assert_array_equal(Gn, Gp)
    np.testing.assert_array_equal(bn, bp)
    assert 'r"q' in nat_stamps.param_slot
    assert "r,2" in nat_stamps.param_slot
    for node, idx in nl.nodenum.items():
        assert symbols.node_index(node) == idx


def test_native_unterminated_quote_rejected():
    with pytest.raises(ValueError, match="quoted"):
        native.parse_stamps('"r1,R,1,1,g\n')


def test_native_vccs_quirk():
    from nodal_tpu.models.stamps import Quirks, compile_stamps

    text = "e1,E,1,1,g\nr1,R,2,2,g\nd,VCCS,3,2,g,1,g\n"
    rows = [r.split(",") for r in text.strip().splitlines()]
    nl = Netlist.from_rows(rows)
    for quirks in (None, Quirks(vccs_as_vcvs=True)):
        py_stamps = compile_stamps(nl, quirks)
        nat_stamps, _ = native.parse_stamps(text, quirks=quirks)
        Gp, bp = _assemble(py_stamps, py_stamps.params)
        Gn, bn = _assemble(nat_stamps, nat_stamps.params)
        np.testing.assert_array_equal(Gn, Gp)
        np.testing.assert_array_equal(bn, bp)


def test_native_param_slot_composes_with_batching():
    # VERDICT #6: the lazy param_slot must make params_with and monte_carlo
    # work end-to-end on native-parsed stamps.
    from nodal_tpu.batch import BatchedSolver, monte_carlo
    from nodal_tpu.utils.gridgen import ladder_rows

    rows = ladder_rows(32)
    text = "\n".join(",".join(r) for r in rows) + "\n"
    nat_stamps, symbols = native.parse_stamps(text)

    assert len(nat_stamps.param_slot) == len(rows)
    name = next(iter(nat_stamps.param_slot))
    assert nat_stamps.param_slot[name] == 0
    assert name in nat_stamps.param_slot
    assert "no_such_component" not in nat_stamps.param_slot

    solver = BatchedSolver(nat_stamps, dtype=jnp.float64)
    batch = solver.params_with({name: np.array([1.0, 2.0])})
    xs = np.asarray(solver(batch))

    circuit = Circuit(Netlist.from_rows(rows))
    ref = np.asarray(
        BatchedSolver(circuit, dtype=jnp.float64)(batch))
    np.testing.assert_allclose(xs, ref, rtol=1e-12)

    out = monte_carlo(nat_stamps, {name: 0.05}, n=64, seed=3,
                      dtype=jnp.float64)
    ref_out = monte_carlo(circuit, {name: 0.05}, n=64, seed=3,
                          dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(out["mean"]),
                               np.asarray(ref_out["mean"]), rtol=1e-12)
