"""Shared circuit fixtures, written as netlist text.

These reproduce the reference's documented example circuits (doc/*.csv in
/root/reference) so golden values can be compared; the text itself is
authored fresh.  Expected values are the reference's published test goldens
(reference tests.py:52-122) asserted numerically with tolerance, not as
strings (reference quirk Q5).
"""

# doc/netlist.csv — current source + resistor divider; no explicit ground,
# node "1" is elected by degree.
DIVIDER = """\
1,A,1,1,3
r2,R,1,2,3
r3,R,1,1,2
"""
DIVIDER_EXPECTED = {"ground": "1", "e": {"2": -1.0, "3": -2.0}, "i": {}}

# doc/1.6.1.csv — voltage source, current source, CCCS with resistor driver.
CIRCUIT_161 = """\
r1,R,2,1,4
r2,R,2,1,g
r3,R,0.5,1,2
e1,E,8,4,g
a1,A,4,1,2
d1,CCCS,2,2,g,1,g,r2
"""
CIRCUIT_161_EXPECTED = {
    "ground": "g",
    "e": {"1": 2.0, "2": -1.0, "4": 8.0},
    "i": {"d1": -2.0, "e1": 3.0},
}

# doc/buffer.csv — opamp voltage buffer modeled by hand as a VCVS.
BUFFER = """\
Ri, R, 1e7, 1, 3
Ro, R, 1e1, 1, 2
vs, E, 10, 3, g
d1, VCVS, 1e5, 2, g, 3, 1
"""
BUFFER_EXPECTED = {
    "ground": "g",
    "e": {"1": 9.999900000999991, "2": 9.999900000899993, "3": 10.0},
    "i": {"d1": -9.999889805101247e-12, "vs": 9.999900000899993e-12},
}

# doc/opmodel_amplifier.csv — OPMODEL non-inverting amplifier, gain 2.
OPMODEL_AMPLIFIER = """\
q1,OPMODEL,1,2,g,3,1
v1,E,1,3,g
r1,R,1,g,1
"""
OPMODEL_AMPLIFIER_EXPECTED = {
    "ground": "g",
    "e": {
        "1": 0.9998800143982737,
        "2": 1.9997600287845492,
        "3": 1.0000000000000002,
        "q1_internal_node": 11.998560172647306,
    },
    "i": {"q1_vcvs": 0.9998800143862756, "v1": 1.1998560172647305e-11},
}

# doc/opmodel_voltage_buffer.csv — OPMODEL buffer with direct feedback (rf=0).
OPMODEL_BUFFER = """\
q1,OPMODEL,0,2,g,3,2
v1,E,1,3,g
"""
OPMODEL_BUFFER_EXPECTED = {
    "ground": "g",
    "e": {
        "2": 0.999990000099999,
        "3": 0.9999999999999999,
        "q1_internal_node": 0.9999900000899992,
    },
    "i": {"q1_vcvs": -9.999917560676863e-13, "v1": 9.999900000899992e-13},
}

# doc/test_1.csv — every component type at once; every node sits at 1 V.
# NOTE on d4 (VCCS): this circuit gives identical answers under true-VCCS and
# the reference's VCVS-aliased semantics (quirk Q1), which is why it works as
# a shared golden.
ALL_TYPES = """\
e1,E,1,1,g
a1,A,1,2,g
r1,R,1,2,g
r2,R,1,5,g
r3,R,1,6,g
d1,CCVS,1,3,g,g,2,r1
d2,VCVS,1,4,g,2,g
d3,CCCS,1,5,g,g,2,r1
d4,VCCS,1,6,g,2,g
"""
ALL_TYPES_EXPECTED = {
    "ground": "g",
    "e": {str(k): 1.0 for k in range(1, 7)},
    "i": {"d1": 0.0, "d2": 0.0, "d3": 1.0, "d4": 1.0, "e1": 0.0},
}

# doc/resistive_{1,2,3}.csv — equivalent-resistance goldens.
RESISTIVE_1 = """\
r1, R, 1, 1, 2
r2, R, 1, 2, g
"""
RESISTIVE_2 = """\
r1, R, 1, 1, 2
r2, R, 1, 2, g
r3, R, 1, 1, 3
r4, R, 1, 3, g
"""
RESISTIVE_3 = """\
r1, R, 1, 1, 2
r2, R, 1, 2, g
r3, R, 1, 1, 3
r4, R, 1, 3, g
r5, R, 2, 2, 3
"""
RESISTIVE_EXPECTED = {"RESISTIVE_1": 2.0, "RESISTIVE_2": 1.0, "RESISTIVE_3": 1.0}

# doc/unconnected_0.csv — looks split but shares ground: still connected.
UNCONNECTED_0 = """\
r1,R,1,1,2
r2,R,5,1,g
r3,R,10,1,g
e1,E,6,2,g
e2,CCVS,2,3,g,g,1,r3
"""

# doc/unconnected_1.csv — genuinely floating subcircuit: singular system.
UNCONNECTED_1 = """\
r1,R,1,1,2
r2,R,5,1,g
r3,R,10,1,g
e1,E,6,2,g
e2,CCVS,2,3,4,g,1,r3
"""
