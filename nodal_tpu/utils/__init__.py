"""Utilities: netlist generators, timing/profiling helpers."""
