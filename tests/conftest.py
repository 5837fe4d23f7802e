"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
without TPU hardware, and with x64 enabled so parity-vs-numpy assertions are
meaningful.  Environment must be set before jax initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU for the test suite.  The session's sitecustomize registers a
# remote-TPU ("axon") platform and force-prepends it to jax_platforms, so the
# env var alone is not enough — override the config after import, before any
# backend initializes.  Export NODAL_TPU_TEST_PLATFORM to run the suite
# against real hardware instead.
_platform = os.environ.get("NODAL_TPU_TEST_PLATFORM", "cpu")
if "cpu" not in _platform.split(","):
    # Keep the host backend registered alongside the accelerator: the f64
    # oracles (and _cpu_device_or_none) need it, and TPU-f64 LU does not
    # exist — NODAL_TPU_TEST_PLATFORM=axon alone would make the oracle
    # compile f64 LuDecomposition on the TPU and fail.
    _platform += ",cpu"
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def tmp_netlist(tmp_path):
    """Write netlist text to a temp CSV file and return its path."""

    def write(text: str, name: str = "netlist.csv") -> str:
        p = tmp_path / name
        p.write_text(text)
        return str(p)

    return write
