"""Test configuration: run on the CPU backend with 8 virtual devices.

Mirrors the SURVEY.md §4 strategy: per-op golden tests against numpy
references, plus multi-"chip" sharding tests via
``--xla_force_host_platform_device_count`` (the capability the reference
lacks entirely — it requires a real OpenCL device).

Must set the env vars BEFORE jax initializes a backend.
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (a tunneled TPU chip) —
# correctness tests must not round-trip every dispatch over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    """--profiling: per-op CPU-vs-accelerated timing, mirroring the
    reference's test flag (src/ICP/tests/helper_funcs.cpp:66-75)."""
    parser.addoption("--profiling", action="store_true", default=False,
                     help="print per-op timing comparisons")


@pytest.fixture
def profiling(request):
    return request.config.getoption("--profiling")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
