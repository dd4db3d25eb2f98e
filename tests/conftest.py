"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(mesh/pjit/shard_map paths) is exercised without TPU hardware, per the
framework's test strategy (SURVEY.md §4).

Note: the environment's sitecustomize force-registers a TPU ('axon')
backend and overwrites jax_platforms, so setting the env var alone is
not enough — we also update the config after importing jax, before any
backend is used.
"""

import os

# Must be set before jax import; kept for subprocesses spawned by tests.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "expected 8 virtual CPU devices for mesh tests"
    return devs
