"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding
(pair/tile/frame mesh axes) is exercised without TPU hardware, per
SURVEY.md section 4 (d).

NOTE: this environment's sitecustomize pins JAX_PLATFORMS to the axon TPU
backend, so the env var alone is not enough — jax.config.update must run
before any backend is touched.  Only one process may hold the TPU chip;
keeping tests on CPU also avoids deadlocking against a concurrently
running benchmark.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "virtual CPU device mesh missing"
    return devs
