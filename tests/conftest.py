"""Test harness configuration.

Runs the suite on a virtual 8-device CPU backend (the standard JAX
fake-backend pattern for multi-chip logic, SURVEY.md section 4) so that
sharding tests exercise real collectives without TPU hardware.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
