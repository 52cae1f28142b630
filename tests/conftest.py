"""Test config: run everything on CPU with 8 virtual devices so sharding /
multi-chip code paths are exercised without TPU hardware (SURVEY.md §4.4),
and compiles stay fast.

The container's sitecustomize force-registers the axon TPU backend
(JAX_PLATFORMS=axon); ``jax.config.update("jax_platforms", "cpu")`` before
first backend use wins it back. XLA_FLAGS must be set before the CPU client
is created to get the 8 virtual devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
