"""Test env: force the CPU backend with 8 virtual devices so sharding /
data-parallel tests run without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var JAX_PLATFORMS=cpu is overridden by this image's 'axon' TPU
# plugin, so force the CPU backend through the config API (must run before
# any backend initialization).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
