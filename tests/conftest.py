"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The reference has no cluster-free distributed testing (SURVEY.md §4); here
every test runs on CPU with 8 virtual devices so sharding paths are exercised
without TPU hardware.
"""

import os

# The environment's sitecustomize registers the TPU backend in every
# interpreter and overrides JAX_PLATFORMS, so force CPU through jax.config
# (before any backend is instantiated) rather than the env var.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Pallas kernels run in interpreter mode on CPU (tests force it themselves).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
