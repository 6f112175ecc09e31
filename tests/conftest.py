"""Test configuration: force the CPU backend with 8 virtual devices.

Must run before the first ``import jax``. The container's sitecustomize pins
JAX_PLATFORMS=axon (a tunneled single TPU); tests run on a local 8-device CPU
mesh instead so sharding/collective paths are exercised hermetically
(the driver separately dry-runs the multi-chip path via __graft_entry__).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
