"""Test configuration: force the CPU backend with 8 virtual devices.

Must run before the first ``import jax``. The container's sitecustomize pins
JAX_PLATFORMS=axon (a tunneled single TPU); tests run on a local 8-device CPU
mesh instead so sharding/collective paths are exercised hermetically
(the driver separately dry-runs the multi-chip path via __graft_entry__).
"""

import os

# every test is network-free by design; huggingface_hub reads this at import
# time, so set it before anything imports transformers — otherwise a
# missing-model test spends ~65 s in a TCP connect timeout on egress-less
# machines instead of failing fast through the same exception path
os.environ.setdefault("HF_HUB_OFFLINE", "1")

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
