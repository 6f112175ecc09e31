"""Pre-jax environment bootstrap shared by the multihost worker scripts.

Must be importable (and callable) BEFORE the first ``import jax`` in the
worker — it only touches os.environ.
"""

import os


def force_cpu_backend(n_devices: int = 2) -> None:
    """Force a clean n-device CPU backend regardless of inherited env
    (the container pins JAX_PLATFORMS=axon; parent pytest pins an 8-device
    CPU mesh)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    os.environ["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={n_devices}"]
    )
