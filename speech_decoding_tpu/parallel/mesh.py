"""Device mesh construction and batch sharding.

The reference has no distributed training at all (single CUDA device,
``.to(device)`` per batch [ref: train.py:31,187]). The TPU-native scaling
story is GSPMD: a ("data", "model") mesh; batches sharded over "data"
(ICI within a slice, DCN across slices), parameters replicated (the encoder is
~tens of M params), and the B×B CLIP/retrieval matrices sharded over the mesh
— either implicitly by XLA under jit or explicitly via
parallel.clip_sharded's shard_map implementations.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    mesh_shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. Default: all devices on "data"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape:
        d = int(mesh_shape.get(DATA_AXIS, 1))
        m = int(mesh_shape.get(MODEL_AXIS, 1))
        assert d * m == n, f"mesh {d}x{m} != {n} devices"
    else:
        d, m = n, 1
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """device_put a host batch with batch-axis sharding over "data"."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
