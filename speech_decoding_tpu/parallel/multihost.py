"""Multi-host (multi-process) support: jax.distributed bootstrap and
host-local -> global batch assembly.

The reference is strictly single-device [ref: train.py:31]; scaling beyond one
TPU slice host (e.g. v4-32, BASELINE.json config 5) is TPU-native here:

  * ``init_distributed`` wires jax.distributed from standard TPU pod env vars
    (no-op on a single host);
  * ``global_batch_from_host_local`` lifts each host's locally-assembled batch
    shard into one global jax.Array sharded over the mesh "data" axis
    (jax.make_array_from_process_local_data — data-parallel loading where
    every host feeds only its own chips, batches ride ICI/DCN only for the
    model's collectives, never for input distribution).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speech_decoding_tpu.parallel.mesh import DATA_AXIS
from speech_decoding_tpu.utils.logging import cprint


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; returns whether
    distributed mode is active. On TPU pods the arguments are auto-detected
    from the environment; explicit values override."""
    try:
        if coordinator_address or num_processes or (process_id is not None):
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() > 1:
            pass  # already initialized by the runtime
        else:
            return False
    except RuntimeError as e:  # already initialized
        cprint(f"jax.distributed: {e}", "yellow")
    return jax.process_count() > 1


def global_batch_from_host_local(
    batch: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Each process passes its LOCAL shard (global_batch / num_processes
    rows); returns global arrays sharded over the "data" axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
