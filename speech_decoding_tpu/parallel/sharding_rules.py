"""Parameter sharding rules for the ("data", "model") mesh.

The encoder is small (~tens of M params), so the default is full replication;
the widest matmuls — the 1x1 head convs (D2->2*D2->F) and the per-subject
(S, D1, D1) tensor — optionally shard their output-channel dim over the
"model" axis (simple Megatron-style column parallelism; XLA/GSPMD inserts the
matching collectives automatically)."""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speech_decoding_tpu.parallel.mesh import MODEL_AXIS


def param_shardings(params: Any, mesh: Mesh, min_dim: int = 64) -> Any:
    """A pytree of NamedShardings for ``params``: arrays whose last dim is
    >= min_dim and divisible by the model-axis size get P(..., "model");
    everything else is replicated."""
    m = mesh.shape[MODEL_AXIS]

    def rule(x):
        if (
            m > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= min_dim
            and x.shape[-1] % m == 0
        ):
            spec = [None] * (x.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
