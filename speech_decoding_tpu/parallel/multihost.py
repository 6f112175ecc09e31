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

import os
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


def maybe_init_distributed(args) -> bool:
    """CLI hook: initialize jax.distributed when the run is multi-process.

    Activation, in priority order (must run BEFORE first device use):
      * ``tpu.multihost=True`` config override — explicit opt-in; coordinator
        coords come from ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
        ``JAX_PROCESS_ID`` (or TPU-pod auto-detection when unset);
      * the three JAX_* env vars being present (standard multi-process launch);
      * ``tpu.multihost=False`` (default) on a bare env: no-op, single process.

    Launch recipe (one command per host of e.g. a v4-32, 4 hosts):

        JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 \\
        JAX_PROCESS_ID=<i> python train.py dataset=Gwilliams2022 \\
            tpu.multihost=True batch_size=256

    On Cloud TPU pod slices the env vars may be omitted entirely
    (jax.distributed auto-detects via the TPU metadata server). Each process
    then loads only its ``batch_size / num_processes`` rows per step and the
    global batch is assembled via ``global_batch_from_host_local`` —
    batches never cross DCN; only the model's collectives do.
    """
    want = bool(args.select("tpu.multihost", False))
    env = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not (want or env):
        return False
    if env:
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        active = init_distributed(
            coordinator_address=env,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid is not None else None,
        )
        if not active and (want or nproc != "1"):
            # the fail-loudly guarantee must hold on the env-coords path too
            # (whether activated by tpu.multihost=True or by the env vars
            # alone — both are explicit multi-process launches): a swallowed
            # initialize() failure (unreachable coordinator, prior
            # single-process init) would otherwise demote every pod host to
            # an independent single-process primary with duplicate W&B runs,
            # concurrent checkpoint writes, and a no-longer-global batch_size.
            # JAX_NUM_PROCESSES=1 WITHOUT tpu.multihost=True is the one
            # legitimately single-process env launch (a pod launcher
            # templating env vars onto a 1-host slice); with the explicit
            # flag, a 1-process outcome is always a misconfiguration.
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS is set (multi-process launch), but "
                "jax.distributed did not reach process_count>1 — coordinator "
                "unreachable, JAX_NUM_PROCESSES unset/1, or the backend was "
                "already initialized single-process."
            )
        return active
    # Explicit multihost opt-in without coordinator coords: use JAX's own
    # TPU-pod auto-detection (bare initialize). Never fall through silently —
    # each pod host running an independent single-process training would act
    # as primary (duplicate W&B runs, concurrent checkpoint writes) with a
    # no-longer-global batch_size.
    try:
        jax.distributed.initialize()
    except Exception as e:
        # A launcher may already have called jax.distributed.initialize()
        # itself (standard pod workflow) — the re-initialize raises, but the
        # setup is valid if the backend is genuinely multi-process.
        already_multi = False
        try:
            already_multi = jax.process_count() > 1
        except Exception:
            pass
        if not already_multi:
            raise RuntimeError(
                "tpu.multihost=True but jax.distributed auto-detection failed "
                "and no coordinator coords were given. Either launch with "
                "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID "
                "set per host, or run on a Cloud TPU pod slice where "
                "auto-detection works, or drop tpu.multihost=True for a "
                "single-process run."
            ) from e
    if jax.process_count() <= 1:
        raise RuntimeError(
            "tpu.multihost=True but jax.distributed initialized single-process "
            f"(process_count={jax.process_count()}); this is not a multi-host "
            "environment. Drop tpu.multihost=True or launch one process per "
            "host with coordinator coords."
        )
    return True


def host_local_slice(n_rows: int) -> slice:
    """This process's contiguous block of a global batch of ``n_rows``.

    Row order matches a "data"-axis NamedSharding over a mesh built from
    jax.devices() (devices are ordered by process index), so the block feeds
    straight into ``global_batch_from_host_local``.
    """
    pc, pi = jax.process_count(), jax.process_index()
    assert n_rows % pc == 0, f"global batch {n_rows} not divisible by {pc} hosts"
    per = n_rows // pc
    return slice(pi * per, (pi + 1) * per)


def global_batch_from_host_local(
    batch: Dict[str, np.ndarray], mesh: Mesh, spec: Optional[P] = None
) -> Dict[str, jax.Array]:
    """Each process passes its LOCAL shard (global_batch / num_processes
    rows); returns global arrays sharded over the "data" axis (or ``spec``,
    e.g. P(None, "data") for scan-stacked (k, B, ...) groups)."""
    sharding = NamedSharding(mesh, spec if spec is not None else P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
