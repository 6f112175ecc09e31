"""Worker process for tests/test_multihost.py: one of N jax.distributed
processes on the CPU backend (2 virtual devices each).

Exercises the REAL multi-host wiring end-to-end: init_distributed ->
host_local_slice -> Trainer (global mesh, state lifted to global replicated
arrays, global_batch_from_host_local per train batch, replicated eval batch)
-> one epoch of train steps + full-test-set eval. Prints a RESULT json line
the parent compares across processes and against a single-process run.
"""

import json
import os
import sys

B, C, T, F = 8, 208, 60, 64


def make_batches(n: int = 3):
    """n deterministic batches; the last is the test batch (shared between
    the workers and the parent's single-process ground-truth run)."""
    import numpy as np

    rng = np.random.default_rng(0)
    return [
        {
            "X": rng.normal(size=(B, C, T)).astype(np.float32),
            "Y": rng.normal(size=(B, F, T)).astype(np.float32),
            "subject_idxs": (np.arange(B) % 2).astype(np.int32),
        }
        for _ in range(n)
    ]


def make_encoder():
    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    return BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=24, F=F, K=4, d_drop=0.05)


def make_args():
    from speech_decoding_tpu.config import Config

    return Config(
        {
            "seed": 0,
            "reduction": "mean",
            "init_temperature": 5.1,
            "lr": 1e-3,
            "epochs": 1,
        }
    )


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mh_env import force_cpu_backend

    force_cpu_backend(2)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from speech_decoding_tpu.parallel.multihost import (
        host_local_slice,
        init_distributed,
    )

    active = init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert active, "jax.distributed did not activate"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    from speech_decoding_tpu.training.trainer import Trainer

    *train, test = make_batches()
    sl = host_local_slice(B)
    local_train = [{k: v[sl] for k, v in b.items()} for b in train]

    enc = make_encoder()
    ckpts = None
    if ckpt_dir:
        # symmetric multi-host checkpointing: EVERY process constructs the
        # manager and calls save (orbax save is a cross-process barrier)
        from speech_decoding_tpu.training.checkpoint import CheckpointManager

        ckpts = CheckpointManager(ckpt_dir, keep=2, track_metric="testTop10acc")
    trainer = Trainer(enc, make_args(), local_train[0], checkpoints=ckpts)
    assert trainer.multihost
    out = trainer.run_epoch(0, iter(local_train), test)
    if ckpts is not None:
        ckpts.wait()
    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "train_loss": out["train_loss"],
                "test_loss": out["test_loss"],
                "testTop10acc": out["testTop10acc"],
                "temp": out["temp"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
