"""Orbax checkpointing: params + optimizer + BN stats + temperature + epoch +
PRNG state, with restore.

The reference only ever ``torch.save``s the encoder weights to a fixed file
every epoch — no optimizer state, no temperature, no resume path
[ref: train.py:259]. Here the full train state round-trips.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import orbax.checkpoint as ocp

from speech_decoding_tpu.training.state import TrainState
from speech_decoding_tpu.utils.logging import cprint


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, every_epochs: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.every_epochs = max(1, int(every_epochs))
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, epoch: int, state: TrainState, extra: Optional[Dict] = None) -> None:
        """``extra`` is accepted for API stability but the orbax step number
        already records the epoch."""
        if epoch % self.every_epochs:
            return
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, epoch: Optional[int] = None) -> Tuple[TrainState, int]:
        """Restore into the structure of ``state``; returns (state, epoch)."""
        epoch = self.latest_epoch() if epoch is None else epoch
        assert epoch is not None, "no checkpoint to restore"
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template)
        )
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        cprint(f"Restored checkpoint @ epoch {epoch} from {self.directory}", "green")
        return new_state, epoch
