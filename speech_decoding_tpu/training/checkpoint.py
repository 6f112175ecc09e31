"""Orbax checkpointing: params + optimizer + BN stats + temperature + epoch +
PRNG state, with restore.

The reference only ever ``torch.save``s the encoder weights to a fixed file
every epoch — no optimizer state, no temperature, no resume path
[ref: train.py:259]. Here the full train state round-trips.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from speech_decoding_tpu.training.state import TrainState
from speech_decoding_tpu.utils.logging import cprint


class CheckpointManager:
    """Rolling ``keep`` latest checkpoints (resume always uses the latest)
    plus, when ``track_metric`` is set, an independent best-model checkpoint
    under the sibling ``<dir>-best/`` keyed on that metric (e.g.
    "testTop10acc") — the reference only ever overwrites ``model_last.pt``
    [ref: train.py:259]. (A sibling, not a subdir: orbax scans the root for
    numeric step directories.)"""

    def __init__(
        self,
        directory: str,
        keep: int = 3,
        every_epochs: int = 1,
        track_metric: Optional[str] = None,
        track_mode: str = "max",
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.every_epochs = max(1, int(every_epochs))
        # distinct barrier prefixes: under jax.distributed the two managers'
        # async-commit barriers would otherwise collide on the same key
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                create=True,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="latest"
                ),
            ),
        )
        self.track_metric = track_metric
        self._best_mgr = None
        if track_metric:
            assert track_mode in ("max", "min"), (
                f"checkpoint.track_mode must be 'max' or 'min', got {track_mode!r}"
            )
            sign = 1.0 if track_mode == "max" else -1.0
            self._best_mgr = ocp.CheckpointManager(
                self.directory.rstrip("/") + "-best",
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    create=True,
                    best_fn=lambda m: sign * m[track_metric],
                    best_mode="max",
                    multiprocessing_options=ocp.options.MultiprocessingOptions(
                        barrier_sync_key_prefix="best"
                    ),
                ),
            )

    @staticmethod
    def _payload(state: TrainState) -> Dict:
        return {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }

    def save(
        self,
        epoch: int,
        state: TrainState,
        extra: Optional[Dict] = None,
        force: bool = False,
    ) -> None:
        """``extra``: epoch metrics dict; feeds best-model tracking when
        ``track_metric`` is configured. ``force`` bypasses the
        ``every_epochs`` cadence (preemption-requested mid-epoch saves)."""
        if self._best_mgr is not None and extra and self.track_metric in extra:
            self._best_mgr.save(
                epoch,
                args=ocp.args.StandardSave(self._payload(state)),
                metrics={self.track_metric: float(extra[self.track_metric])},
            )
        if epoch % self.every_epochs and not force:
            return
        self._mgr.save(epoch, args=ocp.args.StandardSave(self._payload(state)))

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()

    def best_epoch(self) -> Optional[int]:
        return self._best_mgr.best_step() if self._best_mgr else None

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self,
        state: TrainState,
        epoch: Optional[int] = None,
        best: bool = False,
    ) -> Tuple[TrainState, int]:
        """Restore into the structure of ``state``; returns (state, epoch).
        ``best=True`` restores the tracked best-metric checkpoint instead of
        the latest (serving / final-eval use)."""
        mgr = self._best_mgr if best else self._mgr
        assert mgr is not None, "best-model tracking not configured"
        if epoch is None:
            epoch = mgr.best_step() if best else self.latest_epoch()
        assert epoch is not None, "no checkpoint to restore"
        restored = mgr.restore(
            epoch, args=ocp.args.StandardRestore(self._payload(state))
        )
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        cprint(f"Restored checkpoint @ epoch {epoch} from {self.directory}", "green")
        return new_state, epoch

    def restore_for_eval(
        self,
        state: TrainState,
        epoch: Optional[int] = None,
        best: bool = False,
    ) -> Tuple[TrainState, int]:
        """Restore params / BN stats / step only, ignoring the saved
        optimizer state. Eval and serving never need it, and its pytree
        SHAPE depends on training wiring (Brennan runs wrap Adam in
        optax.MultiSteps [ref: train.py:205-209 accumulation]), so a full
        ``restore`` into a default-built state would fail on a structure
        mismatch."""
        mgr = self._best_mgr if best else self._mgr
        assert mgr is not None, "best-model tracking not configured"
        if epoch is None:
            epoch = mgr.best_step() if best else self.latest_epoch()
        assert epoch is not None, "no checkpoint to restore"
        # raw (target-less) restore: returns the saved tree as host arrays;
        # this orbax version's StandardRestore has no partial_restore, and a
        # target tree would have to include the training-shaped opt_state
        restored = mgr.restore(epoch)
        # host numpy -> jax arrays: downstream jits (SpeechDecoder) close over
        # these params, and numpy constants break traced indexing (W[tracer])
        restored = {
            k: jax.tree.map(jnp.asarray, restored[k])
            for k in ("step", "params", "batch_stats")
        }
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
        )
        cprint(
            f"Restored checkpoint (eval: params/stats only) @ epoch {epoch} "
            f"from {self.directory}",
            "green",
        )
        return new_state, epoch
