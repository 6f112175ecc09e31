"""Training orchestration: the reference's epoch loop, TPU-native.

Mirrors train.py's semantics [ref: train.py:166-259]:
  * per-epoch: train batches -> loss/top1/top10 accumulation -> full-test-set
    eval -> stdout metrics line -> optional W&B -> checkpoint;
  * Gwilliams: per-batch Adam steps over ``updates`` sampled batches;
  * Brennan: one optimizer step per epoch. The reference only backprops the
    *last* batch [ref: train.py:205-209] — ``brennan_legacy_accumulation``
    replicates that quirk; the default accumulates all batch grads correctly
    via optax.MultiSteps.

TPU specifics: one jitted step per phase; host batch assembly is numpy
gathers; batches are device_put with a data-axis NamedSharding when a mesh
with >1 device is available; step-time / segments-per-second counters feed
the bench.
"""

from __future__ import annotations

import time
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_decoding_tpu.parallel.mesh import batch_sharding, make_mesh
from speech_decoding_tpu.parallel.multihost import global_batch_from_host_local
from speech_decoding_tpu.training.checkpoint import CheckpointManager
from speech_decoding_tpu.training.state import create_train_state
from speech_decoding_tpu.training.steps import (
    make_eval_step,
    make_train_forward_step,
    make_train_step,
    make_train_step_scan,
)
from speech_decoding_tpu.utils.logging import cprint


class NoopLogger:
    def log(self, metrics: Dict) -> None:
        pass


def make_wandb_logger(args):
    """W&B metric logging, gated on availability [ref: train.py:134-143]."""
    try:
        import wandb
    except ImportError:
        cprint("wandb not installed; metrics go to stdout only", "yellow")
        return NoopLogger()
    config = {k: v for k, v in args.to_dict().items() if k not in ("root_dir", "wandb")}
    wandb.init(
        project=args.wandb.project, entity=args.wandb.entity, config=config,
        save_code=True,
    )
    wandb.run.name = f"{args.wandb.run_name}_{args.split_mode}"
    wandb.run.save()
    return wandb


class Trainer:
    """Drives train/eval epochs for either dataset family.

    train_batches_fn(rng, epoch) must yield host batch dicts
    {X, Y, subject_idxs}; test_batch_fn() returns the single full-test-set
    batch [ref: train.py:95-99]."""

    def __init__(
        self,
        encoder,
        args,
        sample_batch: Dict[str, np.ndarray],
        accumulate_steps: int = 1,
        collate: Optional[Dict] = None,
        logger=None,
        checkpoints: Optional[CheckpointManager] = None,
    ):
        self.args = args
        self.encoder = encoder
        self.logger = logger or NoopLogger()
        self.checkpoints = checkpoints
        self.legacy_last_batch_only = bool(
            args.select("tpu.brennan_legacy_accumulation", False)
        )

        key = jax.random.PRNGKey(int(args.get("seed", 0)))
        self.state = create_train_state(
            encoder,
            key,
            sample_batch["X"],
            sample_batch["subject_idxs"],
            init_temperature=float(args.init_temperature),
            lr=float(args.lr),
            accumulate_steps=accumulate_steps,
        )
        # mesh first — the fused train path needs it at step-build time
        devices = jax.devices()
        self.multihost = jax.process_count() > 1
        if self.multihost:
            # sample_batch is this host's LOCAL shard; the mesh is global
            assert sample_batch["X"].shape[0] % jax.local_device_count() == 0
            self.mesh = make_mesh()
        else:
            batch_div = sample_batch["X"].shape[0] % len(devices) == 0
            self.mesh = make_mesh() if len(devices) > 1 and batch_div else None

        # fused Pallas train-mode ConvBlocks (custom VJP, opt-in): measured at
        # parity with the XLA stack on v5e at B=64 (see TODO.md), so the
        # default stays XLA until the fused path wins outright. On a >1-device
        # mesh the fused forward runs under shard_map with synchronized
        # (psummed) BN statistics.
        fused = bool(args.select("tpu.fused_train_blocks", False))
        if fused and jax.default_backend() != "tpu":
            # off-TPU the kernels would run in the Pallas INTERPRETER inside
            # every step — orders of magnitude slower than XLA
            cprint("tpu.fused_train_blocks ignored off-TPU (XLA path used)", "yellow")
            fused = False
        # self.mesh is only ever built with >1 device, so its presence alone
        # selects the shard_map (synchronized-BN) fused path
        fused_mesh = self.mesh if (fused and self.mesh is not None) else None
        self.train_step = make_train_step(
            encoder, args.reduction, collate, donate=True,
            fused_blocks=fused, fused_mesh=fused_mesh,
        )
        self.scan_steps = int(args.select("tpu.scan_steps", 1))
        self.train_step_scan = (
            make_train_step_scan(
                encoder, args.reduction, collate, donate=True,
                fused_blocks=fused, fused_mesh=fused_mesh,
            )
            if self.scan_steps > 1
            else None
        )
        use_pallas = args.select("tpu.use_pallas", None)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.eval_step = make_eval_step(
            encoder, args.reduction, collate, use_pallas_retrieval=bool(use_pallas)
        )
        # large test sets evaluate in fixed-size forward chunks (bounded
        # activation memory); 0 disables
        self.eval_chunk_size = int(args.select("tpu.eval_chunk_size", 1024))
        self._chunked_eval = None
        self._collate = collate
        self._use_pallas_eval = bool(use_pallas)
        self.forward_step = (
            make_train_forward_step(encoder, args.reduction, collate)
            if self.legacy_last_batch_only
            else None
        )
        self.start_epoch = 0
        if self.checkpoints and args.select("checkpoint.resume", True):
            if self.checkpoints.latest_epoch() is not None:
                self.state, epoch = self.checkpoints.restore(self.state)
                self.start_epoch = epoch + 1

        if self.multihost:
            # state was initialized identically on every host (shared seed);
            # lift it into global fully-replicated arrays for the SPMD step
            # (after any checkpoint restore, which is also host-identical)
            self.state = self._to_global_replicated(self.state)
        self._sharding = batch_sharding(self.mesh) if self.mesh else None
        self.is_primary = jax.process_index() == 0
        self._key = jax.random.fold_in(key, 977)
        self.history: List[Dict] = []
        # cooperative preemption (training/preemption.py): train.py installs
        # a PreemptionGuard and assigns it here; run_epoch polls it between
        # dispatches and checkpoints mid-epoch on request
        self.preemption = None
        self.preempted = False
        self._preempt_sync_every = max(
            1, int(args.select("tpu.preempt_sync_every", 25))
        )

    def _preempt_check(self, i: int) -> bool:
        """Poll the guard after dispatch ``i``. Single-host: act on the local
        flag immediately. Multi-host: hosts agree via a scalar allgather at a
        fixed dispatch cadence so every process enters the collective
        checkpoint save at the same step (a lone flagged host must never
        block in orbax's barrier alone)."""
        if self.preemption is None or self.preempted:
            return self.preempted
        self.preemption.step_tick()
        flag = self.preemption.requested
        if self.multihost:
            if (i + 1) % self._preempt_sync_every:
                return False
            from jax.experimental import multihost_utils

            flag = bool(
                np.asarray(
                    multihost_utils.process_allgather(np.asarray(flag))
                ).any()
            )
        if flag:
            self.preempted = True
        return flag

    def _to_global_replicated(self, tree):
        """Host-identical values -> global fully-replicated arrays."""
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        return multihost_utils.host_local_array_to_global_array(
            tree, self.mesh, P()
        )

    def _put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        if self.multihost:
            # batch is this host's local block; reassemble the global batch
            return global_batch_from_host_local(batch, self.mesh)
        B = batch["X"].shape[0]
        if self._sharding is not None and B % self.mesh.shape["data"] == 0:
            return {k: jax.device_put(v, self._sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    def _put_eval(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        """Full-test-set batch: every host holds the SAME full batch (shared
        seed), so under multi-host it lifts to a global replicated array."""
        if self.multihost:
            return self._to_global_replicated(
                {k: np.asarray(v) for k, v in batch.items()}
            )
        return self._put(batch)

    def _put_stacked(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        """Stacked scan groups (k, B, ...): shard the BATCH axis (axis 1)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.multihost:
            return global_batch_from_host_local(batch, self.mesh, P(None, "data"))
        B = batch["X"].shape[1]
        if self.mesh is not None and B % self.mesh.shape["data"] == 0:
            sh = NamedSharding(self.mesh, P(None, "data"))
            return {k: jax.device_put(v, sh) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    def run_epoch(
        self,
        epoch: int,
        train_batches: Iterable[Dict[str, np.ndarray]],
        test_batch: Optional[Dict[str, np.ndarray]],
    ) -> Dict[str, float]:
        t0 = time.perf_counter()
        train_metrics: List[Dict] = []
        segments = 0
        if self.legacy_last_batch_only:
            # reference quirk: only the LAST batch's grads step the optimizer
            # [ref: train.py:205-209]
            train_batches = list(train_batches)
            last_idx = len(train_batches) - 1
            for i, batch in enumerate(train_batches):
                segments += batch["X"].shape[0]
                # per-batch host-split keys (forward steps don't advance
                # state.step, so in-graph folding would repeat keys)
                self._key, k = jax.random.split(self._key)
                step_fn = self.train_step if i == last_idx else self.forward_step
                self.state, metrics = step_fn(self.state, self._put(batch), k)
                train_metrics.append(metrics)
                if self._preempt_check(i):
                    break
        elif self.scan_steps > 1:
            # scan mode: k optimizer steps per dispatch (host thread stacks
            # and transfers groups while the device runs the previous group)
            from speech_decoding_tpu.data.native_loader import Prefetcher

            def grouped(it):
                group = []
                for b in it:
                    group.append(b)
                    if len(group) == self.scan_steps:
                        # device-resident batches stack on device (jnp);
                        # host batches stack on host (np)
                        stack = (
                            np.stack
                            if isinstance(group[0]["X"], np.ndarray)
                            else jnp.stack
                        )
                        yield {
                            k: stack([g[k] for g in group]) for k in group[0]
                        }, len(group)
                        group = []
                for b in group:  # remainder: single steps
                    yield b, 0

            pf = Prefetcher(
                grouped(iter(train_batches)),
                transform=lambda t: (
                    (self._put_stacked if t[1] else self._put)(t[0]),
                    t[1],
                ),
            )
            for i, (batch, k_group) in enumerate(pf):
                if k_group:
                    segments += batch["X"].shape[0] * batch["X"].shape[1]
                    self.state, metrics = self.train_step_scan(
                        self.state, batch, self._key
                    )
                else:
                    segments += batch["X"].shape[0]
                    self.state, metrics = self.train_step(
                        self.state, batch, self._key
                    )
                train_metrics.append(metrics)
                if self._preempt_check(i):
                    break
        else:
            # background host thread: batch assembly + device transfer overlap
            # with device compute (double buffering); constant base key — the
            # per-step dropout key folds from state.step inside the jit
            from speech_decoding_tpu.data.native_loader import Prefetcher

            for i, batch in enumerate(
                Prefetcher(iter(train_batches), transform=self._put)
            ):
                segments += batch["X"].shape[0]
                self.state, metrics = self.train_step(self.state, batch, self._key)
                train_metrics.append(metrics)
                if self._preempt_check(i):
                    break
        # pull once per epoch (metrics are tiny; avoids per-step syncs);
        # scan-mode entries carry a leading k axis — flatten them
        pulled = []
        for m in jax.device_get(train_metrics):
            vals = {k: np.atleast_1d(np.asarray(v)) for k, v in m.items()}
            n = len(vals["loss"])
            pulled.extend(
                {k: float(v[i]) for k, v in vals.items()} for i in range(n)
            )
        train_metrics = pulled
        train_time = time.perf_counter() - t0

        if self.multihost:
            segments *= jax.process_count()  # local rows -> global rows
        out: Dict[str, float] = {
            "epoch": epoch,
            "train_loss": float(np.mean([m["loss"] for m in train_metrics])),
            "trainTop1acc": float(np.mean([m["top1"] for m in train_metrics])),
            "trainTop10acc": float(np.mean([m["top10"] for m in train_metrics])),
            "temp": train_metrics[-1]["temp"],
            "lrate": float(self.args.lr),
            "train_segments_per_sec": segments / max(train_time, 1e-9),
        }

        if test_batch is not None and not self.preempted:
            # transfer the (large, constant) test batch once, not per epoch
            if getattr(self, "_test_cache_id", None) != id(test_batch):
                self._test_cache = self._put_eval(test_batch)
                self._test_cache_id = id(test_batch)
            B_test = test_batch["X"].shape[0]
            if 0 < self.eval_chunk_size < B_test:
                if self._chunked_eval is None:
                    from speech_decoding_tpu.training.steps import make_chunked_eval

                    self._chunked_eval = make_chunked_eval(
                        self.encoder,
                        self.args.reduction,
                        self._collate,
                        chunk_size=self.eval_chunk_size,
                        use_pallas_retrieval=self._use_pallas_eval,
                    )
                eval_fn = self._chunked_eval
            else:
                eval_fn = self.eval_step
            ev = {k: float(v) for k, v in eval_fn(self.state, self._test_cache).items()}
            out.update(
                test_loss=ev["loss"], testTop1acc=ev["top1"], testTop10acc=ev["top10"]
            )

        if self.is_primary:
            cprint(
                f"Ep {epoch}/{self.args.epochs} | "
                f"train l: {out['train_loss']:.3f} | "
                f"test l: {out.get('test_loss', float('nan')):.3f} | "
                f"trainTop10acc: {out['trainTop10acc']:.3f} | "
                f"testTop10acc: {out.get('testTop10acc', float('nan')):.3f} | "
                f"temp: {out['temp']:.3f} | "
                f"{out['train_segments_per_sec']:.1f} seg/s",
                "white",
            )
        self.logger.log(out)
        self.history.append(out)
        if self.checkpoints:
            # multi-host: orbax's save/restore is a cross-process barrier, so
            # EVERY host participates (train.py guarantees either all hosts
            # have a manager — explicit shared checkpoint.dir — or none);
            # each passes its host snapshot of the fully-replicated state and
            # orbax's primary host writes
            st = jax.device_get(self.state) if self.multihost else self.state
            # a preempted epoch force-saves mid-epoch state regardless of the
            # every_epochs cadence — this is the whole point of the guard
            self.checkpoints.save(epoch, st, extra=out, force=self.preempted)
        if self.preempted and self.is_primary:
            cprint(
                f"Preemption requested — epoch {epoch} stopped after "
                f"{len(train_metrics)} dispatch(es); state "
                f"{'checkpointed' if self.checkpoints else 'NOT saved (no checkpoint manager)'}; "
                f"resume continues at epoch {epoch + 1}",
                "yellow",
            )
        return out
