"""CLI entry point — same surface as the reference:

    python train.py dataset=Gwilliams2022 split_mode=sentence
    python train.py dataset=Brennan2018 rebuild_dataset=True

[ref: train.py:28-263, README.md:20-25]. Hydra-free: YAML config +
key=value overrides (speech_decoding_tpu.config). Dataset dispatch, sampler
semantics, epoch loop, eval, W&B and checkpointing follow the reference;
compute runs jitted on TPU (see speech_decoding_tpu.training).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def build_gwilliams(args, rng):
    """Dataset + split pools [ref: train.py:54-101]."""
    from speech_decoding_tpu.data.gwilliams2022 import (
        Gwilliams2022DeepSplit,
        Gwilliams2022SentenceSplit,
        Gwilliams2022ShallowSplit,
    )
    from speech_decoding_tpu.data.sampling import random_split

    # dataset dimensions (27 subjects x 2 sessions x 4 tasks in the real
    # MEG-MASC release [ref: gwilliams2022.py:267,283-285]); overridable for
    # subsets
    dims = dict(
        num_subjects=int(args.select("gwilliams.num_subjects", 27)),
        num_sessions=int(args.select("gwilliams.num_sessions", 2)),
        num_tasks=int(args.select("gwilliams.num_tasks", 4)),
    )
    if args.split_mode == "sentence":
        train_set = Gwilliams2022SentenceSplit(args, **dims)
        test_set = Gwilliams2022SentenceSplit(
            args, train_set.test_word_idxs_dict, **dims
        )
        assert train_set.num_subjects == test_set.num_subjects
        train_pool = np.arange(len(train_set))
        test_pool = np.arange(len(test_set))
    elif args.split_mode == "shallow":
        train_set = test_set = Gwilliams2022ShallowSplit(args, **dims)
        train_pool, test_pool = random_split(len(train_set), args.split_ratio, rng)
    elif args.split_mode == "deep":
        train_set = Gwilliams2022DeepSplit(args, train=True, **dims)
        test_set = Gwilliams2022DeepSplit(args, train=False, **dims)
        assert train_set.num_subjects == test_set.num_subjects
        train_pool = np.arange(len(train_set))
        test_pool = np.arange(len(test_set))
    else:
        raise ValueError(f"Unknown split_mode: {args.split_mode}")
    return train_set, test_set, train_pool, test_pool


def build_collate(args) -> dict:
    """Gwilliams in-step collate spec (the reference's Collator semantics,
    [ref: gwilliams2022.py:653-661]) — shared by train.run and
    tools/evaluate.py so both phases apply identical baseline/scale/clamp."""
    return {
        "baseline_len_samp": int(
            args.preprocs["brain_resample_rate"] * args.preprocs["baseline_len_sec"]
        ),
        "clamp_lim": float(args.preprocs["clamp_lim"]),
        "clamp": bool(args.preprocs["clamp"]),
        # per-segment median/IQR precomputed at build; in-step collate is
        # elementwise (see ops.scaling.apply_scale_stats)
        "precomputed": True,
        "channels_last": bool(args.select("tpu.channels_last_io", False)),
    }


def run(args) -> list:
    """Train per the config; returns the per-epoch metrics history."""
    # multi-host bootstrap MUST precede first device use (no-op single-host)
    from speech_decoding_tpu.parallel.multihost import (
        host_local_slice,
        maybe_init_distributed,
    )

    import jax

    multihost = maybe_init_distributed(args)

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.data.sampling import (
        iter_shuffled_batches,
        iter_updates_batches,
        random_split,
    )
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.training.checkpoint import CheckpointManager
    from speech_decoding_tpu.training.trainer import Trainer, make_wandb_logger, NoopLogger
    from speech_decoding_tpu.utils.logging import cprint
    from speech_decoding_tpu.utils.reproducibility import seed_everything

    # ``reproducible`` gates determinism like the reference's flag gates
    # torch deterministic algorithms [ref: train.py:33-43]: when off, each
    # run draws a fresh seed from OS entropy. The DRAWN seed is recorded as
    # ``resolved_seed`` (in the run-dir config snapshot and in-place on
    # ``args``) so the run's split pools and fixed test batch stay
    # recoverable — resume and tools/evaluate.py would otherwise re-draw a
    # different train/test split (silent test contamination).
    seed = args.select("resolved_seed", None)
    if seed is None:
        seed = (
            int(args.get("seed", 0))
            if args.get("reproducible", True)
            else int.from_bytes(os.urandom(4), "little")
        )
    seed = int(seed)
    if multihost:
        # every multi-host invariant (identical param init, identical global
        # batch ids with per-host blocks) relies on a SHARED seed — broadcast
        # process 0's draw so reproducible=False stays safe. uint32: without
        # x64 an int64 would silently truncate to int32 and seeds >= 2^31
        # would come back negative
        from jax.experimental import multihost_utils

        seed = int(multihost_utils.broadcast_one_to_all(np.uint32(seed)))
    args.set_path("resolved_seed", seed)
    seed_everything(seed)
    rng = np.random.default_rng(seed)
    cprint(f"Devices: {jax.devices()}", "cyan")
    cprint(args, "white")

    collate = None
    if args.dataset == "Gwilliams2022":
        train_set, test_set, train_pool, test_pool = build_gwilliams(args, rng)
        num_subjects = train_set.num_subjects
        # device-resident data defaults to channels-last IO: batches gather
        # time-major and the encoder skips every layout transpose (resolve
        # BEFORE the collate dict and encoder read the flag)
        if args.select("tpu.device_resident_data", False) and (
            args.select("tpu.channels_last_io", None) is None
        ):
            args.set_path("tpu.channels_last_io", True)
        # batch-time baseline/scale/clamp (the reference collator)
        collate = build_collate(args)
        accumulate_steps = 1

        # device-resident data path: recordings/embeddings/stats live on the
        # chip; each step ships only int32 indices (see data/device_resident)
        batchers = {}
        if args.select("tpu.device_resident_data", False):
            from speech_decoding_tpu.data.device_resident import (
                DeviceResidentGwilliams,
            )

            import jax.numpy as jnp

            cl = bool(args.select("tpu.channels_last_io", False))
            sdt = jnp.dtype(args.select("tpu.data_dtype", "float32"))
            batchers[id(train_set)] = DeviceResidentGwilliams(
                train_set, store_dtype=sdt, channels_last=cl
            )
            if test_set is not train_set:
                batchers[id(test_set)] = DeviceResidentGwilliams(
                    test_set, store_dtype=sdt, channels_last=cl
                )

        def _make_batch(ds, epoch_rng, ids, choices=None):
            b = batchers.get(id(ds))
            if b is not None:
                return b.gather(b.make_index_batch(epoch_rng, ids, choices))
            return ds.sample_batch(epoch_rng, ids, choices)

        def train_batches(epoch_rng):
            if args.use_sampler:
                ids_iter = iter_updates_batches(
                    train_pool, args.batch_size, args.updates, epoch_rng
                )
            else:
                ids_iter = iter_shuffled_batches(
                    train_pool, args.batch_size, epoch_rng, drop_last=multihost
                )
            for ids in ids_iter:
                # multi-host: every process samples the SAME global ids (shared
                # seed) and draws the FULL global batch's random-session
                # choices (iid per sample — host blocks don't repeat a draw
                # pattern and the global batch is bit-identical to a
                # single-process run), then materializes only its contiguous
                # block; the global batch is reassembled on device
                # (multihost.py)
                if multihost:
                    choices = train_set.draw_choices(epoch_rng, len(ids))
                    blk = host_local_slice(len(ids))
                    yield _make_batch(train_set, epoch_rng, ids[blk], choices[blk])
                else:
                    yield _make_batch(train_set, epoch_rng, ids)

    elif args.dataset == "Brennan2018":
        from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset

        train_set = test_set = Brennan2018Dataset(args)
        num_subjects = train_set.num_subjects
        train_pool, test_pool = random_split(len(train_set), args.split_ratio, rng)
        cprint(
            f"Number of samples: {len(train_pool)} (train), {len(test_pool)} (test)",
            "blue",
        )
        # one optimizer step per epoch [ref: train.py:205-209], correctly
        # accumulated over a fixed number of batches
        accumulate_steps = max(1, len(train_pool) // args.batch_size)

        def train_batches(epoch_rng):
            for ids in iter_shuffled_batches(
                train_pool,
                args.batch_size,
                epoch_rng,
                drop_last=accumulate_steps > 1 or multihost,
            ):
                if multihost:
                    # full-global random-subject draw, host-block slice (see
                    # the Gwilliams iterator above)
                    choices = train_set.draw_choices(epoch_rng, len(ids))
                    blk = host_local_slice(len(ids))
                    yield train_set.sample_batch(epoch_rng, ids[blk], choices[blk])
                else:
                    yield train_set.sample_batch(epoch_rng, ids)

    else:
        raise ValueError("Unknown dataset")

    loc = ch_locations_2d(args.dataset, args.root_dir)
    encoder = BrainEncoder.from_config(args, loc, num_subjects)

    first = next(iter(train_batches(np.random.default_rng(seed))))
    is_primary = (not multihost) or jax.process_index() == 0
    logger = make_wandb_logger(args) if (args.use_wandb and is_primary) else NoopLogger()

    # per-run output isolation, like the reference's fresh Hydra chdir'd
    # output dir [ref: configs/config.yaml:51-54]: unless checkpoint.dir or
    # run_dir is given explicitly (resume = point at the previous run's dir),
    # each run gets {root_dir}/outputs/<date>/<time>_<name>/ with its
    # resolved config snapshot and checkpoints inside
    ckpt_dir = args.select("checkpoint.dir", None)
    run_dir = args.select("run_dir", None)
    if multihost:
        # multi-host checkpointing must be SYMMETRIC: orbax save/restore
        # barrier across all processes, so either every host has a manager
        # (explicit checkpoint.dir on a shared filesystem) or none does.
        # Timestamped per-host run dirs would diverge (clock skew), so only
        # the primary writes the run-dir config snapshot.
        if ckpt_dir is None and is_primary:
            cprint(
                "multi-host run without checkpoint.dir — checkpointing "
                "DISABLED (set checkpoint.dir on a shared filesystem)",
                "yellow",
            )
        if not is_primary:
            run_dir = None
    elif run_dir is None and ckpt_dir is None:
        from datetime import datetime

        name = "_".join(
            str(p) for p in (args.get("run_name", "run"), args.get("split_mode", "")) if p
        )
        run_dir = os.path.join(
            args.root_dir, "outputs", f"{datetime.now():%Y-%m-%d/%H-%M-%S}_{name}"
        )
    if run_dir is not None:
        os.makedirs(run_dir, exist_ok=True)
        import yaml

        with open(os.path.join(run_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(args.to_dict(), f, default_flow_style=False)
        cprint(f"Run dir: {run_dir}", "cyan")
        if ckpt_dir is None and not multihost:
            # absolute: run_dir already includes root_dir — re-joining below
            # would double a relative prefix
            ckpt_dir = os.path.abspath(os.path.join(run_dir, "checkpoints"))
    ckpts = None
    if ckpt_dir is not None:
        if not os.path.isabs(ckpt_dir):
            ckpt_dir = os.path.join(args.root_dir, ckpt_dir)
        ckpts = CheckpointManager(
            ckpt_dir,
            keep=int(args.select("checkpoint.keep", 3)),
            every_epochs=int(args.select("checkpoint.every_epochs", 1)),
            # best-model tracking (checkpoint.track_metric="" disables)
            track_metric=args.select("checkpoint.track_metric", "testTop10acc")
            or None,
            track_mode=str(args.select("checkpoint.track_mode", "max")),
        )
    trainer = Trainer(
        encoder,
        args,
        first,
        accumulate_steps=accumulate_steps,
        collate=collate,
        logger=logger,
        checkpoints=ckpts,
    )

    def test_batch(salt: int = 0):
        tb_rng = np.random.default_rng(seed + 1 + salt)
        if args.dataset == "Gwilliams2022":
            return _make_batch(test_set, tb_rng, test_pool)
        return test_set.sample_batch(tb_rng, test_pool)

    # default: one fixed test batch (deterministic eval across epochs).
    # tpu.redraw_test_batch=True re-draws the random session/subject per
    # epoch, matching the reference's per-access sampling in __getitem__
    # [ref: gwilliams2022.py:133, brennan2018.py:148]
    redraw = bool(args.select("tpu.redraw_test_batch", False))

    # cooperative SIGTERM handling (spot/preemptible TPU pods): checkpoint
    # mid-epoch and exit cleanly instead of dying with unsaved progress;
    # tpu.preempt_after_steps=N self-injects a SIGTERM after N dispatches
    # (fault-injection drill). See training/preemption.py.
    guard = None
    if ckpts is not None and bool(args.select("tpu.preemption_guard", True)):
        from speech_decoding_tpu.training.preemption import PreemptionGuard

        inject = args.select("tpu.preempt_after_steps", None)
        guard = PreemptionGuard(
            inject_after_steps=int(inject) if inject else None
        ).install()
        trainer.preemption = guard

    try:
        tb = test_batch()
        for epoch in range(trainer.start_epoch, args.epochs):
            epoch_rng = np.random.default_rng(seed * 100003 + epoch)
            # epoch>0 condition (not start_epoch): a resumed run must redraw
            # the SAME per-epoch batches an uninterrupted run would, so eval
            # metrics stay comparable across resume boundaries (and
            # tools/evaluate.py can reconstruct the batch from the epoch)
            if redraw and epoch > 0:
                tb = test_batch(salt=1000 * epoch)
            trainer.run_epoch(epoch, train_batches(epoch_rng), tb)
            if trainer.preempted:
                break
        if trainer.checkpoints:
            trainer.checkpoints.wait()
    finally:
        if guard is not None:
            guard.uninstall()
    return trainer.history


def main():
    from speech_decoding_tpu.config import load_config

    argv = sys.argv[1:]
    config_path = None
    if argv and argv[0].endswith((".yaml", ".yml")):
        config_path, argv = argv[0], argv[1:]
    args = load_config(config_path, argv)
    if "root_dir" not in args:
        args.root_dir = os.path.dirname(os.path.abspath(__file__))
    run(args)


if __name__ == "__main__":
    main()
