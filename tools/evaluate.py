#!/usr/bin/env python
"""Standalone evaluation CLI: restore a trained model and run full-test-set
retrieval eval (loss / top-1 / top-10), without training.

The reference has no eval entry point — metrics only exist interleaved in
train.py's epoch loop [ref: train.py:211-243], and its checkpoints can only
be inspected by rerunning training. Here:

    # evaluate the latest (or best) orbax checkpoint of a run
    python tools/evaluate.py outputs/<run>/config.yaml \
        checkpoint.dir=outputs/<run>/checkpoints [eval.best=true] [eval.epoch=N]

    # evaluate a reference-trained torch checkpoint directly
    python tools/evaluate.py dataset=Gwilliams2022 torch_checkpoint=model_last.pt

Dataset construction, split pools and the fixed test batch reproduce
train.py exactly (same seed derivations), so the printed metrics are the
same "testTop10acc" a training run at that checkpoint would report.
Prints ONE JSON line with the metrics.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(args) -> dict:
    import jax

    import train as train_cli
    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.data.sampling import random_split
    from speech_decoding_tpu.training.state import create_train_state
    from speech_decoding_tpu.training.steps import make_chunked_eval, make_eval_step
    from speech_decoding_tpu.utils.logging import cprint

    # prefer the training run's RECORDED seed (train.py writes
    # ``resolved_seed`` into its config snapshot) — with the reference-parity
    # default ``reproducible: false`` the split pools are a function of the
    # seed the run actually drew, not of configs/config.yaml's ``seed``
    seed = args.select("resolved_seed", None)
    if seed is None:
        # without a recorded seed a reproducible=false run's split cannot be
        # reconstructed — re-drawing one would leak trained segments into
        # the "test" batch and print contaminated metrics. Fail loudly.
        assert bool(args.get("reproducible", True)), (
            "this config has reproducible=false and no recorded "
            "resolved_seed: the training run's train/test split is not "
            "reconstructible (evaluating a re-drawn split would leak "
            "training segments into 'test'). Pass the run dir's config "
            "snapshot (train.py records resolved_seed there) or an explicit "
            "resolved_seed=N override."
        )
        seed = args.get("seed", 0)
    seed = int(seed)
    # seed the GLOBAL rngs too: the Gwilliams sentence split shuffles
    # sentence ids via np.random [ref: gwilliams2022.py:424-441 semantics],
    # which train.py seeds through seed_everything — without this, a
    # sentence-split eval would re-draw a different train/test split
    from speech_decoding_tpu.utils.reproducibility import seed_everything

    seed_everything(seed)
    rng = np.random.default_rng(seed)

    # host batches here are always channels-first (B, C, T); the param tree is
    # layout-independent, so a checkpoint trained with
    # tpu.channels_last_io=True (the device-resident default) restores into a
    # channels-first encoder unchanged
    args.set_path("tpu.channels_last_io", False)

    collate = None
    if args.dataset == "Gwilliams2022":
        _train_set, test_set, _train_pool, test_pool = train_cli.build_gwilliams(
            args, rng
        )
        collate = train_cli.build_collate(args)
    elif args.dataset == "Brennan2018":
        from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset

        test_set = Brennan2018Dataset(args)
        _train_pool, test_pool = random_split(len(test_set), args.split_ratio, rng)
    else:
        raise ValueError("Unknown dataset")
    num_subjects = test_set.num_subjects

    # the SAME fixed test batch train.py evaluates each epoch (seed + 1);
    # with tpu.redraw_test_batch the per-epoch salt is applied after the
    # checkpoint epoch is known (below)
    tb_rng = np.random.default_rng(seed + 1)
    batch = test_set.sample_batch(tb_rng, test_pool)
    B_test = batch["X"].shape[0]

    loc = ch_locations_2d(args.dataset, args.root_dir)
    torch_ckpt = args.select("torch_checkpoint", None)
    restored_from = None
    if torch_ckpt:
        # reference checkpoints carry encoder weights only [ref: train.py:259]
        import torch

        from speech_decoding_tpu.models import BrainEncoder
        from speech_decoding_tpu.models.torch_port import brain_encoder_from_torch

        sd = torch.load(torch_ckpt, map_location="cpu", weights_only=True)
        params, batch_stats, dims = brain_encoder_from_torch(sd)
        assert dims["S"] == num_subjects, (
            f"checkpoint has {dims['S']} subjects, dataset has {num_subjects}"
        )
        encoder = BrainEncoder(
            num_subjects=dims["S"], loc=loc, D1=dims["D1"], D2=dims["D2"],
            F=dims["F"], K=dims["K"], d_drop=float(args.get("d_drop", 0.1)),
        )
        state = create_train_state(
            encoder,
            jax.random.PRNGKey(seed),
            batch["X"][:2],
            batch["subject_idxs"][:2],
            init_temperature=float(args.init_temperature),
        )
        state = state.replace(
            params={
                "encoder": jax.tree.map(np.asarray, params),
                "clip": state.params["clip"],
            },
            batch_stats=batch_stats,
        )
        restored_from = {"torch_checkpoint": torch_ckpt, "epoch": None}
    else:
        from speech_decoding_tpu.models import BrainEncoder
        from speech_decoding_tpu.training.checkpoint import CheckpointManager

        ckpt_dir = args.select("checkpoint.dir", None)
        assert ckpt_dir, "pass checkpoint.dir=... or torch_checkpoint=..."
        if not os.path.isabs(ckpt_dir):
            ckpt_dir = os.path.join(args.root_dir, ckpt_dir)
        encoder = BrainEncoder.from_config(args, loc, num_subjects)
        state = create_train_state(
            encoder,
            jax.random.PRNGKey(seed),
            batch["X"][:2],
            batch["subject_idxs"][:2],
            init_temperature=float(args.init_temperature),
        )
        best = bool(args.select("eval.best", False))
        mgr = CheckpointManager(
            ckpt_dir,
            track_metric=(
                args.select("checkpoint.track_metric", "testTop10acc") or None
            )
            if best
            else None,
        )
        epoch = args.select("eval.epoch", None)
        # params/stats only: the saved opt_state's pytree shape depends on
        # training wiring (optax.MultiSteps for Brennan accumulation) and
        # eval never needs it
        state, epoch = mgr.restore_for_eval(
            state, epoch=int(epoch) if epoch is not None else None, best=best
        )
        restored_from = {"checkpoint_dir": ckpt_dir, "epoch": int(epoch),
                         "best": best}

    # mirror train.py's per-epoch test-batch redraw: epoch N>0 evaluates on
    # default_rng(seed + 1 + 1000*N). Torch checkpoints carry no epoch ->
    # the unsalted batch stands.
    epoch_n = restored_from.get("epoch")
    if bool(args.select("tpu.redraw_test_batch", False)) and epoch_n:
        batch = test_set.sample_batch(
            np.random.default_rng(seed + 1 + 1000 * int(epoch_n)), test_pool
        )

    use_pallas = args.select("tpu.use_pallas", None)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    chunk = int(args.select("tpu.eval_chunk_size", 1024))
    if 0 < chunk < B_test:
        eval_fn = make_chunked_eval(
            encoder, args.reduction, collate, chunk_size=chunk,
            use_pallas_retrieval=bool(use_pallas),
        )
    else:
        eval_fn = make_eval_step(
            encoder, args.reduction, collate, use_pallas_retrieval=bool(use_pallas)
        )
    dev_batch = {k: jax.device_put(v) for k, v in batch.items()}
    ev = {k: float(v) for k, v in eval_fn(state, dev_batch).items()}

    out = {
        "dataset": args.dataset,
        "test_segments": int(B_test),
        "test_loss": ev["loss"],
        "testTop1acc": ev["top1"],
        "testTop10acc": ev["top10"],
        **restored_from,
    }
    cprint(
        f"eval | {args.dataset} B={B_test} | loss {ev['loss']:.4f} | "
        f"top1 {ev['top1']:.4f} | top10 {ev['top10']:.4f}",
        "cyan",
    )
    return out


def main() -> None:
    from speech_decoding_tpu.config import load_config

    argv = sys.argv[1:]
    config_path = None
    if argv and argv[0].endswith((".yaml", ".yml")):
        config_path, argv = argv[0], argv[1:]
    args = load_config(config_path, argv)
    if "root_dir" not in args:
        args.root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(json.dumps(evaluate(args)))


if __name__ == "__main__":
    main()
