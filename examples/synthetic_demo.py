#!/usr/bin/env python
"""Runnable end-to-end demo on synthetic data (no real datasets needed).

Generates a tiny fake Gwilliams2022 array-BIDS tree + stimuli, builds the
preprocessing caches with a tiny random wav2vec2, trains a small brain encoder
for a few epochs with the full Trainer stack (jitted steps, retrieval eval,
orbax checkpoints), then serves top-k retrieval through the SpeechDecoder API.

    python examples/synthetic_demo.py [workdir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="sd_demo_")
    print(f"workdir: {workdir}")

    from speech_decoding_tpu.data.synthetic import (
        make_config,
        make_gwilliams_tree,
        tiny_wav2vec,
    )

    make_gwilliams_tree(workdir)
    cfg = make_config(workdir, "Gwilliams2022")
    cfg.epochs = 3
    cfg.batch_size = 8
    cfg.updates = 10
    cfg.D1, cfg.D2, cfg.K, cfg.F = 32, 32, 8, 16
    cfg.preprocs.last4layers = False  # tiny wav2vec feature dim = 16
    cfg.split_mode = "shallow"
    cfg.set_path("gwilliams.num_subjects", 2)
    cfg.set_path("gwilliams.num_sessions", 2)
    cfg.set_path("gwilliams.num_tasks", 2)
    # pin the checkpoint dir (the default is a fresh timestamped run dir
    # under outputs/, which the serving step below couldn't predict)
    cfg.set_path("checkpoint.dir", "checkpoints")

    # build caches with the tiny wav2vec (a real run loads
    # facebook/wav2vec2-large-xlsr-53 instead)
    from speech_decoding_tpu.data.gwilliams2022 import Gwilliams2022ShallowSplit

    build_cfg = cfg.copy()
    build_cfg.rebuild_dataset = True
    Gwilliams2022ShallowSplit(
        build_cfg, wav2vec=tiny_wav2vec(), num_subjects=2, num_sessions=2, num_tasks=2
    )

    import train as train_cli

    train_cli.run(cfg)

    # --- serving ---
    import jax

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.inference import SpeechDecoder
    from speech_decoding_tpu.models import BrainEncoder

    ds = Gwilliams2022ShallowSplit(
        cfg, wav2vec=None, num_subjects=2, num_sessions=2, num_tasks=2
    )
    rng = np.random.default_rng(0)
    batch = ds.sample_batch(rng, np.arange(8))
    loc = ch_locations_2d("Gwilliams2022", workdir)
    enc = BrainEncoder.from_config(cfg, loc, ds.num_subjects)
    dec = SpeechDecoder.from_checkpoint(
        os.path.join(workdir, "checkpoints"), enc, batch["X"]
    )
    dec.set_bank(jax.numpy.asarray(ds.Y))
    scores, ids = dec.decode(batch["X"], batch["subject_idxs"], k=5)
    hits = float(np.mean([int(i) in row for i, row in zip(np.arange(8), ids)]))
    print(f"top-5 retrieval against the full bank: {hits:.2f} "
          f"(chance ≈ {5 / len(ds.Y):.2f})")

    # --- serving novel candidate audio + a continuous recording ---
    # bank_from_audio: raw clips -> (N, F, T) bank through the (tiny) flax
    # wav2vec2, i.e. the training audio chain as a serving op; decode_stream:
    # slide a window over a continuous recording and rank every window
    # against the bank with one compiled program.
    from speech_decoding_tpu.inference import bank_from_audio

    seg_len = batch["X"].shape[-1]
    clips = (rng.normal(size=(6, 4000)) * 0.1).astype(np.float32)  # 0.25 s @16k
    bank = bank_from_audio(
        tiny_wav2vec(), clips, 16000, segment_len=seg_len,
        last4layers=False,  # match the training flag above (tiny F=16)
    )
    dec.set_bank(jax.numpy.asarray(bank))
    X_cont = np.concatenate([batch["X"][i] for i in range(4)], axis=-1)
    s, i, onsets = dec.decode_stream(
        X_cont, 0, seg_len, hop=seg_len // 2, k=3, batch_size=4
    )
    print(f"stream decode: {len(onsets)} windows over {X_cont.shape[-1]} "
          f"samples -> top-3 ids per window, e.g. onset 0 -> {i[0].tolist()}")


if __name__ == "__main__":
    main()
