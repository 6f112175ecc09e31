#!/usr/bin/env python
"""Serve a trained decoder over HTTP (micro-batching; see
speech_decoding_tpu/serving.py for the endpoints and batching semantics).

    # orbax checkpoint + precomputed bank
    python tools/serve.py outputs/<run>/config.yaml \
        checkpoint.dir=outputs/<run>/checkpoints serve.bank=bank.npz

    # reference-trained torch checkpoint
    python tools/serve.py dataset=Gwilliams2022 torch_checkpoint=model_last.pt \
        serve.bank=bank.npz serve.port=8989

``serve.bank`` is an .npz holding ``bank`` (N, F, T) — e.g. saved from
``speech_decoding_tpu.inference.bank_from_audio`` — or a raw ``.npy``.
Options: serve.host (127.0.0.1), serve.port (8989), serve.max_batch (64),
serve.max_wait_ms (3.0), serve.bank_dtype ("float32" | "int8"),
serve.segment_len (defaults to the bank's T), serve.warmup_k (10; 0 skips
the pre-listen compile warmup).
The model restore path (orbax latest/best/epoch or torch) reuses
tools/evaluate.py's loaders.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_decoder(args, num_subjects: int):
    """Restore a SpeechDecoder from an orbax run dir or a torch checkpoint
    (the same two restore paths tools/evaluate.py supports)."""
    import jax
    import jax.numpy as jnp

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.inference import SpeechDecoder
    from speech_decoding_tpu.models import BrainEncoder

    loc = ch_locations_2d(args.dataset, args.root_dir)
    torch_ckpt = args.select("torch_checkpoint", None)
    if torch_ckpt:
        import torch

        from speech_decoding_tpu.models.torch_port import brain_encoder_from_torch

        sd = torch.load(torch_ckpt, map_location="cpu", weights_only=True)
        params, batch_stats, dims = brain_encoder_from_torch(sd)
        encoder = BrainEncoder(
            num_subjects=dims["S"], loc=loc, D1=dims["D1"], D2=dims["D2"],
            F=dims["F"], K=dims["K"],
        )
        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        return SpeechDecoder(encoder, params, batch_stats)

    ckpt_dir = args.select("checkpoint.dir", None)
    assert ckpt_dir, "pass checkpoint.dir=... or torch_checkpoint=..."
    if not os.path.isabs(ckpt_dir):
        ckpt_dir = os.path.join(args.root_dir, ckpt_dir)
    encoder = BrainEncoder.from_config(args, loc, num_subjects)
    sample = np.zeros((2, loc.shape[0], 8), np.float32)
    best = bool(args.select("eval.best", False))
    epoch = args.select("eval.epoch", None)
    return SpeechDecoder.from_checkpoint(
        ckpt_dir,
        encoder,
        sample,
        epoch=int(epoch) if epoch is not None else None,
        best=best,
    )


def main() -> None:
    from speech_decoding_tpu.config import load_config
    from speech_decoding_tpu.serving import DecoderServer

    argv = sys.argv[1:]
    config_path = None
    if argv and argv[0].endswith((".yaml", ".yml")):
        config_path, argv = argv[0], argv[1:]
    args = load_config(config_path, argv)
    if "root_dir" not in args:
        args.root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    bank_path = args.select("serve.bank", None)
    assert bank_path, "pass serve.bank=<bank.npz|bank.npy> (array (N, F, T))"
    if bank_path.endswith(".npz"):
        bank = np.load(bank_path)["bank"]
    else:
        bank = np.load(bank_path)
    assert bank.ndim == 3, f"bank must be (N, F, T), got {bank.shape}"

    decoder = build_decoder(args, int(args.select("serve.num_subjects", 27)))
    decoder.set_bank(
        bank, store_dtype=str(args.select("serve.bank_dtype", "float32"))
    )

    seg_len = int(args.select("serve.segment_len", bank.shape[-1]))
    max_batch = int(args.select("serve.max_batch", 64))
    num_ch = decoder.encoder.loc.shape[0]

    # Warm the compiled path before listening: the (max_batch, C, T) decode
    # program takes tens of seconds to compile on a cold backend, and the
    # micro-batcher dispatches every request at exactly this shape — pay the
    # compile now instead of inside the first client's request.
    warmup_k = int(args.select("serve.warmup_k", 10))
    if warmup_k > 0:
        from speech_decoding_tpu.utils.logging import cprint

        cprint(f"warming decode program (B={max_batch}, k={warmup_k})...", "cyan")
        decoder.decode(
            np.zeros((max_batch, num_ch, seg_len), np.float32),
            np.zeros((max_batch,), np.int32),
            k=warmup_k,
        )

    server = DecoderServer(
        decoder,
        segment_shape=(decoder.encoder.loc.shape[0], seg_len),
        host=str(args.select("serve.host", "127.0.0.1")),
        port=int(args.select("serve.port", 8989)),
        max_batch=max_batch,
        max_wait_ms=float(args.select("serve.max_wait_ms", 3.0)),
    )
    server.serve_forever()


if __name__ == "__main__":
    main()
