"""Scale-validation run: the REAL Trainer loop at flagship width on synthetic
learnable data — validates throughput AND learning dynamics on-chip without
real datasets (round log lives in TODO.md).

Segments are drawn from a fixed random linear-map world: Y = tanh(X A) for a
frozen A, X standard normal per segment — the encoder must actually learn the
map, so test top-10 rising above chance demonstrates end-to-end training, not
just step mechanics.

    python tools/scale_run.py [epochs] [updates] [train_pool]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    updates = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    train_pool = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax

    from speech_decoding_tpu.config import Config
    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.training.trainer import Trainer

    import jax.numpy as jnp

    B, C, T, F, S = 64, 208, 360, 1024, 27
    # fused Pallas dW only on a single chip: the pallas_call has no GSPMD
    # partition rule, and Trainer auto-meshes multi-device hosts
    conv_impl = (
        "gemm_pdw"
        if jax.default_backend() == "tpu" and len(jax.devices()) == 1
        else "gemm"
    )
    # pool size governs memorize-vs-generalize: 256 segments memorize (train
    # top-10 hits 1.0, held-out plateaus ~0.47); larger pools generalize
    # (cf. tests/test_learning_gate.py: 128 memorizes, 512 clears the gate)
    N_TRAIN, N_TEST = train_pool, 64

    # device-resident segment pool (the production device-resident data path:
    # per-step host->device traffic is int32 indices only — this harness's
    # tunneled link would otherwise spend ~5 s shipping each 113 MB batch).
    # bf16 storage: the f32 pool (~1 GB) overruns this harness's restricted
    # HBM grant and stalls everything after (see TODO env notes)
    print("building device-resident segment pool...", flush=True)
    kx = jax.random.PRNGKey(0)
    Xp = jax.random.normal(kx, (N_TRAIN + N_TEST, T, C), jnp.bfloat16)
    A = jax.random.normal(jax.random.PRNGKey(1), (C, F), jnp.bfloat16) / np.sqrt(C)
    Yp = jax.jit(lambda x: jnp.tanh(x @ A))(Xp)
    jax.block_until_ready(Yp)

    # pool arrays must be jit ARGUMENTS, not closure constants: constants are
    # embedded in the HLO, and this harness's remote-compile tunnel rejects
    # (or takes minutes uploading) a ~GB program blob
    gather = jax.jit(lambda xp, yp, ids: (xp[ids], yp[ids]))

    def make_batch(ids):
        ids = jnp.asarray(np.asarray(ids), jnp.int32)
        X, Y = gather(Xp, Yp, ids)
        return {
            "X": X,
            "Y": Y,  # (B, T, F): channels-last like Z
            "subject_idxs": ids % S,
        }

    args = Config(
        {
            "seed": 0,
            "reduction": "mean",
            "init_temperature": 5.1,
            "lr": 3e-4,
            "epochs": epochs,
            "tpu": {
                "compute_dtype": "bfloat16",
                "conv_impl": conv_impl,
                "channels_last_io": True,
                "scan_steps": 8,
            },
        }
    )
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(
        num_subjects=S, loc=loc, D1=270, D2=320, F=F, K=32,
        compute_dtype=jax.numpy.bfloat16,
        use_pallas=jax.default_backend() == "tpu",
        conv_impl=conv_impl,
        channels_last_io=True,
    )

    first = make_batch(list(range(B)))
    trainer = Trainer(enc, args, first)
    test_batch = make_batch(np.arange(N_TRAIN, N_TRAIN + N_TEST))  # held out

    t0 = time.time()
    ep_rng = np.random.default_rng(1)
    for ep in range(epochs):
        # unique-within-batch, like the production sampler (duplicate
        # segments would corrupt the CLIP diagonal objective)
        batches = (
            make_batch(ep_rng.choice(N_TRAIN, B, replace=False))
            for _ in range(updates)
        )
        trainer.run_epoch(ep, batches, test_batch)
    dt = time.time() - t0
    hist = trainer.history
    steady = float(np.median([h["train_segments_per_sec"] for h in hist[1:]] or [0]))
    print(
        f"scale run: {epochs} epochs x {updates} updates B={B} in {dt:.0f}s | "
        f"testTop10 {hist[0]['testTop10acc']:.3f} -> {hist[-1]['testTop10acc']:.3f} "
        f"(chance {10 / N_TEST:.3f}) | "
        f"steady seg/s {steady:.0f}"
    )
    # artifact for bench.py extras (VERDICT r4 item 4: the round's learning-
    # dynamics evidence travels in the bench JSON, not just prose)
    import json

    artifact = {
        "epochs": epochs,
        "updates_per_epoch": updates,
        "batch": B,
        "train_pool_segments": N_TRAIN,
        "flagship": {"D1": 270, "D2": 320, "F": F, "K": 32, "C": C, "T": T},
        "testTop10_first_epoch": round(float(hist[0]["testTop10acc"]), 4),
        "testTop10_last_epoch": round(float(hist[-1]["testTop10acc"]), 4),
        "chance_top10": round(10 / N_TEST, 4),
        "steady_segments_per_sec": round(steady, 1),
        "wall_s": round(dt, 1),
        "device": str(getattr(jax.devices()[0], "device_kind", jax.default_backend())),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "world": "synthetic learnable Y=tanh(XA), held-out test pool",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_run_artifact.json",
    )
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"artifact -> {path}")


if __name__ == "__main__":
    main()
