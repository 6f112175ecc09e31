"""Benchmark: on-device Gwilliams-shape preprocessing throughput + flagship
train-step throughput on the available accelerator.

Headline metric: MEG-seconds preprocessed per wall-second (band-pass 1-60 Hz
@ 1 kHz + resample to 120 Hz over (208, 396000) recordings — the shapes of
[ref: gwilliams2022.py:249-260]). Baseline: the reference preprocesses 216
recordings x ~396 s in ~30 min on 20 CPU cores [ref: README.md:26], i.e.
216*396/1800 ≈ 47.5 MEG-sec/s. vs_baseline = ours / 47.5.

Extra fields report train segments/sec on the flagship Gwilliams encoder
(B=64, 208ch, 360 samples, F=1024, bf16) with the in-step collate — the
train-side throughput number tracked across rounds.

Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PREPROC_MEG_SEC_PER_SEC = 216 * 396.0 / 1800.0  # ≈ 47.5 (20 CPU cores)


def bench_preproc(n_warm: int = 1, n_rec: int = 6) -> float:
    import jax

    from speech_decoding_tpu.ops.brain_preproc import preprocess_batch

    rng = np.random.default_rng(0)
    rec_len = 396_000  # ~396 s at 1 kHz
    recs = [rng.normal(size=(208, rec_len)).astype(np.float32) for _ in range(2)]

    # warmup/compile
    preprocess_batch(recs[:1], 1000.0, 1.0, 60.0, 120.0, microbatch=1)

    t0 = time.perf_counter()
    done = 0
    while done < n_rec:
        preprocess_batch(recs, 1000.0, 1.0, 60.0, 120.0, microbatch=2)
        done += len(recs)
    dt = time.perf_counter() - t0
    meg_seconds = done * rec_len / 1000.0
    return meg_seconds / dt


def bench_train(n_steps: int = 20, batch_size: int = 64) -> float:
    import jax
    import jax.numpy as jnp

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.training import create_train_state, make_train_step

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(
        num_subjects=27, loc=loc, D1=270, D2=320, F=1024, K=32,
        compute_dtype=jnp.bfloat16,
    )
    B, C, T, F = batch_size, 208, 360, 1024
    X = jax.random.normal(jax.random.PRNGKey(0), (B, C, T), jnp.float32) * 10
    Y = jax.random.normal(jax.random.PRNGKey(1), (B, F, T), jnp.float32)
    sidx = jnp.asarray(np.random.default_rng(0).integers(0, 27, B), jnp.int32)
    batch = {"X": X, "Y": Y, "subject_idxs": sidx}
    state = create_train_state(enc, jax.random.PRNGKey(2), X, sidx)
    collate = {"baseline_len_samp": 60, "clamp_lim": 20.0, "clamp": True}
    step = make_train_step(enc, collate=collate, donate=True)

    for i in range(3):  # warmup + compile
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    return n_steps * batch_size / dt


def main():
    import jax

    platform = jax.devices()[0].platform
    preproc = bench_preproc()
    train_seg = bench_train()
    result = {
        "metric": "gwilliams_preproc_meg_seconds_per_sec",
        "value": round(preproc, 2),
        "unit": "MEG-sec/s",
        "vs_baseline": round(preproc / REFERENCE_PREPROC_MEG_SEC_PER_SEC, 2),
        "extra": {
            "baseline": "reference 20-core CPU pool ~47.5 MEG-sec/s (README ~30min/216 rec)",
            "train_segments_per_sec": round(train_seg, 2),
            "train_steps_per_sec_b64": round(train_seg / 64, 3),
            "platform": platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
