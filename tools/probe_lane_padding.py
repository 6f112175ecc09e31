#!/usr/bin/env python
"""Probe: does lane-aligning the channel dims (D2=320 -> 384, D1=270 -> 384)
make the flagship train step FASTER in absolute time?

The MXU processes the GEMM output dim in 128-lane tiles; D2=320 occupies 2.5
tiles (~17% padding waste) and D1=270 ~2.1 tiles. The hardware pads either
way — explicit zero-channel padding can only win if XLA compiles the aligned
shapes into a better schedule than the padded-tile one. This probe measures
the *time* of the full train step at width variants with random weights
(numerics don't matter for scheduling); if t(384) >= t(320), padding cannot
recover the modeled 17% and the question is closed [VERDICT r2 weak #2].

Run on the real TPU: python tools/probe_lane_padding.py [batch_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_step(D1, D2, batch_size=64, n_warm=20, n_timed=30, rounds=2, conv_impl="gemm"):
    import jax
    import jax.numpy as jnp

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.ops.scaling import window_scale_stats
    from speech_decoding_tpu.training import create_train_state, make_train_step

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(
        num_subjects=27, loc=loc, D1=D1, D2=D2, F=1024, K=32,
        compute_dtype=jnp.bfloat16,
        use_pallas=jax.default_backend() == "tpu",
        conv_impl=conv_impl,
        channels_last_io=True,
    )
    B, C, T, F = batch_size, 208, 360, 1024
    X = jax.random.normal(jax.random.PRNGKey(0), (B, T, C), jnp.float32) * 10
    Y = jax.random.normal(jax.random.PRNGKey(1), (B, T, F), jnp.float32)
    sidx = jnp.asarray(np.random.default_rng(0).integers(0, 27, B), jnp.int32)
    batch = {
        "X": X, "Y": Y, "subject_idxs": sidx,
        "scale_stats": window_scale_stats(jnp.swapaxes(X, 1, 2)),
    }
    state = create_train_state(enc, jax.random.PRNGKey(2), X, sidx)
    collate = {
        "baseline_len_samp": 60, "clamp_lim": 20.0, "clamp": True,
        "precomputed": True, "channels_last": True,
    }
    step = make_train_step(enc, collate=collate, donate=True)
    base_key = jax.random.PRNGKey(7)

    flops = None
    try:
        cost = step.lower(state, batch, base_key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    for _ in range(n_warm):
        state, m = step(state, batch, base_key)
    jax.block_until_ready(m["loss"])

    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n_timed):
            state, m = step(state, batch, base_key)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / n_timed)
    return best, flops


def main():
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    variants = [
        ("baseline 270/320", 270, 320),
        ("aligned  384/384", 384, 384),
        ("D2-only  270/384", 270, 384),
    ]
    base_ms = None
    for name, D1, D2 in variants:
        dt, flops = time_step(D1, D2, bsz)
        ms = dt * 1e3
        note = ""
        if base_ms is None:
            base_ms = ms
        else:
            note = f"  ({ms / base_ms:.3f}x baseline time)"
        gf = f" {flops / 1e9:7.1f} GF/step" if flops else ""
        print(f"{name}: {ms:7.3f} ms/step{gf} -> {1 / dt:6.1f} steps/s{note}", flush=True)


if __name__ == "__main__":
    main()
