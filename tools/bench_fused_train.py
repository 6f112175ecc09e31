"""A/B benchmark: XLA conv stack vs fused Pallas train-mode ConvBlock kernels
on the flagship train step (B=64, 208ch, 360 samples, bf16, channels-last).

Usage: python tools/bench_fused_train.py [batch_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(fused: bool, batch_size: int = 64):
    """The flagship train-step setup (bf16, GEMM convs, channels-last,
    precomputed collate stats) — shared by this A/B bench and
    tools/trace_summary.py so both always measure the same model."""
    import jax
    import jax.numpy as jnp

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.ops.scaling import window_scale_stats
    from speech_decoding_tpu.training import create_train_state, make_train_step

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(
        num_subjects=27, loc=loc, D1=270, D2=320, F=1024, K=32,
        compute_dtype=jnp.bfloat16,
        use_pallas=jax.default_backend() == "tpu",
        conv_impl="gemm",
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
    step = make_train_step(enc, collate=collate, donate=True, fused_blocks=fused)
    return step, state, batch


def bench(fused: bool, batch_size: int = 64, n_steps: int = 100) -> float:
    import jax

    step, state, batch = build_step(fused, batch_size)
    base_key = jax.random.PRNGKey(7)

    for _ in range(3):
        state, metrics = step(state, batch, base_key)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch, base_key)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    rate = n_steps / dt
    print(
        f"fused={fused}: {rate:.1f} steps/s ({rate * batch_size:.0f} seg/s), "
        f"{1000 * dt / n_steps:.2f} ms/step, loss {loss:.4f}",
        flush=True,
    )
    return rate


if __name__ == "__main__":
    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    r_xla = bench(False, bsz)
    r_fused = bench(True, bsz)
    print(f"speedup: {r_fused / r_xla:.3f}x")
