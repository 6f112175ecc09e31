#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship train step (TensorBoard /
xprof viewable) — the starting point for kernel-level optimization work.

    python tools/profile_step.py [outdir] [batch_size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sd_trace"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.ops.scaling import window_scale_stats
    from speech_decoding_tpu.training import create_train_state, make_train_step
    from speech_decoding_tpu.utils.profiling import trace

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(
        num_subjects=27, loc=loc, D1=270, D2=320, F=1024, K=32,
        compute_dtype=jnp.bfloat16, conv_impl="gemm",
        use_pallas=jax.default_backend() == "tpu",
        channels_last_io=True,
    )
    X = jax.random.normal(jax.random.PRNGKey(0), (B, 360, 208))
    Y = jax.random.normal(jax.random.PRNGKey(1), (B, 360, 1024))
    sidx = jnp.zeros((B,), jnp.int32)
    batch = {
        "X": X, "Y": Y, "subject_idxs": sidx,
        "scale_stats": window_scale_stats(jnp.swapaxes(X, 1, 2)),
    }
    state = create_train_state(enc, jax.random.PRNGKey(2), X, sidx)
    col = {"baseline_len_samp": 60, "clamp_lim": 20.0, "clamp": True,
           "precomputed": True, "channels_last": True}
    step = make_train_step(enc, collate=col, donate=True)

    base_key = jax.random.PRNGKey(7)
    for i in range(3):  # compile + warm
        state, m = step(state, batch, base_key)
    float(m["loss"])

    with trace(outdir):
        for i in range(10):
            state, m = step(state, batch, base_key)
        float(m["loss"])
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
