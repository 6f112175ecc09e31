#!/usr/bin/env python
"""Full-scale wav2vec2-large-xlsr-53 embedding throughput on the real TPU.

Builds the flagship audio-embedding model (the default Wav2Vec2Config IS the
xlsr-53 architecture: 1024 hidden, 24 layers, 512-ch extractor, ~317M
params) with random weights — the pretrained state_dict is network-blocked,
but throughput depends only on the architecture — and measures the
production embedding path (`FrozenWav2Vec2.last4_mean` on chunk batches, the
`embed_waveform` compute shape [ref: wav2vec_util.py:14-32]) in
audio-seconds per second.

The reference embeds audio on CPU/GPU inside its ~30-min 20-core pipeline
[ref: README.md:26]; this records the TPU-native number for the same model.

``measure_embed_rate`` is the ONE timing implementation — bench.py imports
it, so any future timing-methodology fix (this harness's block_until_ready
no-op cost one already) lands in both surfaces at once.

    python tools/bench_wav2vec.py [batch_secs] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def measure_embed_rate(
    batch: int = 16,
    dtype_name: str = "bfloat16",
    warmup: int = 6,
    rounds: int = 3,
    reps: int = 10,
    log=None,
) -> float:
    """Audio-seconds/s for last-4-layer-mean embedding of ``batch`` 1-s clips.

    Timing on this relayed backend must chain reps through the previous
    result and fetch a VALUE — block_until_ready is a no-op on the tunnel.
    Returns the best per-call rate over ``rounds`` timed rounds.
    """
    import jax
    import jax.numpy as jnp

    from speech_decoding_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config()  # xlsr-53 full scale
    model = Wav2Vec2Model(cfg)
    SR = 16000
    wav = jax.random.normal(jax.random.PRNGKey(0), (batch, SR), jnp.float32) * 0.1

    t0 = time.perf_counter()
    variables = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(1), wav[:1])
    if log:
        n_params = sum(x.size for x in jax.tree.leaves(variables))
        log(f"init: {n_params / 1e6:.0f}M params in {time.perf_counter() - t0:.1f}s")

    dt = jnp.dtype(dtype_name)
    if dt != jnp.float32:
        variables = jax.tree.map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, variables
        )
        wav = wav.astype(dt)

    @jax.jit
    def last4_chained(v, x, carry):
        bump = carry.astype(x.dtype) * jnp.asarray(1e-30, x.dtype)
        _, hidden = model.apply(v, x + bump, output_hidden_states=True)
        out = jnp.mean(jnp.stack(hidden[-4:]), axis=0)
        return out[0, 0, 0].astype(jnp.float32)

    t0 = time.perf_counter()
    carry = last4_chained(variables, wav, jnp.float32(0))
    float(carry)
    if log:
        log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    for _ in range(warmup):
        carry = last4_chained(variables, wav, carry)
    float(carry)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            carry = last4_chained(variables, wav, carry)
        float(carry)  # forces the whole chain
        best = min(best, (time.perf_counter() - t0) / reps)
    if log:
        log(
            f"xlsr-53 {dtype_name} embed: {best * 1e3:.2f} ms / {batch} audio-s "
            f"-> {batch / best:.0f} audio-s/s"
        )
    return batch / best  # batch 1-s clips per call


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16  # 1-s clips per batch
    dtype_name = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    measure_embed_rate(batch, dtype_name, log=print)


if __name__ == "__main__":
    main()
