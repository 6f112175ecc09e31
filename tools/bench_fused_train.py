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
    """Delegates to bench.build_flagship_step — ONE flagship-step definition
    shared by the driver bench, this A/B tool, and trace_summary."""
    from bench import build_flagship_step

    step, state, batch, _, _ = build_flagship_step(fused, batch_size)
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
