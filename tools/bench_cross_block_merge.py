#!/usr/bin/env python
"""Empirical check of the F3+F1 cross-block kernel merge [VERDICT r2 next #7].

At each of the 4 block boundaries of the fused train path, F3 (bn1 -> gelu ->
conv2 -> GLU) writes ``out`` to HBM and F1 of the next block (conv_d0 + skip
+ stats) re-reads it. Merging them into one kernel keeps ``out`` in VMEM for
the F1 consumption (it must STILL be written to HBM — the backward needs it
as the next block's residual x), saving exactly one (B, T, C) bf16 HBM read
per boundary: 64*360*320*2 B = 14.7 MB ~= 18 us at v5e's ~820 GB/s, so
~72 us across the 4 forward boundaries and a similar bound for B3+B1 on the
backward — ~0.15 ms total against the fused path's measured ~0.27 ms deficit
vs XLA (75.5 vs 77.1 steps/s, TODO.md round-2 item 3).

This tool measures the real saving: [_f3 kernel + _f1 kernel] vs one merged
_f31 kernel on identical data, plus numerical equivalence.

Run on the real TPU: python tools/bench_cross_block_merge.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from speech_decoding_tpu.ops.pallas.conv_block import _conv3, _gelu_exact_f32
from speech_decoding_tpu.ops.pallas.conv_block_train import (
    _bn_apply,
    _f1_kernel,
    _f3_kernel,
    _full,
    _pick_rows,
    _row,
)


def _f31_kernel(
    y1_ref, mi1_ref, gb1_ref, w2_ref, b2_ref, w0n_ref, b0n_ref,
    out_ref, y0n_ref, s0n_ref, *, d0n: int,
):
    """F3 of block k fused with F1 of block k+1: ``out`` stays in VMEM for
    the next conv (still written to HBM for the backward's residual)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s0n_ref[...] = jnp.zeros_like(s0n_ref)

    dt = out_ref.dtype
    for r in range(y1_ref.shape[0]):
        u1, _ = _bn_apply(y1_ref[r], mi1_ref, gb1_ref, dt)
        h1 = _gelu_exact_f32(u1).astype(dt)
        y2 = _conv3(h1, w2_ref[...], 2) + b2_ref[...]
        C = y2.shape[-1] // 2
        a, b = y2[:, :C], y2[:, C:]
        o = a.astype(dt) * jax.nn.sigmoid(b.astype(jnp.float32)).astype(dt)
        out_ref[r] = o
        # ---- F1 of block k+1 (always has the skip: k+1 >= 1) ----
        y = _conv3(o, w0n_ref[...], d0n) + b0n_ref[...] + o.astype(jnp.float32)
        yc = y.astype(dt)
        y0n_ref[r] = yc
        yf = yc.astype(jnp.float32)
        s0n_ref[0, :] += jnp.sum(yf, axis=0)
        s0n_ref[1, :] += jnp.sum(yf * yf, axis=0)


def main():
    interpret = jax.default_backend() != "tpu"
    B, T, C = 64, 360, 320
    dt = jnp.float32 if interpret else jnp.bfloat16
    R = _pick_rows(B)
    grid = (B // R,)
    d0n = 2 ** ((2 * 1) % 5)  # block-1 conv0 dilation (the first boundary)

    rng = np.random.default_rng(0)
    y1 = jnp.asarray(rng.normal(size=(B, T, C)), dt)
    mi1 = jnp.asarray(rng.normal(size=(2, C)), jnp.float32)
    gb1 = jnp.asarray(rng.normal(size=(2, C)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, C, 2 * C)) * 0.05, dt)
    b2 = jnp.asarray(rng.normal(size=(1, 2 * C)), jnp.float32)
    w0n = jnp.asarray(rng.normal(size=(3, C, C)) * 0.05, dt)
    b0n = jnp.asarray(rng.normal(size=(1, C)), jnp.float32)

    f3 = pl.pallas_call(
        _f3_kernel,
        grid=grid,
        in_specs=[_row(R, T, C), _full((2, C)), _full((2, C)),
                  _full((3, C, 2 * C)), _full((1, 2 * C))],
        out_specs=_row(R, T, C),
        out_shape=jax.ShapeDtypeStruct((B, T, C), dt),
        interpret=interpret,
    )
    f1 = pl.pallas_call(
        functools.partial(_f1_kernel, skip=True, d0=d0n),
        grid=grid,
        in_specs=[_row(R, T, C), _full((3, C, C)), _full((1, C))],
        out_specs=[_row(R, T, C), _full((2, C))],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), dt),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ],
        interpret=interpret,
    )
    f31 = pl.pallas_call(
        functools.partial(_f31_kernel, d0n=d0n),
        grid=grid,
        in_specs=[_row(R, T, C), _full((2, C)), _full((2, C)),
                  _full((3, C, 2 * C)), _full((1, 2 * C)),
                  _full((3, C, C)), _full((1, C))],
        out_specs=[_row(R, T, C), _row(R, T, C), _full((2, C))],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), dt),
            jax.ShapeDtypeStruct((B, T, C), dt),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ],
        interpret=interpret,
    )

    @jax.jit
    def split_pair(y1):
        out = f3(y1, mi1, gb1, w2, b2)
        y0n, s0n = f1(out, w0n, b0n)
        return out, y0n, s0n

    @jax.jit
    def merged(y1):
        return f31(y1, mi1, gb1, w2, b2, w0n, b0n)

    # numerical equivalence
    o_a, y_a, s_a = jax.tree.map(np.asarray, split_pair(y1))
    o_b, y_b, s_b = jax.tree.map(np.asarray, merged(y1))
    np.testing.assert_array_equal(o_a, o_b)
    np.testing.assert_array_equal(y_a, y_b)
    np.testing.assert_allclose(s_a, s_b, rtol=1e-6)
    print("merged == split (exact outputs)")
    if interpret:
        print("interpret mode: timings meaningless off-TPU; equivalence only")
        return

    # Timing on this relayed backend MUST chain each rep through the previous
    # result and fetch a VALUE at the end — block_until_ready is a no-op on
    # the tunnel (verified: it reports 0.25 ms for an 880-GFLOP program).
    @jax.jit
    def split_chained(y1, carry):
        out = f3(y1 + carry * jnp.asarray(1e-30, dt), mi1, gb1, w2, b2)
        y0n, s0n = f1(out, w0n, b0n)
        return s0n[0, 0]

    @jax.jit
    def merged_chained(y1, carry):
        out, y0n, s0n = f31(
            y1 + carry * jnp.asarray(1e-30, dt), mi1, gb1, w2, b2, w0n, b0n
        )
        return s0n[0, 0]

    def bench(fn, n_warm=20, n=50, rounds=3):
        carry = jnp.float32(0)
        for _ in range(n_warm):
            carry = fn(y1, carry)
        float(carry)
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                carry = fn(y1, carry)
            float(carry)  # forces the whole chain
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    t_split = bench(split_chained)
    t_merged = bench(merged_chained)
    save_us = (t_split - t_merged) * 1e6
    print(f"split F3+F1 : {t_split * 1e3:7.3f} ms")
    print(f"merged F31  : {t_merged * 1e3:7.3f} ms  (saves {save_us:+.1f} us/boundary)")
    print(
        f"extrapolated full-step saving (4 fwd + 4 bwd boundaries): "
        f"{8 * save_us:+.1f} us vs the fused path's ~270 us deficit to XLA"
    )


if __name__ == "__main__":
    main()
