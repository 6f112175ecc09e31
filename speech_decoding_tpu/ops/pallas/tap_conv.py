"""Pallas TPU kernel: fused 3-tap dilated 'SAME' conv as ONE kernel per conv.

Why it exists (round-5 roofline): the 'gemm' conv formulation
(models/brain_encoder.py:_gemm_conv_taps) lowers each k=3 dilated conv
[ref: speech_decoding/models.py:128-150] to three separate full-width
(B·T, Cin)x(Cin, Cout) GEMMs plus adds. Each tap GEMM has arithmetic
intensity 2·Cin·Cout/(2·(Cin+Cout)) ≈ 160 FLOP/byte at D2=320 — BELOW the
v5e ridge (~240 FLOP/byte at 197 TFLOP/s / 819 GB/s), so each is
HBM-bandwidth-bound: x is read from HBM once per tap and the partial sums
are written/re-read besides. This kernel computes all three taps while the
x row-block is resident in VMEM: x is read ONCE, y written ONCE — intensity
triples to ~480 FLOP/byte, moving the conv from the bandwidth roof to the
(lane-padded) MXU roof.

The same kernel serves the backward dx (the transpose of a 'SAME' conv is
the 'SAME' conv with tap-reversed, transposed weights), and a sibling
reduction kernel computes all three dW taps reading x and g once each —
replacing the six per-tap GEMMs of _gemm_conv_bwd. Unlike the full fused
ConvBlock train kernels (ops/pallas/conv_block_train.py — parity-not-faster
because two-pass BN stats serialize rows), this kernel fuses ONLY the conv
taps: no cross-row coupling, so Mosaic's automatic double-buffering
pipelines HBM loads behind the MXU.

Tile notes: the grid walks batch pairs (BB=2 rows -> M=720 = 5.6 MXU row
tiles, ~4% pad); time shifts never cross batch rows, so each row's shifted
adds are static slices of its own tap products. f32 accumulation throughout,
one cast at the output (the XLA path rounds each tap to bf16 before adding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _shift_add(z0: Array, z1: Array, z2: Array, d: int) -> Array:
    """y[t] = z0[t-d] + z1[t] + z2[t+d] with zero boundaries; z*: (T, N) f32."""
    T = z1.shape[0]
    zpad = jnp.zeros((d, z1.shape[1]), z1.dtype)
    lo = jnp.concatenate([zpad, z0[: T - d]], axis=0)  # tap j=0: x[t-d] @ W0
    hi = jnp.concatenate([z2[d:], zpad], axis=0)  # tap j=2: x[t+d] @ W2
    return lo + z1 + hi


def _tap_conv_kernel(x_ref, w_ref, out_ref, *, dilation: int):
    # x_ref: (BB, T, Cin); w_ref: (3, Cin, Cout); out_ref: (BB, T, Cout)
    BB, T, _ = x_ref.shape
    for b in range(BB):  # static unroll; shifts are per batch row
        x = x_ref[b]
        z = [
            jax.lax.dot_general(
                x,
                w_ref[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for j in range(3)
        ]
        out_ref[b] = _shift_add(z[0], z[1], z[2], dilation).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "interpret", "block_b"))
def tap_conv(
    x: Array,
    kernel: Array,
    dilation: int,
    interpret: bool = False,
    block_b: int = 2,
) -> Array:
    """Fused y[b,t] = Σ_j x[b, t+(j-1)·d] @ kernel[j] ('SAME' zero pad, k=3).

    x: (B, T, Cin); kernel: (3, Cin, Cout) in x.dtype. Returns (B, T, Cout).
    """
    B, T, Cin = x.shape
    k, _, Cout = kernel.shape
    assert k == 3, "tap_conv is specialized to the reference's k=3 convs"
    assert 0 < dilation < T
    bb = block_b
    while B % bb:
        bb -= 1
    return pl.pallas_call(
        functools.partial(_tap_conv_kernel, dilation=dilation),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, T, Cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # same full weight block every step: Mosaic keeps it resident
            pl.BlockSpec((3, Cin, Cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, T, Cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, Cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * B * T * Cin * Cout,
            bytes_accessed=(B * T * (Cin + Cout) + 3 * Cin * Cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, kernel)


def _tap_conv_dw_kernel(x_ref, g_ref, out_ref, *, dilation: int):
    # x_ref: (BB, T, Cin); g_ref: (BB, T, Cout); out_ref: (3, Cin, Cout) f32,
    # accumulated across grid steps (same output block each step).
    d = dilation
    T = x_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...]
    g = g_ref[...]

    def contract(xs, gs):
        # Σ_{b,t} xs[b,t,:]^T gs[b,t,:] -> (Cin, Cout). Mosaic's tpu.matmul
        # takes a single contracting dim and its reshape pass rejects odd
        # row-collapses in bf16, so contract each (static) batch row with a
        # 2-D dot and sum — BB extra MXU launches, same math.
        acc = None
        for b in range(xs.shape[0]):
            p = jax.lax.dot_general(
                xs[b],
                gs[b],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
        return acc

    # tap j: dW_j = Σ_t x[t+(j-1)d]^T g[t]  (valid rows only; pad rows are 0)
    out_ref[0] += contract(x[:, : T - d, :], g[:, d:, :])
    out_ref[1] += contract(x, g)
    out_ref[2] += contract(x[:, d:, :], g[:, : T - d, :])


@functools.partial(jax.jit, static_argnames=("dilation", "interpret", "block_b"))
def tap_conv_dw(
    x: Array,
    g: Array,
    dilation: int,
    interpret: bool = False,
    block_b: int = 4,
) -> Array:
    """All three dW taps in one pass: x and g each read ONCE from HBM.

    block_b=4 keeps the flagship worst case (Cin=320, Cout=640: 5.5 MB of
    x+g per step) inside VMEM with Mosaic's input double-buffering plus the
    2.5 MB f32 accumulator.

    x: (B, T, Cin); g: (B, T, Cout) — the conv's output cotangent.
    Returns (3, Cin, Cout) float32 (accumulated exactly; cast at the caller).
    """
    B, T, Cin = x.shape
    _, _, Cout = g.shape
    bb = block_b
    while B % bb:
        bb -= 1
    return pl.pallas_call(
        functools.partial(_tap_conv_dw_kernel, dilation=dilation),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, T, Cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, Cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, Cin, Cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, Cin, Cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * B * T * Cin * Cout,
            bytes_accessed=(B * T * (Cin + Cout)) * x.dtype.itemsize
            + 3 * Cin * Cout * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, g)


# ---------------------------------------------------------------------------
# differentiable wrapper: pallas forward + pallas backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_tap_conv(x: Array, kernel: Array, dilation: int, interpret: bool = False):
    """Differentiable fused 3-tap dilated conv (see module docstring)."""
    return tap_conv(x, kernel, dilation, interpret)


def _ptc_fwd(x, kernel, dilation, interpret):
    return tap_conv(x, kernel, dilation, interpret), (x, kernel)


def _ptc_bwd(dilation, interpret, res, gy):
    x, kernel = res
    # dx: the transpose of 'SAME' conv = 'SAME' conv of gy with tap-reversed,
    # transposed weights: dx[s] = Σ_j gy[s-(j-1)d] W_j^T = Σ_j' gy[s+(j'-1)d]
    # (W_rev)_{j'} with (W_rev)_{j'} = W_{2-j'}^T.
    w_rev_t = jnp.flip(kernel, axis=0).transpose(0, 2, 1)
    dx = tap_conv(gy, w_rev_t, dilation, interpret)
    dk = tap_conv_dw(x, gy, dilation, interpret).astype(kernel.dtype)
    return dx, dk


pallas_tap_conv.defvjp(_ptc_fwd, _ptc_bwd)
