"""Pallas TPU kernel: a fully-fused eval-mode ConvBlock.

The encoder's hot stack is five blocks of [dilated conv k=3 (+skip) -> BN ->
GELU -> dilated conv (+skip) -> BN -> GELU -> dilated conv -> GLU]
[ref: speech_decoding/models.py:120-166]. XLA materializes every conv result
in HBM (~9 tensors of (B, 360, 320) per block); this kernel keeps a tile of
batch rows resident in VMEM through the WHOLE block — the only HBM traffic is
the block's input and output. In eval mode BatchNorm is a per-channel affine
(scale/offset folded from the running statistics), so the entire block is
shift-invariant local compute: dilated convs become three shifted MXU matmuls
on the VMEM tile with zero-padding at the window edges ('SAME').

Used for inference/serving and the full-test-set eval forward; training keeps
the XLA path (train-mode BN needs global batch statistics between the convs).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _erf_f32(x: Array) -> Array:
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7) — this platform's
    Mosaic implements neither erf nor erfc, so we build it from exp (the
    pallas-guide rule: implement what's missing)."""
    a1, a2, a3 = np.float32(0.254829592), np.float32(-0.284496736), np.float32(1.421413741)
    a4, a5, p = np.float32(-1.453152027), np.float32(1.061405429), np.float32(0.3275911)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact_f32(x: Array) -> Array:
    """Exact (erf-form) GELU in f32."""
    xf = x.astype(jnp.float32)
    return 0.5 * xf * (1.0 + _erf_f32(xf * np.float32(1 / np.sqrt(2))))


def _conv3(x: Array, w: Array, d: int) -> Array:
    """(T, Cin) x (3, Cin, Cout) dilated-by-d 'SAME' conv as 3 shifted 2-D
    matmuls on a VMEM-resident tile (zero padding at the window edges)."""
    T = x.shape[-2]
    xp = jnp.pad(x, ((d, d), (0, 0)))
    y = None
    for j in range(3):
        xj = jax.lax.slice_in_dim(xp, j * d, j * d + T, axis=0)
        yj = jnp.dot(xj, w[j], preferred_element_type=jnp.float32)
        y = yj if y is None else y + yj
    return y


def _block_kernel(
    x_ref, w0_ref, b0_ref, a0_ref, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref,
    out_ref, *, k: int, d0: int, d1: int,
):
    x = x_ref[0]  # (T, Cin) — one batch row per grid step, all math 2-D
    dt = x.dtype

    y = _conv3(x, w0_ref[...], d0) + b0_ref[...]
    if k > 0:
        y = y + x.astype(jnp.float32)
    # folded eval BN: y * scale + offset, then exact GELU
    y = _gelu_exact_f32(y * a0_ref[0][None, :] + a0_ref[1][None, :]).astype(dt)

    y1 = _conv3(y, w1_ref[...], d1) + b1_ref[...] + y.astype(jnp.float32)
    y1 = _gelu_exact_f32(y1 * a1_ref[0][None, :] + a1_ref[1][None, :]).astype(dt)

    y2 = _conv3(y1, w2_ref[...], 2) + b2_ref[...]
    D2 = y2.shape[-1] // 2
    out_ref[0] = (y2[:, :D2] * jax.nn.sigmoid(y2[:, D2:])).astype(out_ref.dtype)


def fold_bn(params_bn: Dict, stats_bn: Dict, eps: float = 1e-5) -> np.ndarray:
    """(2, C) [scale; offset] from eval-mode BN params + running stats."""
    scale = np.asarray(params_bn["scale"]) / np.sqrt(np.asarray(stats_bn["var"]) + eps)
    offset = np.asarray(params_bn["bias"]) - np.asarray(stats_bn["mean"]) * scale
    return np.stack([scale, offset]).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def conv_block_fused(
    x: Array,
    w0: Array, b0: Array, a0: Array,
    w1: Array, b1: Array, a1: Array,
    w2: Array, b2: Array,
    k: int,
    interpret: bool = False,
) -> Array:
    """Eval-mode ConvBlock k: x (B, T, Cin) -> (B, T, D2). a0/a1 are the
    folded BN affines (2, D2). Grid = one batch row per step (2-D in-kernel
    math); the whole block's intermediates stay in VMEM."""
    B, T, Cin = x.shape
    D2 = w1.shape[-1]
    d0 = 2 ** ((2 * k) % 5)
    d1 = 2 ** ((2 * k + 1) % 5)
    rows = 1

    grid = (B,)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_kernel, k=k, d0=d0, d1=d1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, T, Cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((3, Cin, D2)), full((1, D2)), full((2, D2)),
            full((3, D2, D2)), full((1, D2)), full((2, D2)),
            full((3, D2, 2 * D2)), full((1, 2 * D2)),
        ],
        out_specs=pl.BlockSpec((rows, T, D2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D2), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * 3 * (Cin * D2 + D2 * D2 + D2 * 2 * D2),
            bytes_accessed=(B * T * (Cin + D2)) * x.dtype.itemsize,
            transcendentals=2 * B * T * D2,
        ),
        interpret=interpret,
    )(x, w0, b0.reshape(1, -1), a0, w1, b1.reshape(1, -1), a1, w2,
      b2.reshape(1, -1))


def prepare_fused_stack(params: Dict, batch_stats: Dict, dtype=jnp.float32):
    """Fold BN stats and stage per-block weights ONCE (device arrays); reuse
    across calls of apply_fused_stack."""
    staged = []
    for k in range(5):
        blk = params[f"conv{k}"]
        st = batch_stats[f"conv{k}"]
        staged.append(
            (
                jnp.asarray(blk["conv0"]["kernel"], dtype),
                jnp.asarray(blk["conv0"]["bias"], jnp.float32),
                jnp.asarray(fold_bn(blk["batchnorm0"], st["batchnorm0"])),
                jnp.asarray(blk["conv1"]["kernel"], dtype),
                jnp.asarray(blk["conv1"]["bias"], jnp.float32),
                jnp.asarray(fold_bn(blk["batchnorm1"], st["batchnorm1"])),
                jnp.asarray(blk["conv2"]["kernel"], dtype),
                jnp.asarray(blk["conv2"]["bias"], jnp.float32),
            )
        )
    return staged


def apply_fused_stack(staged, x: Array, interpret: bool = False) -> Array:
    """Apply all five fused ConvBlocks (eval mode) to x (B, T, D1)."""
    for k, args in enumerate(staged):
        x = conv_block_fused(x, *args, k=k, interpret=interpret)
    return x
