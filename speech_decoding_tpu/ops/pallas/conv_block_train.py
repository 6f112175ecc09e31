"""Pallas TPU kernels: fully-fused TRAIN-mode ConvBlock (forward + custom VJP).

The training hot loop is five blocks of [dilated conv k=3 (+skip) -> BN ->
GELU -> dilated conv (+skip) -> BN -> GELU -> dilated conv -> GLU]
[ref: speech_decoding/models.py:120-166] — ~85-90% of the step per the
round-1 profile. Train-mode BatchNorm needs *global batch statistics* between
the convs, so a single VMEM-resident kernel like the eval one
(ops/pallas/conv_block.py) is impossible; instead each block runs as THREE
kernels per direction, one per BN sync point, with the statistics reductions
fused into the producing kernel as grid-carried accumulators:

  forward
    F1: y0 = conv_d0(x) (+skip)                 ; acc Σy0, Σy0²
    F2: h0 = gelu(bn0(y0)); y1 = conv_d1(h0)+h0 ; acc Σy1, Σy1²
    F3: h1 = gelu(bn1(y1)); out = glu(conv_2(h1))
  backward (recomputes h0/h1/y2 from the saved y0/y1 — they never hit HBM)
    B1: glu/conv2 bwd -> du1                     ; acc dW2, db2, Σdu1, Σdu1·x̂1
    B2: bn1 bwd, conv1 bwd -> du0                ; acc dW1, db1, Σdu0, Σdu0·x̂0
    B3: bn0 bwd, conv0 bwd -> dx                 ; acc dW0, db0

Between kernels only O(C) vector math runs in XLA (means, inverse stds, the
two BN-backward correction terms). Weight gradients accumulate in VMEM-
resident f32 accumulators across the (sequential) TPU grid — no (B, ...)
weight-grad intermediates in HBM. Dilated k=3 convs are three shifted MXU
matmuls on the VMEM tile; the transposed convs of the backward reuse the same
primitive with index-reversed transposed kernels.

Numerics mirror the XLA path (models/brain_encoder.py): BN statistics in f32
computed from compute-dtype activations, normalization applied in the compute
dtype, exact (erf) GELU, torch-style unbiased running-variance updates left to
the caller (the returned per-BN (mean, biased var) pair is exactly what
TorchBatchNorm computes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech_decoding_tpu.ops.pallas.conv_block import _conv3, _erf_f32, _gelu_exact_f32

Array = jax.Array

_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))
_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _dgelu_f32(u: Array) -> Array:
    """d/du [u * Phi(u)] = Phi(u) + u * phi(u), exact erf form, f32."""
    uf = u.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_f32(uf * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * uf * uf) * _INV_SQRT2PI
    return cdf + uf * pdf


def _bn_apply(y: Array, mi_ref, gb_ref, dt) -> Tuple[Array, Array]:
    """(normalized-and-affine u, x̂) with the XLA path's dtype contract:
    normalize in the compute dtype from f32 stats [ref models/brain_encoder.py
    TorchBatchNorm]. mi_ref: (2, C) [mean; inv], gb_ref: (2, C) [scale; bias].
    """
    m = mi_ref[0].astype(dt)
    inv = mi_ref[1]
    g, b = gb_ref[0], gb_ref[1]
    xhat = (y.astype(dt) - m) * inv.astype(dt)
    u = xhat * g.astype(dt) + b.astype(dt)
    return u, xhat


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _f1_kernel(x_ref, w0_ref, b0_ref, y0_ref, s0_ref, *, skip: bool, d0: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        s0_ref[...] = jnp.zeros_like(s0_ref)

    for r in range(x_ref.shape[0]):  # independent rows: MXU/VPU overlap
        x = x_ref[r]
        y = _conv3(x, w0_ref[...], d0) + b0_ref[...]
        if skip:
            y = y + x.astype(jnp.float32)
        yc = y.astype(y0_ref.dtype)
        y0_ref[r] = yc
        yf = yc.astype(jnp.float32)
        s0_ref[0, :] += jnp.sum(yf, axis=0)
        s0_ref[1, :] += jnp.sum(yf * yf, axis=0)


def _f2_kernel(y0_ref, mi0_ref, gb0_ref, w1_ref, b1_ref, y1_ref, s1_ref, *, d1: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)

    dt = y1_ref.dtype
    for r in range(y0_ref.shape[0]):
        u0, _ = _bn_apply(y0_ref[r], mi0_ref, gb0_ref, dt)
        h0 = _gelu_exact_f32(u0).astype(dt)
        y1 = _conv3(h0, w1_ref[...], d1) + b1_ref[...] + h0.astype(jnp.float32)
        yc = y1.astype(dt)
        y1_ref[r] = yc
        yf = yc.astype(jnp.float32)
        s1_ref[0, :] += jnp.sum(yf, axis=0)
        s1_ref[1, :] += jnp.sum(yf * yf, axis=0)


def _f3_kernel(y1_ref, mi1_ref, gb1_ref, w2_ref, b2_ref, out_ref):
    dt = out_ref.dtype
    for r in range(y1_ref.shape[0]):
        u1, _ = _bn_apply(y1_ref[r], mi1_ref, gb1_ref, dt)
        h1 = _gelu_exact_f32(u1).astype(dt)
        y2 = _conv3(h1, w2_ref[...], 2) + b2_ref[...]
        C = y2.shape[-1] // 2
        a, b = y2[:, :C], y2[:, C:]
        out_ref[r] = (
            a.astype(dt) * jax.nn.sigmoid(b.astype(jnp.float32)).astype(dt)
        )


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _b1_kernel(
    g_ref, y1_ref, mi1_ref, gb1_ref, w2_ref, b2_ref, w2t_ref,
    du1_ref, s_ref, dw2_ref, db2_ref,
):
    """GLU + conv2 + gelu·bn1-input backward. Writes du1 = dL/du1 (u1 = BN1
    output pre-GELU); accumulates dW2, db2 and the BN1-backward sums
    (Σ du1·g1 is recovered in XLA from s via g1)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dt = du1_ref.dtype
    for r in range(g_ref.shape[0]):
        dout = g_ref[r]
        # recompute h1, y2 (never stored)
        u1, xhat1 = _bn_apply(y1_ref[r], mi1_ref, gb1_ref, dt)
        h1 = _gelu_exact_f32(u1).astype(dt)
        y2 = _conv3(h1, w2_ref[...], 2) + b2_ref[...]
        C = y2.shape[-1] // 2
        a, b = y2[:, :C], y2[:, C:]
        sig = jax.nn.sigmoid(b.astype(jnp.float32))
        df = dout.astype(jnp.float32)
        da = df * sig
        db = df * a * sig * (1.0 - sig)
        dy2 = jnp.concatenate([da, db], axis=-1).astype(dt)

        # conv2 weight/bias grads: dW2[j] = shift_j(h1)^T @ dy2
        T = h1.shape[0]
        hp = jnp.pad(h1, ((2, 2), (0, 0)))
        for j in range(3):
            hj = jax.lax.slice_in_dim(hp, j * 2, j * 2 + T, axis=0)
            dw2_ref[j] += jnp.dot(
                hj.T, dy2, preferred_element_type=jnp.float32
            )
        db2_ref[0, :] += jnp.sum(dy2.astype(jnp.float32), axis=0)

        # input grad through conv2 (transposed conv = same shifts, reversed
        # transposed kernels), then GELU backward
        dh1 = _conv3(dy2, w2t_ref[...], 2)
        du1 = (dh1 * _dgelu_f32(u1)).astype(dt)
        du1_ref[r] = du1
        duf = du1.astype(jnp.float32)
        s_ref[0, :] += jnp.sum(duf, axis=0)
        s_ref[1, :] += jnp.sum(duf * xhat1.astype(jnp.float32), axis=0)


def _b2_kernel(
    du1_ref, y1_ref, mi1_ref, g1c_ref, y0_ref, mi0_ref, gb0_ref,
    w1t_ref, du0_ref, s_ref, dw1_ref, db1_ref, *, d1: int,
):
    """BN1 backward -> dy1; conv1 backward (dW1 needs the recomputed h0);
    skip passthrough; gelu·bn0 backward -> du0."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    dt = du0_ref.dtype
    m1 = mi1_ref[0]
    inv1 = mi1_ref[1]
    g1, c1, c2 = g1c_ref[0], g1c_ref[1], g1c_ref[2]
    for r in range(du1_ref.shape[0]):
        # dy1 = inv1*(g1*du1 - c1 - x̂1*c2)  (c's precomputed per channel)
        y1f = y1_ref[r].astype(jnp.float32)
        xhat1 = (y1f - m1) * inv1
        du1 = du1_ref[r].astype(jnp.float32)
        dy1 = (inv1 * (g1 * du1 - c1 - xhat1 * c2)).astype(dt)

        db1_ref[0, :] += jnp.sum(dy1.astype(jnp.float32), axis=0)

        # recompute h0 for the conv1 weight grad
        u0, xhat0 = _bn_apply(y0_ref[r], mi0_ref, gb0_ref, dt)
        h0 = _gelu_exact_f32(u0).astype(dt)
        T = h0.shape[0]
        hp = jnp.pad(h0, ((d1, d1), (0, 0)))
        for j in range(3):
            hj = jax.lax.slice_in_dim(hp, j * d1, j * d1 + T, axis=0)
            dw1_ref[j] += jnp.dot(hj.T, dy1, preferred_element_type=jnp.float32)

        # dh0 = conv1^T(dy1) + dy1 (residual skip)
        dh0 = _conv3(dy1, w1t_ref[...], d1) + dy1.astype(jnp.float32)
        du0 = (dh0 * _dgelu_f32(u0)).astype(dt)
        du0_ref[r] = du0
        duf = du0.astype(jnp.float32)
        s_ref[0, :] += jnp.sum(duf, axis=0)
        s_ref[1, :] += jnp.sum(duf * xhat0.astype(jnp.float32), axis=0)


def _b3_kernel(
    du0_ref, y0_ref, mi0_ref, g0c_ref, x_ref, w0t_ref,
    dx_ref, dw0_ref, db0_ref, *, skip: bool, d0: int,
):
    """BN0 backward -> dy0; conv0 backward -> dW0, db0, dx (+skip)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0_ref[...] = jnp.zeros_like(dw0_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)

    dt = dx_ref.dtype
    m0 = mi0_ref[0]
    inv0 = mi0_ref[1]
    g0, c1, c2 = g0c_ref[0], g0c_ref[1], g0c_ref[2]
    for r in range(du0_ref.shape[0]):
        y0f = y0_ref[r].astype(jnp.float32)
        xhat0 = (y0f - m0) * inv0
        du0 = du0_ref[r].astype(jnp.float32)
        dy0 = (inv0 * (g0 * du0 - c1 - xhat0 * c2)).astype(dt)

        db0_ref[0, :] += jnp.sum(dy0.astype(jnp.float32), axis=0)

        x = x_ref[r]
        T = x.shape[0]
        xp = jnp.pad(x, ((d0, d0), (0, 0)))
        for j in range(3):
            xj = jax.lax.slice_in_dim(xp, j * d0, j * d0 + T, axis=0)
            dw0_ref[j] += jnp.dot(xj.T, dy0, preferred_element_type=jnp.float32)

        dx = _conv3(dy0, w0t_ref[...], d0)
        if skip:
            dx = dx + dy0.astype(jnp.float32)
        dx_ref[r] = dx.astype(dt)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _full(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def _pick_rows(B: int) -> int:
    """Rows per grid step: >1 gives the Mosaic scheduler independent
    MXU (conv) and VPU (GELU/BN) chains to overlap; bounded by VMEM."""
    for r in (4, 2):
        if B % r == 0:
            return r
    return 1


def _row(R, T, C):
    return pl.BlockSpec((R, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _flip_t(w: Array) -> Array:
    """(3, Cin, Cout) -> (3, Cout, Cin): index-reversed transposed taps, so the
    transposed conv is a plain _conv3 with the same dilation."""
    return jnp.transpose(w[::-1], (0, 2, 1))


def _stats_from_sums(s: Array, n: int, eps: float = 1e-5):
    """(mean, biased var, inv) in f32 from accumulated [Σy; Σy²]."""
    m = s[0] / n
    var = s[1] / n - m * m
    inv = jax.lax.rsqrt(var + eps)
    return m, var, inv


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14)
)
def conv_block_train(
    x: Array,
    w0: Array, b0: Array, g0: Array, beta0: Array,
    w1: Array, b1: Array, g1: Array, beta1: Array,
    w2: Array, b2: Array,
    k: int,
    eps: float = 1e-5,
    interpret: bool = False,
    axis_name=None,
):
    """Train-mode ConvBlock k [ref: models.py:120-166], fully fused.

    x: (B, T, Cin) in the compute dtype; w*: (3, Cin/C, C/2C) conv taps;
    b*: conv biases (C,)/(2C,); g*/beta*: BN scale/bias (C,).
    Returns (out (B,T,C), (m0, v0, m1, v1)) where (m, v) are the BATCH mean
    and biased variance each BN computed — the caller applies the torch-style
    running-stat update (unbiased var, momentum) exactly like TorchBatchNorm.
    The stats outputs are aux (their cotangents are ignored — running-stat
    updates are not differentiated, matching the mutable-collection path).

    ``axis_name``: inside shard_map with the batch sharded over that axis,
    the BN statistic sums (forward) and BN-backward correction sums psum
    across shards — synchronized BatchNorm, numerically matching the
    single-device op on the global batch. Per-shard weight cotangents are
    left partial: shard_map's transpose psums cotangents of replicated
    (P()) inputs itself.
    """
    out, _, _, _, _, _, _, m0, v0, m1, v1 = _fwd_impl(
        x, w0, b0, g0, beta0, w1, b1, g1, beta1, w2, b2, k, eps, interpret,
        axis_name,
    )
    return out, (m0, v0, m1, v1)


def _fwd_impl(
    x, w0, b0, g0, beta0, w1, b1, g1, beta1, w2, b2, k, eps, interpret,
    axis_name=None,
):
    B, T, Cin = x.shape
    C = w1.shape[-1]
    d0 = 2 ** ((2 * k) % 5)
    d1 = 2 ** ((2 * k + 1) % 5)
    n = B * T
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    dt = x.dtype
    R = _pick_rows(B)
    grid = (B // R,)

    y0, s0 = pl.pallas_call(
        functools.partial(_f1_kernel, skip=k > 0, d0=d0),
        grid=grid,
        in_specs=[_row(R, T, Cin), _full((3, Cin, C)), _full((1, C))],
        out_specs=[_row(R, T, C), _full((2, C))],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), dt),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ],
        interpret=interpret,
    )(x, w0.astype(dt), b0.reshape(1, -1))
    if axis_name is not None:
        s0 = jax.lax.psum(s0, axis_name)
    m0, v0, inv0 = _stats_from_sums(s0, n, eps)
    mi0 = jnp.stack([m0, inv0])
    gb0 = jnp.stack([g0, beta0]).astype(jnp.float32)

    y1, s1 = pl.pallas_call(
        functools.partial(_f2_kernel, d1=d1),
        grid=grid,
        in_specs=[_row(R, T, C), _full((2, C)), _full((2, C)),
                  _full((3, C, C)), _full((1, C))],
        out_specs=[_row(R, T, C), _full((2, C))],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), dt),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
        ],
        interpret=interpret,
    )(y0, mi0, gb0, w1.astype(dt), b1.reshape(1, -1))
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
    m1, v1, inv1 = _stats_from_sums(s1, n, eps)
    mi1 = jnp.stack([m1, inv1])
    gb1 = jnp.stack([g1, beta1]).astype(jnp.float32)

    out = pl.pallas_call(
        _f3_kernel,
        grid=grid,
        in_specs=[_row(R, T, C), _full((2, C)), _full((2, C)),
                  _full((3, C, 2 * C)), _full((1, 2 * C))],
        out_specs=_row(R, T, C),
        out_shape=jax.ShapeDtypeStruct((B, T, C), dt),
        interpret=interpret,
    )(y1, mi1, gb1, w2.astype(dt), b2.reshape(1, -1))

    return out, y0, y1, mi0, gb0, mi1, gb1, m0, v0, m1, v1


def _fwd_rule(
    x, w0, b0, g0, beta0, w1, b1, g1, beta1, w2, b2, k, eps, interpret,
    axis_name=None,
):
    out, y0, y1, mi0, gb0, mi1, gb1, m0, v0, m1, v1 = _fwd_impl(
        x, w0, b0, g0, beta0, w1, b1, g1, beta1, w2, b2, k, eps, interpret,
        axis_name,
    )
    res = (x, y0, y1, mi0, gb0, mi1, gb1, w0, w1, w2, b2, g0, g1)
    return (out, (m0, v0, m1, v1)), res


def _bwd_rule(k, eps, interpret, axis_name, res, grads):
    dout, _ = grads  # stats cotangents are zeros (aux outputs), ignored
    x, y0, y1, mi0, gb0, mi1, gb1, w0, w1, w2, b2, g0, g1 = res
    B, T, Cin = x.shape
    C = w1.shape[-1]
    d0 = 2 ** ((2 * k) % 5)
    d1 = 2 ** ((2 * k + 1) % 5)
    n = B * T
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    dt = x.dtype
    R = _pick_rows(B)
    grid = (B // R,)

    du1, s_bn1, dw2, db2 = pl.pallas_call(
        _b1_kernel,
        grid=grid,
        in_specs=[_row(R, T, C), _row(R, T, C), _full((2, C)), _full((2, C)),
                  _full((3, C, 2 * C)), _full((1, 2 * C)), _full((3, 2 * C, C))],
        out_specs=[_row(R, T, C), _full((2, C)), _full((3, C, 2 * C)), _full((1, 2 * C))],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), dt),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
            jax.ShapeDtypeStruct((3, C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
        ],
        interpret=interpret,
    )(dout, y1, mi1, gb1, w2.astype(dt), b2.reshape(1, -1), _flip_t(w2).astype(dt))
    # BN1 grads and backward correction terms (all O(C) XLA vector math);
    # dg/dbeta stay per-shard partial sums (shard_map transposes replicated
    # params with a psum), the c's need the GLOBAL sums
    dg1 = s_bn1[1]
    dbeta1 = s_bn1[0]
    if axis_name is not None:
        s_bn1 = jax.lax.psum(s_bn1, axis_name)
    g1f = g1.astype(jnp.float32)
    c1_1 = g1f * s_bn1[0] / n
    c2_1 = g1f * s_bn1[1] / n
    g1c = jnp.stack([g1f, c1_1, c2_1])

    du0, s_bn0, dw1, db1 = pl.pallas_call(
        functools.partial(_b2_kernel, d1=d1),
        grid=grid,
        in_specs=[_row(R, T, C), _row(R, T, C), _full((2, C)), _full((3, C)),
                  _row(R, T, C), _full((2, C)), _full((2, C)), _full((3, C, C))],
        out_specs=[_row(R, T, C), _full((2, C)), _full((3, C, C)), _full((1, C))],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), dt),
            jax.ShapeDtypeStruct((2, C), jnp.float32),
            jax.ShapeDtypeStruct((3, C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(du1, y1, mi1, g1c, y0, mi0, gb0, _flip_t(w1).astype(dt))
    dg0 = s_bn0[1]
    dbeta0 = s_bn0[0]
    if axis_name is not None:
        s_bn0 = jax.lax.psum(s_bn0, axis_name)
    g0f = g0.astype(jnp.float32)
    c1_0 = g0f * s_bn0[0] / n
    c2_0 = g0f * s_bn0[1] / n
    g0c = jnp.stack([g0f, c1_0, c2_0])

    dx, dw0, db0 = pl.pallas_call(
        functools.partial(_b3_kernel, skip=k > 0, d0=d0),
        grid=grid,
        in_specs=[_row(R, T, C), _row(R, T, C), _full((2, C)), _full((3, C)),
                  _row(R, T, Cin), _full((3, C, Cin))],
        out_specs=[_row(R, T, Cin), _full((3, Cin, C)), _full((1, C))],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, Cin), dt),
            jax.ShapeDtypeStruct((3, Cin, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
    )(du0, y0, mi0, g0c, x, _flip_t(w0).astype(dt))

    return (
        dx,
        dw0.astype(w0.dtype), db0[0].astype(jnp.float32),
        dg0, dbeta0,
        dw1.astype(w1.dtype), db1[0].astype(jnp.float32),
        dg1, dbeta1,
        dw2.astype(w2.dtype), db2[0].astype(jnp.float32),
    )


conv_block_train.defvjp(_fwd_rule, _bwd_rule)
