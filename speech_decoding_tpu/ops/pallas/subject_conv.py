"""Pallas TPU kernel: per-subject 1x1 conv (gathered batched matmul) with
scalar-prefetched subject indices and a custom VJP.

The SubjectBlock applies a different (D1, D1) matrix to each batch row,
selected by subject id [ref: speech_decoding/models.py:98-116]. The XLA
formulation gathers W[subject_idxs] — materializing a (B, D1, D1) tensor in
HBM (B=64, D1=270 -> ~18 MB written+read per step) before the batched matmul.
This kernel uses PrefetchScalarGridSpec: the subject id of each batch row is
known before the body runs, so the right (D1, D1) weight block is DMA'd
straight from the weight array — no gathered copy exists anywhere.

Backward:
  dX[b] = dY[b] @ W[s_b]^T  — the same kernel with transposed weights;
  dW[s] = sum_{b: s_b = s} X[b]^T dY[b] — a segment-sum reduction, computed
  with XLA's segment_sum (scatter-add over at most S=27 segments is tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _subject_matmul_kernel(sidx_ref, x_ref, w_ref, out_ref):
    # x_ref: (1, T, D_in) one batch row; w_ref: (1, D_in, D_out) that row's
    # subject weights (selected via the index_map from prefetched sidx)
    out_ref[0] = jax.lax.dot_general(
        x_ref[0],
        w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _subject_matmul_fwd(
    x: Array, w: Array, subject_idxs: Array, interpret: bool = False
) -> Array:
    """x: (B, T, D_in); w: (S, D_in, D_out); subject_idxs: (B,) int32.
    Returns (B, T, D_out) with out[b] = x[b] @ w[subject_idxs[b]]."""
    B, T, Din = x.shape
    S, _, Dout = w.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, Din), lambda b, sidx: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, Din, Dout), lambda b, sidx: (sidx[b], 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, T, Dout), lambda b, sidx: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _subject_matmul_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Dout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * Din * Dout,
            bytes_accessed=(B * T * (Din + Dout) + B * Din * Dout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(subject_idxs.astype(jnp.int32), x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def subject_matmul(x: Array, w: Array, subject_idxs: Array, interpret: bool = False):
    """out[b] = x[b] @ w[s_b] without materializing the gathered weights."""
    return _subject_matmul_fwd(x, w, subject_idxs, interpret)


def _fwd(x, w, subject_idxs, interpret):
    return _subject_matmul_fwd(x, w, subject_idxs, interpret), (x, w, subject_idxs)


def _bwd(interpret, res, g):
    x, w, subject_idxs = res
    S = w.shape[0]
    # dX via the same kernel on transposed weights
    wT = jnp.swapaxes(w, 1, 2)
    dx = _subject_matmul_fwd(g.astype(x.dtype), wT.astype(x.dtype), subject_idxs, interpret)
    # dW: per-row outer products reduced by subject (S is tiny; XLA segment_sum)
    per_row = jnp.einsum(
        "bti,bto->bio", x.astype(jnp.float32), g.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dw = jax.ops.segment_sum(per_row, subject_idxs, num_segments=S).astype(w.dtype)
    return dx.astype(x.dtype), dw, None


subject_matmul.defvjp(_fwd, _bwd)
