"""Pallas TPU kernel: blocked cosine-similarity retrieval ranks.

The reference scores full-test-set retrieval with an O(B²) *Python* loop over
pairwise cosine similarities [ref: speech_decoding/models.py:221-233] to dodge
GPU OOM. The XLA rewrite (models/classifier.py) is one matmul but still
materializes B×B (plus two normalized (B, D) copies; D = F·T ≈ 369k floats per
row). This kernel streams instead:

  * grid (rows i, cols j, depth k) with the depth loop innermost;
  * (BM, BK) @ (BK, BN) MXU partial dots accumulate in a VMEM scratch;
  * at the last depth step the tile is normalized on the fly (row/col norms
    and the diagonal dots are tiny precomputed vectors) and reduced to
    per-row counts of entries strictly greater than the diagonal — the
    diagonal's rank, which is exactly the top-k membership statistic
    [ref: models.py:236-243];
  * only the (B,) int32 rank vector is ever written to HBM — O(B) memory for
    an O(B²·D) computation, no normalized copies, no similarity matrix.

Orientation matches the reference's transposed scoring: rank[i] counts
sim(Y_i, Z_j) > sim(Y_i, Z_i) over j [ref: models.py:233-236].

Interpret mode is used automatically off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ranks_kernel(
    y_ref,      # (BM, BK) audio rows block
    z_ref,      # (BN, BK) brain rows block (contracted on the shared BK axis)
    ny_ref,     # (BM, 1) audio row norms
    nz_ref,     # (1, BN) brain row norms (lane-major)
    diag_ref,   # (BM, 1) diagonal cosine similarity of these rows
    rank_ref,   # (BM, 1) int32 output, revisited across j
    acc_ref,    # (BM, BN) f32 scratch
    *,
    n_valid: int,
    bn: int,
    eps: float,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _():
        rank_ref[:] = jnp.zeros_like(rank_ref)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        y_ref[:],
        z_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        denom = jnp.maximum(ny_ref[:] * nz_ref[:], eps)  # (BM,1)*(1,BN) -> (BM, BN)
        sim = acc_ref[:] / denom
        col = j * bn + jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        row = i * sim.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, sim.shape, 0
        )
        # exclude the diagonal itself: its in-kernel value can differ from the
        # precomputed diag by 1 ulp and must never count as "greater"
        valid = jnp.logical_and(col < n_valid, col != row)
        greater = jnp.logical_and(sim > diag_ref[:], valid)
        rank_ref[:] += jnp.sum(greater.astype(jnp.int32), axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "interpret")
)
def retrieval_ranks_pallas(
    Z: Array,
    Y: Array,
    bm: int = 128,
    bn: int = 128,
    bk: int = 512,
    eps: float = 1e-8,
    interpret: bool = False,
) -> Array:
    """Per-row rank of the diagonal in the (transposed-orientation) cosine
    similarity matrix. Z, Y: (B, ...) brain/audio embeddings. Returns (B,)
    int32; top-k accuracy = mean(rank < k)."""
    B = Z.shape[0]
    y = Y.reshape(B, -1).astype(jnp.float32)
    z = Z.reshape(B, -1).astype(jnp.float32)
    D = y.shape[1]

    # cheap O(B·D) pass: norms and diagonal dots
    ny = jnp.linalg.norm(y, axis=-1)
    nz = jnp.linalg.norm(z, axis=-1)
    diag = jnp.sum(y * z, axis=-1) / jnp.maximum(ny * nz, eps)

    Bp = -(-B // max(bm, bn)) * max(bm, bn)
    Dp = -(-D // bk) * bk
    y = jnp.pad(y, ((0, Bp - B), (0, Dp - D)))
    z = jnp.pad(z, ((0, Bp - B), (0, Dp - D)))
    ny_p = jnp.pad(ny, (0, Bp - B)).reshape(-1, 1)
    nz_p = jnp.pad(nz, (0, Bp - B)).reshape(1, -1)
    diag_p = jnp.pad(diag, (0, Bp - B)).reshape(-1, 1)

    grid = (Bp // bm, Bp // bn, Dp // bk)
    ranks = pl.pallas_call(
        functools.partial(_ranks_kernel, n_valid=B, bn=bn, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Bp * Dp,
            bytes_accessed=2 * Bp * Dp * 4 * (Bp // bn),
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, z, ny_p, nz_p, diag_p)
    return ranks[:B, 0]


def retrieval_metrics_pallas(
    Z: Array, Y: Array, ks: Sequence[int] = (1, 10), interpret: bool = False
) -> Tuple[Array, ...]:
    """Drop-in for models.classifier.retrieval_metrics backed by the kernel."""
    ranks = retrieval_ranks_pallas(Z, Y, interpret=interpret)
    return tuple(jnp.mean((ranks < k).astype(jnp.float32)) for k in ks)
