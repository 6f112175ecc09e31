"""Explicitly sharded CLIP loss and retrieval eval (shard_map over the mesh).

The B×B similarity matrix is the memory/compute hot spot at large global batch
and at full-test-set retrieval eval [ref: speech_decoding/models.py:221-233,
utils/loss.py:68]. Under plain jit with sharded inputs XLA already distributes
it; these shard_map versions make the collective structure explicit and
guaranteed:

  * rows (local batch shard) stay resident per device,
  * the normalized counterpart embeddings are all-gathered over ICI,
  * each device computes its (b_local × B) logits block,
  * row-wise CE is local; column-wise CE reduces with pmax/psum
    (a distributed logsumexp) — no device ever materializes B×B.

All math in float32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from speech_decoding_tpu.parallel.mesh import DATA_AXIS

Array = jax.Array


def _normalize_rows(v: Array) -> Array:
    v = v.reshape(v.shape[0], -1).astype(jnp.float32)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def clip_loss_sharded(
    x: Array, y: Array, temp: Array, mesh: Mesh, reduction: str = "mean"
) -> Array:
    """Symmetric InfoNCE over a batch sharded on the mesh "data" axis.

    x, y: (B, ...) with B divisible by the data-axis size. Matches
    models.loss.clip_loss numerically (same normalize/logits/CE).
    """
    n_shards = mesh.shape[DATA_AXIS]
    B = x.shape[0]
    assert B % n_shards == 0, (B, n_shards)
    b = B // n_shards

    def local_fn(x_blk: Array, y_blk: Array, temp_s: Array) -> Array:
        idx = jax.lax.axis_index(DATA_AXIS)
        xn = _normalize_rows(x_blk)
        yn = _normalize_rows(y_blk)
        # gather all normalized y rows: (B, D)
        y_full = jax.lax.all_gather(yn, DATA_AXIS, axis=0, tiled=True)
        scale = jnp.exp(temp_s[0])
        logits = jnp.matmul(xn, y_full.T, preferred_element_type=jnp.float32) * scale

        rows = jnp.arange(b)
        my_cols = idx * b + rows  # global column index of each local diagonal
        diag = logits[rows, my_cols]

        # row-direction CE (audio -> brain): full rows are local
        lse_rows = jax.nn.logsumexp(logits, axis=-1)
        row_nll = lse_rows - diag

        # column-direction CE: distributed logsumexp over the row (data) axis
        col_max = jax.lax.pmax(jnp.max(logits, axis=0), DATA_AXIS)  # (B,)
        col_sum = jax.lax.psum(jnp.sum(jnp.exp(logits - col_max[None, :]), axis=0), DATA_AXIS)
        lse_cols = jnp.log(col_sum) + col_max  # (B,) replicated
        col_nll = lse_cols[my_cols] - diag

        total = jax.lax.psum(jnp.sum(row_nll + col_nll), DATA_AXIS)
        if reduction == "mean":
            return total / (2.0 * B)
        return total / 2.0

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
    )
    return fn(x, y, jnp.reshape(temp, (1,)).astype(jnp.float32))


def retrieval_metrics_sharded(
    Z: Array, Y: Array, mesh: Mesh, ks: Sequence[int] = (1, 10), eps: float = 1e-8
) -> Tuple[Array, ...]:
    """Sharded top-k retrieval accuracy: each device scores its local audio
    rows against the all-gathered brain embeddings (reference orientation
    sim[i, j] = cos(Y_i, Z_j) [ref: models.py:226-233]); diagonal ranks reduce
    with psum. Never materializes B×B on one device."""
    n_shards = mesh.shape[DATA_AXIS]
    B = Z.shape[0]
    assert B % n_shards == 0, (B, n_shards)
    b = B // n_shards

    def local_fn(z_blk: Array, y_blk: Array) -> Array:
        idx = jax.lax.axis_index(DATA_AXIS)
        # note: retrieval normalizes with the eps guard on the norm product
        z = z_blk.reshape(b, -1).astype(jnp.float32)
        y = y_blk.reshape(b, -1).astype(jnp.float32)
        z_full = jax.lax.all_gather(z, DATA_AXIS, axis=0, tiled=True)  # (B, D)
        dots = jnp.matmul(y, z_full.T, preferred_element_type=jnp.float32)
        norms = jnp.maximum(
            jnp.outer(
                jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(z_full, axis=-1)
            ),
            eps,
        )
        sim = dots / norms  # (b, B) local audio rows vs all brain cols
        rows = jnp.arange(b)
        my_cols = idx * b + rows
        diag = sim[rows, my_cols]
        rank = jnp.sum(sim > diag[:, None], axis=-1)  # (b,)
        accs = jnp.stack(
            [jax.lax.psum(jnp.sum((rank < k).astype(jnp.float32)), DATA_AXIS) for k in ks]
        )
        return accs / B

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P()
    )
    accs = fn(Z, Y)
    return tuple(accs[i] for i in range(len(ks)))
