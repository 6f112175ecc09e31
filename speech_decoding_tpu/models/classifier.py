"""Segment-retrieval evaluation (top-1 / top-10 accuracy).

Replaces the reference Classifier's O(B²) Python cosine loop
[ref: speech_decoding/models.py:199-248] with one normalized matmul — on TPU
the B×B similarity matrix for a full test set is a single (sharded) MXU
matmul. Accuracies are computed rank-based: the rank of the diagonal entry in
its row equals the reference's argmax / topk-membership tests (up to ties,
which have measure zero for continuous embeddings).

The reference transposes the similarity matrix before scoring
[ref: models.py:233], so rows of the scored matrix index *audio* segments and
columns index brain embeddings; we build that orientation directly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def cosine_similarity_matrix(Z: Array, Y: Array, eps: float = 1e-8) -> Array:
    """sim[i, j] = cos(Y_i, Z_j) — the reference's transposed orientation
    [ref: models.py:226-233], with the same eps guard on the norm product."""
    B = Z.shape[0]
    # stay in the inputs' dtype; all dot products accumulate in f32 (avoids
    # f32 copies of the (B, F·T) embeddings under bf16 compute)
    z = Z.reshape(B, -1)
    y = Y.reshape(B, -1)
    dots = jnp.matmul(y, z.T, preferred_element_type=jnp.float32)
    zn = jnp.sqrt(jnp.einsum("bd,bd->b", z, z, preferred_element_type=jnp.float32))
    yn = jnp.sqrt(jnp.einsum("bd,bd->b", y, y, preferred_element_type=jnp.float32))
    norms = jnp.maximum(jnp.outer(yn, zn), eps)
    return dots.astype(jnp.float32) / norms


def retrieval_accuracy_from_similarity(
    similarity: Array, ks: Sequence[int] = (1, 10)
) -> Tuple[Array, ...]:
    """Top-k accuracies of the diagonal within each row, via diagonal rank
    (number of strictly larger entries) [ref: models.py:236-243]."""
    diag = jnp.diagonal(similarity)
    rank = jnp.sum(similarity > diag[:, None], axis=-1)
    return tuple(jnp.mean((rank < k).astype(jnp.float32)) for k in ks)


def retrieval_metrics(
    Z: Array, Y: Array, ks: Sequence[int] = (1, 10)
) -> Tuple[Array, ...]:
    """Top-k retrieval accuracies for brain embeddings Z vs audio embeddings Y
    (both (B, F, T)). Equivalent to the reference's Classifier.forward
    [ref: models.py:209-248] but one matmul instead of a B² Python loop."""
    return retrieval_accuracy_from_similarity(cosine_similarity_matrix(Z, Y), ks)


class Classifier:
    """API-parity shim for the reference's Classifier
    [ref: models.py:199-248]: ``Classifier(args)(Z, Y)`` -> (top1, top10)
    floats. ``test=`` is accepted (the reference only uses it for a progress
    bar). On TPU backends the Pallas streaming-rank kernel is used, so the
    full-test-set similarity matrix is never materialized."""

    def __init__(self, args=None):
        self.factor = 1  # kept for parity [ref: models.py:206]

    def __call__(self, Z: Array, Y: Array, test: bool = False):
        import jax

        if jax.default_backend() == "tpu":
            from speech_decoding_tpu.ops.pallas.retrieval import (
                retrieval_metrics_pallas,
            )

            top1, top10 = retrieval_metrics_pallas(Z, Y, ks=(1, 10))
        else:
            top1, top10 = retrieval_metrics(Z, Y, ks=(1, 10))
        return float(top1), float(top10)
