"""CLIP-style contrastive loss with a learned temperature.

Re-implements the reference's CLIPLoss / MSELoss
[ref: speech_decoding/utils/loss.py:16-84] as pure JAX functions plus a tiny
flax module holding the learned temperature. The B×B logits matrix is a single
normalized matmul; under jit with a batch-sharded input XLA computes it as a
sharded matmul with all-gathers over the mesh (see
speech_decoding_tpu.parallel.clip_sharded for the explicit shard_map variant).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def clamped_exp(x: Array) -> Array:
    """exp with input clamped to <= 10 [ref: loss.py:8-9]."""
    return jnp.exp(jnp.clip(x, max=10.0))


def clamped_log(x: Array) -> Array:
    """log with input clamped to >= 1e-10 [ref: loss.py:12-13]."""
    return jnp.log(jnp.clip(x, min=1e-10))


def mse_loss(Y: Array, Z: Array) -> Array:
    """MSE summed over (feature, time), averaged over batch [ref: loss.py:24-25]."""
    return jnp.mean(jnp.sum(jnp.square(Y - Z), axis=(-1, -2)))


def _cross_entropy_arange(logits: Array, reduction: str = "mean") -> Array:
    """Cross-entropy against targets arange(B) (the CLIP diagonal)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.diagonal(logp)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


def clip_logits(x: Array, y: Array, temp: Array) -> Array:
    """Flatten, L2-normalize and correlate: logits = x̂ @ ŷᵀ · exp(temp)
    [ref: loss.py:61-71]. x, y: (B, F, T) or (B, D).

    The normalize + matmul run in the inputs' own dtype with f32
    accumulation: under bf16 compute this avoids materializing two f32
    copies of the (B, F·T) embeddings (~400 MB of convert/copy traffic per
    step at B=64); with f32 inputs the math is unchanged (the parity-test
    path)."""
    B = x.shape[0]
    x = x.reshape(B, -1)
    y = y.reshape(B, -1)
    # sum-of-squares accumulates in f32 regardless of input dtype
    xn2 = jnp.einsum("bd,bd->b", x, x, preferred_element_type=jnp.float32)
    yn2 = jnp.einsum("bd,bd->b", y, y, preferred_element_type=jnp.float32)
    x = x / jnp.sqrt(xn2)[:, None].astype(x.dtype)
    y = y / jnp.sqrt(yn2)[:, None].astype(y.dtype)
    logits = jnp.matmul(x, y.T, preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32) * jnp.exp(temp)


def clip_loss(
    x: Array,
    y: Array,
    temp: Array,
    reduction: str = "mean",
    return_logits: bool = False,
):
    """Symmetric InfoNCE: (CE(logits) + CE(logitsᵀ)) / 2 vs arange targets
    [ref: loss.py:79, arXiv 2103.00020]. The reference calls this as
    loss_func(Y, Z), i.e. x = audio embeddings, y = brain embeddings
    [ref: train.py:191]."""
    assert x.shape[0] > 1, "Batch size must be greater than 1."  # [ref: loss.py:40]
    logits = clip_logits(x, y, temp)
    loss = (
        _cross_entropy_arange(logits, reduction)
        + _cross_entropy_arange(logits.T, reduction)
    ) / 2
    if return_logits:
        return logits, loss
    return loss


class CLIPLoss(nn.Module):
    """Holds the learned temperature [ref: loss.py:36] so it is trained jointly
    with the encoder, like the reference's Adam over encoder+loss params
    [ref: train.py:161-163]."""

    init_temperature: float = 5.1
    reduction: str = "mean"

    @nn.compact
    def __call__(
        self, x: Array, y: Array, return_logits: bool = False
    ):
        temp = self.param(
            "temp",
            lambda key, shape: jnp.full(shape, self.init_temperature, jnp.float32),
            (1,),
        )
        return clip_loss(x, y, temp[0], self.reduction, return_logits)
