"""Fused train-mode forward: BrainEncoder.apply(train=True) semantics, with
the five ConvBlocks running as fused Pallas train kernels (custom VJP).

Operates directly on the flax param/batch-stats dicts (same trees as
encoder.apply — checkpoints, goldens and the eval path are untouched), like
the serving path in inference.py. Replicates, in order
[ref: speech_decoding/models.py:169-196]:

  (B, C, T) -> transpose -> SubjectBlock (spatial attention with train-time
  spatial dropout, shared 1x1 conv, per-subject matmul) -> 5x fused ConvBlock
  train kernels (ops/pallas/conv_block_train) -> two 1x1 GELU heads ->
  transpose back — plus the torch-style BN running-stat updates
  (momentum 0.1, unbiased variance) that encoder.apply performs through the
  mutable "batch_stats" collection.

The SubjectBlock (including train-time spatial dropout) runs through
encoder.apply(subject_only=True), so parameters AND the path-folded flax
"dropout" RNG stream are bit-identical to the full flax forward.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from speech_decoding_tpu.ops.pallas.conv_block_train import conv_block_train

Array = jax.Array

_BN_MOMENTUM = 0.1  # TorchBatchNorm defaults (models/brain_encoder.py)
_BN_EPS = 1e-5


def _gelu_head(x: Array, p: Dict, dt) -> Array:
    """1x1 conv + exact GELU, the Conv1d(kernel_size=1) contract."""
    y = jnp.einsum(
        "btc,cf->btf", x.astype(dt), p["kernel"][0].astype(dt),
        preferred_element_type=dt,
    ) + p["bias"].astype(dt)
    return jax.nn.gelu(y, approximate=False)


def _running_update(old: Dict, m: Array, v_biased: Array, n: int) -> Dict:
    """torch BatchNorm1d running-stat update: unbiased batch variance,
    new = (1 - momentum) * old + momentum * batch."""
    unbiased = v_biased * (n / max(n - 1, 1))
    return {
        "mean": (1 - _BN_MOMENTUM) * old["mean"] + _BN_MOMENTUM * m,
        "var": (1 - _BN_MOMENTUM) * old["var"] + _BN_MOMENTUM * unbiased,
    }


def fused_train_forward(
    encoder,
    params: Dict,
    batch_stats: Dict,
    X: Array,
    subject_idxs: Array,
    dropout_key: Array,
    interpret: bool = False,
    axis_name: str = None,
) -> Tuple[Array, Dict]:
    """Returns (Z, new_batch_stats) — the (Z, mutated["batch_stats"]) pair of
    encoder.apply(..., train=True, mutable=["batch_stats"]).

    ``axis_name``: set when called per-shard inside shard_map with the batch
    sharded over that axis — BN statistics synchronize across shards
    (see conv_block_train)."""
    dt = encoder.compute_dtype

    # subject_only routes through the encoder's own module scope: identical
    # params AND the identical flax "dropout" RNG stream (path-folded), so
    # the spatial-dropout draw matches encoder.apply bit-for-bit
    h = encoder.apply(
        {"params": params},
        X,
        subject_idxs,
        True,
        True,
        rngs={"dropout": dropout_key},
    )

    n = h.shape[0] * h.shape[1]
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    new_stats: Dict[str, Any] = {}
    for k in range(5):
        p = params[f"conv{k}"]
        h, (m0, v0, m1, v1) = conv_block_train(
            h,
            p["conv0"]["kernel"], p["conv0"]["bias"],
            p["batchnorm0"]["scale"], p["batchnorm0"]["bias"],
            p["conv1"]["kernel"], p["conv1"]["bias"],
            p["batchnorm1"]["scale"], p["batchnorm1"]["bias"],
            p["conv2"]["kernel"], p["conv2"]["bias"],
            k,
            _BN_EPS,
            interpret,
            axis_name,
        )
        st = batch_stats[f"conv{k}"]
        new_stats[f"conv{k}"] = {
            "batchnorm0": _running_update(st["batchnorm0"], m0, v0, n),
            "batchnorm1": _running_update(st["batchnorm1"], m1, v1, n),
        }

    h = _gelu_head(h, params["conv_final1"], dt)
    h = _gelu_head(h, params["conv_final2"], dt)
    if not encoder.channels_last_io:
        h = jnp.swapaxes(h, -1, -2)
    return h, new_stats


def fused_train_forward_sharded(
    encoder,
    params: Dict,
    batch_stats: Dict,
    X: Array,
    subject_idxs: Array,
    dropout_key: Array,
    mesh,
    interpret: bool = False,
) -> Tuple[Array, Dict]:
    """Data-parallel fused forward: batch sharded over the mesh "data" axis,
    params/stats replicated, BN statistics psummed across shards inside the
    custom VJP (synchronized BN — numerically the single-device op on the
    global batch, like the XLA path under GSPMD). Z comes back sharded; the
    new batch stats replicated."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from speech_decoding_tpu.parallel.mesh import DATA_AXIS

    x_spec = P(DATA_AXIS, None, None)

    def local(params, batch_stats, X, subject_idxs, dropout_key):
        return fused_train_forward(
            encoder, params, batch_stats, X, subject_idxs, dropout_key,
            interpret=interpret, axis_name=DATA_AXIS,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), x_spec, P(DATA_AXIS), P()),
        out_specs=(x_spec, P()),
        check_vma=False,
    )
    return fn(params, batch_stats, X, subject_idxs, dropout_key)
