"""Jitted train / eval steps.

One fused XLA program per step: (optional) Gwilliams on-the-fly collate
(baseline + robust scale + clamp [ref: gwilliams2022.py:653-661]), encoder
forward with spatial dropout, CLIP loss [ref: train.py:189-203], Adam update,
and retrieval metrics [ref: train.py:194]. Loss is called as loss(Y, Z) —
x = audio, y = brain — exactly like the reference [ref: train.py:191].

Batches are dicts of device arrays; under a sharded-input jit the same step
runs data-parallel over the mesh with XLA-inserted collectives (BN stats and
the B×B CLIP logits reduce globally).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from speech_decoding_tpu.models.classifier import (
    retrieval_accuracy_from_similarity,
    retrieval_metrics,
)
from speech_decoding_tpu.models.loss import clip_loss
from speech_decoding_tpu.ops.scaling import apply_scale_stats, gwilliams_collate
from speech_decoding_tpu.training.state import TrainState

Array = jax.Array
Batch = Dict[str, Array]  # X (B, C, T), Y (B, F, T), subject_idxs (B,)


def _maybe_collate(batch: Batch, collate: Optional[Dict]) -> Array:
    X = batch["X"]
    if collate is None:
        return X
    if collate.get("precomputed") and "scale_stats" in batch:
        # per-segment median/IQR were computed at dataset build; the collate
        # is pure elementwise (no per-step quantile sort)
        return apply_scale_stats(
            X,
            batch["scale_stats"],
            collate["clamp_lim"],
            collate["clamp"],
            channels_last=bool(collate.get("channels_last", False)),
        )
    return gwilliams_collate(
        X,
        baseline_len_samp=collate["baseline_len_samp"],
        clamp_lim=collate["clamp_lim"],
        do_clamp=collate["clamp"],
    )


def _build_train_step(
    encoder,
    reduction: str = "mean",
    collate: Optional[Dict] = None,
    fused_blocks: bool = False,
    fused_mesh=None,
) -> Callable[[TrainState, Batch, Array], Tuple[TrainState, Dict[str, Array]]]:
    """The un-jitted single train step (shared by the jitted single-step and
    the lax.scan multi-step wrappers). ``fused_blocks`` routes the ConvBlock
    stack through the fused Pallas train kernels (custom VJP) instead of the
    flax/XLA path — same math, same param/stat trees (models/fused_train).
    On a >1-device mesh pass ``fused_mesh``: the fused forward runs under
    shard_map with synchronized (psummed) BN statistics."""

    def loss_fn(params, batch_stats, batch, dropout_key):
        X = _maybe_collate(batch, collate)
        if fused_blocks:
            from speech_decoding_tpu.models.fused_train import (
                fused_train_forward,
                fused_train_forward_sharded,
            )

            interp = jax.default_backend() != "tpu"
            if fused_mesh is not None:
                Z, new_stats = fused_train_forward_sharded(
                    encoder, params["encoder"], batch_stats, X,
                    batch["subject_idxs"], dropout_key, fused_mesh,
                    interpret=interp,
                )
            else:
                Z, new_stats = fused_train_forward(
                    encoder, params["encoder"], batch_stats, X,
                    batch["subject_idxs"], dropout_key,
                    interpret=interp,
                )
        else:
            Z, mutated = encoder.apply(
                {"params": params["encoder"], "batch_stats": batch_stats},
                X,
                batch["subject_idxs"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_key},
            )
            new_stats = mutated["batch_stats"]
        logits, loss = clip_loss(
            batch["Y"], Z, params["clip"]["temp"][0], reduction, return_logits=True
        )
        return loss, (logits, new_stats)

    def train_step(state: TrainState, batch: Batch, base_key: Array):
        # derive the per-step dropout key in-graph (no per-step host RNG ops;
        # deterministic given the base key and the step counter)
        dropout_key = jax.random.fold_in(base_key, state.step)
        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, dropout_key
        )
        state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        # retrieval metrics reuse the loss logits: logits[i,j] = Ŷ_i·Ẑ_j·e^temp
        # is the cosine similarity matrix in the reference's orientation
        # [ref: models.py:226-233] up to the positive e^temp factor, and
        # diagonal-rank accuracies are scale-invariant — no second pass over
        # the (B, F·T) embeddings
        top1, top10 = retrieval_accuracy_from_similarity(
            jax.lax.stop_gradient(logits), ks=(1, 10)
        )
        metrics = {
            "loss": loss,
            "top1": top1,
            "top10": top10,
            "temp": state.params["clip"]["temp"][0],
        }
        return state, metrics

    return train_step


def make_train_step(
    encoder,
    reduction: str = "mean",
    collate: Optional[Dict] = None,
    donate: bool = True,
    fused_blocks: bool = False,
    fused_mesh=None,
) -> Callable[[TrainState, Batch, Array], Tuple[TrainState, Dict[str, Array]]]:
    """Build the jitted train step for a given encoder/config."""
    train_step = _build_train_step(
        encoder, reduction, collate, fused_blocks, fused_mesh
    )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_train_step_scan(
    encoder,
    reduction: str = "mean",
    collate: Optional[Dict] = None,
    donate: bool = True,
    fused_blocks: bool = False,
    fused_mesh=None,
) -> Callable[[TrainState, Batch, Array], Tuple[TrainState, Dict[str, Array]]]:
    """Multi-step train: one dispatch runs ``k`` optimizer steps via lax.scan
    over a stacked batch (leading axis k on every array). Amortizes dispatch
    latency (critical on remote/tunneled devices, still a win locally) while
    keeping semantics identical to k calls of the single step. Returns
    (state, metrics-with-leading-k-axis)."""
    single = _build_train_step(
        encoder, reduction, collate, fused_blocks, fused_mesh
    )

    def train_steps(state: TrainState, batches: Batch, base_key: Array):
        def body(st, batch):
            st, metrics = single(st, batch, base_key)
            return st, metrics

        return jax.lax.scan(body, state, batches)

    return jax.jit(train_steps, donate_argnums=(0,) if donate else ())


def make_train_forward_step(
    encoder,
    reduction: str = "mean",
    collate: Optional[Dict] = None,
) -> Callable[[TrainState, Batch, Array], Tuple[TrainState, Dict[str, Array]]]:
    """Train-mode forward WITHOUT a parameter update: BN batch stats are used
    and running stats updated, spatial dropout active, metrics computed —
    exactly what the reference's non-final Brennan batches effectively do
    (grads of all but the last batch are discarded [ref: train.py:205-209]).
    Used only by the legacy-accumulation compatibility mode."""

    def forward_step(state: TrainState, batch: Batch, base_key: Array):
        dropout_key = jax.random.fold_in(base_key, state.step)
        X = _maybe_collate(batch, collate)
        Z, mutated = encoder.apply(
            {"params": state.params["encoder"], "batch_stats": state.batch_stats},
            X,
            batch["subject_idxs"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        logits, loss = clip_loss(
            batch["Y"], Z, state.params["clip"]["temp"][0], reduction,
            return_logits=True,
        )
        top1, top10 = retrieval_accuracy_from_similarity(logits, ks=(1, 10))
        state = state.replace(batch_stats=mutated["batch_stats"])
        metrics = {
            "loss": loss,
            "top1": top1,
            "top10": top10,
            "temp": state.params["clip"]["temp"][0],
        }
        return state, metrics

    return jax.jit(forward_step)


def make_chunked_eval(
    encoder,
    reduction: str = "mean",
    collate: Optional[Dict] = None,
    chunk_size: int = 256,
    use_pallas_retrieval: bool = False,
):
    """Full-test-set eval with bounded memory: the encoder forward runs in
    fixed-size chunks (activations for a few hundred segments instead of the
    whole test set [ref: train.py:225 notes 0.96GB for one full-batch
    forward]), embeddings accumulate in the compute dtype, then ONE jitted
    loss+retrieval pass over the flattened embeddings. Exactly equals
    make_eval_step up to the embedding-storage dtype."""

    def fwd_chunk(state: TrainState, batch: Batch):
        X = _maybe_collate(batch, collate)
        return encoder.apply(
            {"params": state.params["encoder"], "batch_stats": state.batch_stats},
            X,
            batch["subject_idxs"],
            train=False,
        )

    fwd = jax.jit(fwd_chunk)

    def score(Z, Y, temp):
        loss = clip_loss(Y, Z, temp, reduction)
        if use_pallas_retrieval:
            from speech_decoding_tpu.ops.pallas.retrieval import (
                retrieval_metrics_pallas,
            )

            top1, top10 = retrieval_metrics_pallas(
                Z, Y, ks=(1, 10), interpret=jax.default_backend() != "tpu"
            )
        else:
            top1, top10 = retrieval_metrics(Z, Y, ks=(1, 10))
        return {"loss": loss, "top1": top1, "top10": top10}

    score = jax.jit(score)

    def evaluate(state: TrainState, batch: Batch):
        B = batch["X"].shape[0]
        chunks = []
        for start in range(0, B, chunk_size):
            end = min(start + chunk_size, B)
            idx = slice(start, end)
            sub = {k: v[idx] for k, v in batch.items()}
            if end - start < chunk_size:  # pad the tail chunk to a fixed shape
                pad = chunk_size - (end - start)
                sub = {
                    k: jnp.concatenate([jnp.asarray(v)] + [jnp.asarray(v[-1:])] * pad)
                    for k, v in sub.items()
                }
            Z = fwd(state, sub)[: end - start]
            chunks.append(Z)
        Z = jnp.concatenate(chunks)
        return score(Z, jnp.asarray(batch["Y"]), state.params["clip"]["temp"][0])

    return evaluate


def make_eval_step(
    encoder,
    reduction: str = "mean",
    collate: Optional[Dict] = None,
    use_pallas_retrieval: bool = False,
) -> Callable[[TrainState, Batch], Dict[str, Array]]:
    """Full-batch eval: forward (no dropout, running BN stats), loss, retrieval
    [ref: train.py:211-233]. With use_pallas_retrieval the full-test-set
    similarity never materializes (ops/pallas/retrieval.py)."""

    def eval_step(state: TrainState, batch: Batch):
        X = _maybe_collate(batch, collate)
        Z = encoder.apply(
            {"params": state.params["encoder"], "batch_stats": state.batch_stats},
            X,
            batch["subject_idxs"],
            train=False,
        )
        loss = clip_loss(batch["Y"], Z, state.params["clip"]["temp"][0], reduction)
        if use_pallas_retrieval:
            from speech_decoding_tpu.ops.pallas.retrieval import retrieval_metrics_pallas

            top1, top10 = retrieval_metrics_pallas(
                Z, batch["Y"], ks=(1, 10), interpret=jax.default_backend() != "tpu"
            )
        else:
            top1, top10 = retrieval_metrics(Z, batch["Y"], ks=(1, 10))
        return {"loss": loss, "top1": top1, "top10": top10}

    return jax.jit(eval_step)
