"""Train state: encoder params + learned temperature + BN stats + optimizer.

The reference optimizes ``encoder.parameters() + loss.parameters()`` with one
Adam [ref: train.py:161-163]; here the CLIP temperature lives in the same
params pytree under "clip" so a single optax.adam covers both. Gradient
accumulation (Brennan steps once per epoch [ref: train.py:205-209]) is an
optax.MultiSteps wrapper — implemented *correctly* (mean of all batch grads),
unlike the reference which silently backprops only the last batch.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def make_optimizer(
    lr: float, accumulate_steps: int = 1
) -> optax.GradientTransformation:
    """Adam with torch-default hyperparameters (b1=0.9, b2=0.999, eps=1e-8)
    [ref: train.py:161]. ``accumulate_steps > 1`` wraps in MultiSteps for the
    Brennan one-step-per-epoch semantics."""
    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def create_train_state(
    encoder,
    key: Array,
    sample_X: Array,
    sample_subject_idxs: Array,
    init_temperature: float = 5.1,
    lr: float = 3e-4,
    accumulate_steps: int = 1,
) -> TrainState:
    """Initialize encoder params, CLIP temperature, BN stats and Adam state."""
    pkey, dkey = jax.random.split(key)
    # jit the init: one compiled program instead of eager per-op dispatch
    # (matters on remote/tunneled devices)
    variables = jax.jit(
        lambda k1, k2, X, s: encoder.init(
            {"params": k1, "dropout": k2}, X, s, train=False
        )
    )(pkey, dkey, sample_X, sample_subject_idxs)
    params = {
        "encoder": variables["params"],
        "clip": {"temp": jnp.full((1,), init_temperature, jnp.float32)},
    }
    tx = make_optimizer(lr, accumulate_steps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )
