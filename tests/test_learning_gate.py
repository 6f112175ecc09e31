"""Learning-dynamics acceptance gate (VERDICT r3 item 5).

The parity goldens prove every component matches the reference numerically,
but none of them proves the assembled system *learns*: a sign flip in the
CLIP loss, a broken optimizer update, or a train/eval batch-stat mixup could
pass all per-step goldens while destroying end-to-end training. This test
plants recoverable brain->audio structure in a fixed synthetic world —
Y[b, :, t] = tanh(A @ X[b, :, t]) for a frozen A, the same world
tools/scale_run.py validated at flagship width on a real chip (round-3 run:
held-out top-10 0.44-0.47 vs 0.156 chance) — trains the REAL Trainer loop
for a few epochs, and asserts the held-out top-10 retrieval curve clears a
margin over chance. It fails if any future change breaks learning, not just
parity. [ref behavior: /root/reference/train.py:166-259 epoch loop with
testTop10acc tracking]

Marked slow: ~2-4 min on the 8-device CPU mesh (120 optimizer steps at
B=16). The fast tier still covers step mechanics (tests/test_train.py
overfits a fixed batch); this gate is about *generalization*.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_decoding_tpu.config import load_config
from speech_decoding_tpu.data.layout import ch_locations_2d
from speech_decoding_tpu.models import BrainEncoder
from speech_decoding_tpu.training.trainer import Trainer

B, C, T, F, S = 16, 208, 60, 64, 4
# enough train segments that clearing the gate requires GENERALIZING the
# planted map — at 128 segments the encoder memorizes (trainTop10 1.0,
# testTop10 ~chance); at 512 memorization stops paying
N_TRAIN, N_TEST = 512, 64
CHANCE = 10.0 / N_TEST  # top-10 of a uniform ranking over the test set


def _make_world():
    """Fixed random linear-map world: X ~ N(0,1), Y = tanh(A X) per sample.

    The map is subject-independent (subject_idxs still cycle so the
    SubjectBlock path is exercised) and time-pointwise, so an encoder that
    learns it must use the spatial mixing path, not memorize segments."""
    kx, ka = jax.random.PRNGKey(11), jax.random.PRNGKey(12)
    X = np.asarray(jax.random.normal(kx, (N_TRAIN + N_TEST, C, T)), np.float32)
    A = np.asarray(jax.random.normal(ka, (F, C)), np.float32) / np.sqrt(C)
    Y = np.tanh(np.einsum("fc,nct->nft", A, X)).astype(np.float32)
    sidx = (np.arange(N_TRAIN + N_TEST) % S).astype(np.int32)
    return X, Y, sidx


def _batch(X, Y, sidx, ids):
    return {"X": X[ids], "Y": Y[ids], "subject_idxs": sidx[ids]}


@pytest.mark.slow
def test_trainer_learns_heldout_retrieval():
    X, Y, sidx = _make_world()
    test_ids = np.arange(N_TRAIN, N_TRAIN + N_TEST)
    test_batch = _batch(X, Y, sidx, test_ids)

    cfg = load_config()
    cfg.set_path("tpu.compute_dtype", "float32")
    cfg.seed = 0
    cfg.lr = 1e-3
    epochs, updates = 3, 40

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=S, loc=loc, D1=32, D2=48, F=F, K=4)
    trainer = Trainer(enc, cfg, _batch(X, Y, sidx, np.arange(B)))

    ep_rng = np.random.default_rng(1)
    for ep in range(epochs):
        # unique-within-batch like the production sampler (duplicate segments
        # would corrupt the CLIP diagonal objective)
        batches = (
            _batch(X, Y, sidx, ep_rng.choice(N_TRAIN, B, replace=False))
            for _ in range(updates)
        )
        trainer.run_epoch(ep, batches, test_batch)

    hist = trainer.history
    top10 = [h["testTop10acc"] for h in hist]
    losses = [h["train_loss"] for h in hist]
    # the gate: held-out retrieval must clear 2x chance by the last epoch
    assert top10[-1] >= 2.0 * CHANCE, (
        f"end-to-end learning broken: held-out top10 {top10} never cleared "
        f"2x chance ({2.0 * CHANCE:.3f}); train_loss {losses}"
    )
    # and training must actually reduce the loss (guards a dead optimizer
    # combined with a luckily-above-chance init)
    assert losses[-1] < losses[0] * 0.9, f"train loss flat: {losses}"
