"""Reproducibility helpers.

JAX is deterministic by construction (explicit PRNG keys), so unlike the
reference there is no CUBLAS/torch toggling [ref: train.py:33-43,
speech_decoding/utils/reproducibility.py:5-8]. We still seed numpy for
host-side shuffles (e.g. the sentence-split permutation) and hand out a root
jax.random key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int = 0) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
