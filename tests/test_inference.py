"""Serving API: checkpoint restore -> encode -> retrieve round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_decoding_tpu.data.layout import ch_locations_2d
from speech_decoding_tpu.inference import SpeechDecoder
from speech_decoding_tpu.models import BrainEncoder
from speech_decoding_tpu.training import create_train_state
from speech_decoding_tpu.training.checkpoint import CheckpointManager

B, C, T, F = 4, 208, 30, 16


def test_decoder_roundtrip(tmp_path, rng):
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=16, F=F, K=4)
    X = rng.normal(size=(B, C, T)).astype(np.float32)
    state = create_train_state(
        enc, jax.random.PRNGKey(0), jnp.asarray(X), jnp.zeros((B,), jnp.int32)
    )
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, state)
    mgr.wait()

    dec = SpeechDecoder.from_checkpoint(str(tmp_path / "ck"), enc, X)
    Z = dec.encode(X, np.zeros(B, np.int32))
    assert Z.shape == (B, F, T)

    # random bank: retrieve must match an explicit numpy cosine top-k
    bank = rng.normal(size=(10, F, T)).astype(np.float32)
    dec.set_bank(jnp.asarray(bank))
    scores, ids = dec.decode(X, np.zeros(B, np.int32), k=3)
    assert scores.shape == (B, 3) and ids.shape == (B, 3)
    zf = np.asarray(Z).reshape(B, -1)
    zf = zf / np.linalg.norm(zf, axis=-1, keepdims=True)
    bf = bank.reshape(10, -1)
    bf = bf / np.linalg.norm(bf, axis=-1, keepdims=True)
    sim = zf @ bf.T
    np.testing.assert_array_equal(ids[:, 0], sim.argmax(-1))
    np.testing.assert_allclose(scores[:, 0], sim.max(-1), atol=1e-5)
    # self-bank: the top score is an exact self-match (cosine 1)
    dec.set_bank(Z)
    s2, _ = dec.decode(X, np.zeros(B, np.int32), k=1)
    np.testing.assert_allclose(s2[:, 0], 1.0, atol=1e-5)

    # restored params equal the saved ones
    p_saved = jax.tree.leaves(state.params["encoder"])
    p_restored = jax.tree.leaves(dec._variables["params"])
    for a, b in zip(p_saved, p_restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_channels_last_retrieval_matches_reference_orientation(rng):
    """A channels-last encoder emits (B, T, F) but the bank keeps the
    reference (N, F, T) layout: set_bank must align flatten orders, or the
    cosine compares differently-permuted vectors (F=16 != T=30 makes any
    mix-up change the ranking)."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    kw = dict(num_subjects=2, loc=loc, D1=16, D2=16, F=F, K=4)
    enc_cl = BrainEncoder(channels_last_io=True, **kw)
    enc_ref = BrainEncoder(channels_last_io=False, **kw)
    X = rng.normal(size=(B, C, T)).astype(np.float32)
    state = create_train_state(
        enc_ref, jax.random.PRNGKey(0), jnp.asarray(X), jnp.zeros((B,), jnp.int32)
    )
    bank = rng.normal(size=(10, F, T)).astype(np.float32)

    dec_ref = SpeechDecoder(
        enc_ref, state.params["encoder"], state.batch_stats,
        bank=jnp.asarray(bank), use_fused_blocks=False,
    )
    dec_cl = SpeechDecoder(
        enc_cl, state.params["encoder"], state.batch_stats,
        bank=jnp.asarray(bank), use_fused_blocks=False,
    )
    # same trained params, same bank -> identical rankings and scores, even
    # though encode emits transposed layouts
    s_ref, i_ref = dec_ref.decode(X, np.zeros(B, np.int32), k=3)
    Xcl = np.swapaxes(X, -1, -2)  # channels-last public input is (B, T, C)
    s_cl, i_cl = dec_cl.decode(Xcl, np.zeros(B, np.int32), k=3)
    np.testing.assert_array_equal(i_cl, i_ref)
    np.testing.assert_allclose(s_cl, s_ref, atol=1e-5)


def test_fused_serving_path_matches_flax(tmp_path, rng):
    """SpeechDecoder with the fused Pallas ConvBlocks (interpret on CPU) ==
    the plain flax encode."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=16, F=F, K=4)
    X = rng.normal(size=(B, C, T)).astype(np.float32)
    state = create_train_state(
        enc, jax.random.PRNGKey(0), jnp.asarray(X), jnp.zeros((B,), jnp.int32)
    )
    dec_flax = SpeechDecoder(
        enc, state.params["encoder"], state.batch_stats, use_fused_blocks=False
    )
    dec_fused = SpeechDecoder(
        enc, state.params["encoder"], state.batch_stats, use_fused_blocks=True
    )
    Z1 = np.asarray(dec_flax.encode(X, np.zeros(B, np.int32)))
    Z2 = np.asarray(dec_fused.encode(X, np.zeros(B, np.int32)))
    np.testing.assert_allclose(Z2, Z1, rtol=1e-4, atol=1e-5)
