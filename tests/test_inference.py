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


def test_bank_from_audio_matches_manual_embed_chain(rng):
    """bank_from_audio == sinc-free manual chain (last4 mean -> FFT resample
    to brain rate -> crop/pad), including across batch_size chunking (the
    wav2vec forward is per-sample independent)."""
    from speech_decoding_tpu.inference import bank_from_audio
    from speech_decoding_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
    from speech_decoding_tpu.models.wav2vec_util import FrozenWav2Vec2
    from speech_decoding_tpu.ops.resample import fft_resample

    cfg = Wav2Vec2Config.tiny()
    model = Wav2Vec2Model(cfg)
    L = 1600  # 0.1 s at 16 kHz -> 79 frames (790 Hz) -> 12 samples at 120 Hz
    wav = (rng.normal(size=(3, L)) * 0.1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(wav[:1]))
    w2v = FrozenWav2Vec2(cfg, variables)

    emb = np.swapaxes(np.asarray(w2v.last4_mean(jnp.asarray(wav))), -1, -2)
    rate_after = 16000 * emb.shape[-1] / L
    man = np.asarray(fft_resample(jnp.asarray(emb), up=120.0 / rate_after))
    assert man.shape[-1] == 12

    # crop branch (batch_size=2 forces a 2+1 chunk split)
    bank = bank_from_audio(w2v, wav, 16000, segment_len=10, batch_size=2)
    assert bank.shape == (3, cfg.hidden_size, 10)
    np.testing.assert_allclose(bank, man[..., :10], rtol=1e-5, atol=1e-6)
    # pad branch
    bank15 = bank_from_audio(w2v, wav, 16000, segment_len=15, batch_size=2)
    np.testing.assert_allclose(bank15[..., :12], man, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(bank15[..., 12:], 0.0)


def test_bank_from_audio_resamples_source_rate(rng):
    """A non-16k source rate goes through the windowed-sinc resampler first
    [ref: dataclass/gwilliams2022.py:344-351]."""
    from speech_decoding_tpu.inference import bank_from_audio
    from speech_decoding_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
    from speech_decoding_tpu.models.wav2vec_util import FrozenWav2Vec2
    from speech_decoding_tpu.ops.resample import sinc_resample

    cfg = Wav2Vec2Config.tiny()
    model = Wav2Vec2Model(cfg)
    wav = (rng.normal(size=(2, 800)) * 0.1).astype(np.float32)  # 0.1 s at 8 kHz
    w16 = np.asarray(sinc_resample(jnp.asarray(wav), 8000, 16000))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(w16[:1]))
    w2v = FrozenWav2Vec2(cfg, variables)

    a = bank_from_audio(w2v, wav, 8000, segment_len=10)
    b = bank_from_audio(w2v, w16, 16000, segment_len=10)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_decode_stream_self_retrieval(rng):
    """Sliding-window decoding: each window of a continuous recording
    retrieves its own bank entry top-1 (cosine 1), onsets are correct, and
    the zero-padded final partial batch is trimmed.

    The encoder is briefly TRAINED on the windows first: a freshly
    initialized encoder maps every input to nearly one embedding direction
    (pairwise cosines ~1-4e-7), so untrained self-retrieval would be decided
    by float noise between batch compositions."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=16, F=F, K=4)
    X_cont = rng.normal(size=(C, 100)).astype(np.float32)
    seg, hop = T, 10
    exp_onsets = np.arange(0, 100 - seg + 1, hop)  # 8 windows
    windows = np.stack([X_cont[:, o : o + seg] for o in exp_onsets])
    nw = len(exp_onsets)

    from speech_decoding_tpu.training import make_train_step

    state = create_train_state(
        enc, jax.random.PRNGKey(0), jnp.asarray(windows), jnp.zeros((nw,), jnp.int32)
    )
    batch = {
        "X": jnp.asarray(windows),
        "Y": jax.random.normal(jax.random.PRNGKey(2), (nw, F, seg)),
        "subject_idxs": jnp.zeros((nw,), jnp.int32),
    }
    train_step = make_train_step(enc, donate=False)
    for i in range(40):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
    assert float(metrics["top1"]) == 1.0  # embeddings are now discriminative

    dec = SpeechDecoder(
        enc, state.params["encoder"], state.batch_stats, use_fused_blocks=False
    )
    bank = dec.encode(windows, np.zeros(nw, np.int32))  # (W, F, T)
    dec.set_bank(bank)

    # batch_size=3 -> final batch has 2 real + 1 padded window
    scores, ids, onsets = dec.decode_stream(
        X_cont, 0, seg, hop=hop, k=3, batch_size=3
    )
    np.testing.assert_array_equal(onsets, exp_onsets)
    assert scores.shape == (len(exp_onsets), 3) and ids.shape == scores.shape
    np.testing.assert_array_equal(ids[:, 0], np.arange(len(exp_onsets)))
    np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-5)

    # channels-last encoder on the transposed stream: identical rankings
    enc_cl = BrainEncoder(
        num_subjects=2, loc=loc, D1=16, D2=16, F=F, K=4, channels_last_io=True
    )
    dec_cl = SpeechDecoder(
        enc_cl, state.params["encoder"], state.batch_stats, use_fused_blocks=False
    )
    dec_cl.set_bank(bank)  # (W, F, T) reference layout, auto-transposed
    s_cl, i_cl, o_cl = dec_cl.decode_stream(
        X_cont.T, 0, seg, hop=hop, k=3, batch_size=3
    )
    np.testing.assert_array_equal(o_cl, exp_onsets)
    np.testing.assert_array_equal(i_cl, ids)
    np.testing.assert_allclose(s_cl, scores, atol=1e-5)


def test_set_bank_rejects_channels_last_self_bank(rng):
    """set_bank must fail loudly on an (N, T, F) array — e.g. a channels-last
    encode() output passed directly — instead of silently mis-ranking."""
    import pytest

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(
        num_subjects=2, loc=loc, D1=16, D2=16, F=F, K=4, channels_last_io=True
    )
    X = rng.normal(size=(B, T, C)).astype(np.float32)
    state = create_train_state(
        enc, jax.random.PRNGKey(0), jnp.asarray(X), jnp.zeros((B,), jnp.int32)
    )
    dec = SpeechDecoder(
        enc, state.params["encoder"], state.batch_stats, use_fused_blocks=False
    )
    Z = dec.encode(X, np.zeros(B, np.int32))  # (B, T, F) channels-last
    assert Z.shape == (B, T, F)
    with pytest.raises(ValueError, match="swapaxes"):
        dec.set_bank(Z)
    dec.set_bank(jnp.swapaxes(Z, -1, -2))  # documented fix works
    s, _ = dec.decode(X, np.zeros(B, np.int32), k=1)
    np.testing.assert_allclose(s[:, 0], 1.0, atol=1e-5)


def test_retrieve_topk_clamps_k_to_bank_size(rng):
    """k > N candidate segments: clamp to N instead of a low-level lax.top_k
    shape error (small serving banks hit the k=10 default immediately)."""
    from speech_decoding_tpu.inference import retrieve_topk

    Z = jnp.asarray(rng.normal(size=(3, F, T)), jnp.float32)
    bank = rng.normal(size=(4, F * T)).astype(np.float32)
    bank_norm = bank / np.linalg.norm(bank, axis=-1, keepdims=True)
    scores, ids = retrieve_topk(Z, jnp.asarray(bank_norm), k=10)
    assert scores.shape == (3, 4) and ids.shape == (3, 4)


def test_bank_from_audio_features_path(rng):
    """last4layers=False mirrors the training flag: the conv
    feature-extractor path (F=conv_dim[-1]) instead of the hidden mean
    [ref: brennan2018.py:187-189]."""
    from speech_decoding_tpu.inference import bank_from_audio
    from speech_decoding_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
    from speech_decoding_tpu.models.wav2vec_util import FrozenWav2Vec2

    cfg = Wav2Vec2Config.tiny()
    model = Wav2Vec2Model(cfg)
    wav = (rng.normal(size=(2, 1600)) * 0.1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(wav[:1]))
    w2v = FrozenWav2Vec2(cfg, variables)

    bank = bank_from_audio(w2v, wav, 16000, segment_len=10, last4layers=False)
    assert bank.shape == (2, cfg.conv_dim[-1], 10)
    feats = np.swapaxes(np.asarray(w2v.features(jnp.asarray(wav))), -1, -2)
    from speech_decoding_tpu.ops.resample import fft_resample

    rate_after = 16000 * feats.shape[-1] / 1600
    man = np.asarray(fft_resample(jnp.asarray(feats), up=120.0 / rate_after))
    np.testing.assert_allclose(bank, man[..., :10], rtol=1e-5, atol=1e-6)


def test_set_bank_rejects_feature_dim_mismatch(rng):
    """A bank whose feature dim differs from the encoder's F (e.g. built
    with the wrong last4layers flag) fails loudly at set_bank, not with a
    cryptic matmul shape error at decode time."""
    import pytest

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=16, F=F, K=4)
    X = rng.normal(size=(B, C, T)).astype(np.float32)
    state = create_train_state(
        enc, jax.random.PRNGKey(0), jnp.asarray(X), jnp.zeros((B,), jnp.int32)
    )
    dec = SpeechDecoder(
        enc, state.params["encoder"], state.batch_stats, use_fused_blocks=False
    )
    with pytest.raises(ValueError, match="feature dim"):
        dec.set_bank(jnp.asarray(rng.normal(size=(5, F * 2, T)), jnp.float32))


def test_int8_bank_matches_f32_ranking(rng):
    """set_bank(store_dtype="int8"): per-row symmetric quantization + the
    int8 x int8 -> int32 similarity must reproduce f32 top-1 exactly and
    top-10 up to quantization noise on a realistic (correlated) bank."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=16, F=F, K=4)
    X = rng.normal(size=(8, C, T)).astype(np.float32)
    state = create_train_state(
        enc, jax.random.PRNGKey(0), jnp.asarray(X), jnp.zeros((8,), jnp.int32)
    )
    dec = SpeechDecoder(enc, state.params["encoder"], state.batch_stats)
    # synthetic well-separated embeddings: queries + noisy distractors (a
    # random-init encoder collapses real embeddings into near-ties, which
    # would make the ranking comparison pure noise)
    Z = rng.normal(size=(8, F, T)).astype(np.float32)
    distract = Z[:, None] + 0.3 * rng.normal(size=(8, 7, F, T)).astype(np.float32)
    bank = np.concatenate([Z, distract.reshape(-1, F, T)])

    dec.set_bank(jnp.asarray(bank))
    s32, i32 = map(np.asarray, dec.retrieve(jnp.asarray(Z), k=10))
    np.testing.assert_array_equal(i32[:, 0], np.arange(8))  # self-match
    dec.set_bank(jnp.asarray(bank), store_dtype="int8")
    assert dec._bank_q.dtype == jnp.int8
    s8, i8 = map(np.asarray, dec.retrieve(jnp.asarray(Z), k=10))

    np.testing.assert_array_equal(i8[:, 0], i32[:, 0])  # self-match survives
    np.testing.assert_allclose(s8, s32, atol=2e-2)  # ~1/127 per-element noise
    overlap = np.mean(
        [len(set(a.tolist()) & set(b.tolist())) for a, b in zip(i8, i32)]
    )
    assert overlap >= 9.0, overlap  # >=90% top-10 agreement

    # decode_stream accepts an int8 bank too
    rec = rng.normal(size=(C, T * 6)).astype(np.float32)
    scores, ids, onsets = dec.decode_stream(rec, 0, segment_len=T, k=3)
    assert scores.shape == (6, 3) and onsets.shape == (6,)


def test_int8_retrieval_no_int32_overflow():
    """Flat-magnitude unit-norm rows at flagship D = F*T = 369k saturate the
    int8 grid on every element, so one unchunked int8 dot would reach
    D * 127^2 ~ 5.9e9 > 2^31 and wrap negative — the true best match would
    drop out of the top-k entirely. The chunked accumulation must keep the
    self-match on top with score ~1."""
    from speech_decoding_tpu.inference import quantize_rows_int8, retrieve_topk_int8

    D = 1024 * 360
    # rows of +-1/sqrt(D): unit-norm, max|row| == mean|row| (crest factor 1)
    signs = np.where(
        np.random.default_rng(3).random((4, D)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    bank = signs / np.sqrt(D)
    bank_q, scale = quantize_rows_int8(jnp.asarray(bank))
    # every element saturates to +-127: the worst case for the accumulator
    assert int(jnp.max(jnp.abs(bank_q.astype(jnp.int32)))) == 127
    Z = bank.reshape(4, 1024, 360)
    s, ids = map(np.asarray, retrieve_topk_int8(jnp.asarray(Z), bank_q, scale, k=2))
    np.testing.assert_array_equal(ids[:, 0], np.arange(4))
    np.testing.assert_allclose(s[:, 0], 1.0, atol=1e-2)
    assert np.all(s[:, 0] > s[:, 1])


def test_retrieve_topk_int8_matches_integer_reference():
    """The bf16-compute contraction over int8-stored operands must reproduce
    brute-force int64 integer math: bf16 products of int8-ranged values are
    exact and the f32 accumulation only rounds at the last bits. Checked at
    a small D (sums < 2^24: the dot itself is f32-exact) and at a larger
    ragged D; rtol covers the f32 scale-multiply/summation's ~1e-7 against
    the float64 numpy reference — the RANKING must match exactly."""
    from speech_decoding_tpu.inference import quantize_rows_int8, retrieve_topk_int8

    rng = np.random.default_rng(7)
    for D in (96, 5003):
        bank = rng.normal(size=(6, D)).astype(np.float32)
        bank /= np.linalg.norm(bank, axis=1, keepdims=True)
        bank_q, scale = quantize_rows_int8(jnp.asarray(bank))

        Z = rng.normal(size=(3, D)).astype(np.float32).reshape(3, 1, D)
        s, ids = map(
            np.asarray,
            retrieve_topk_int8(jnp.asarray(Z), bank_q, scale, k=6),
        )
        # brute-force integer reference for the same quantized operands
        z = Z.reshape(3, D) / np.linalg.norm(Z.reshape(3, D), axis=1, keepdims=True)
        zs = np.abs(z).max(axis=1, keepdims=True) / 127.0
        zq = np.round(z / zs).astype(np.int64)
        sim = (zq @ np.asarray(bank_q, np.int64).T) * zs * np.asarray(scale)[None, :]
        order = np.argsort(-sim, axis=1)
        np.testing.assert_array_equal(ids, order)
        np.testing.assert_allclose(s, np.take_along_axis(sim, order, 1),
                                   rtol=1e-6, atol=1e-7)
