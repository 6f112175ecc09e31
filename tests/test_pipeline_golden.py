"""FULL-PIPELINE golden: raw Brennan2018 files -> the EXECUTED reference
dataset build vs ours, on an identical synthetic raw tree.

This runs /root/reference's ``Brennan2018Dataset.__init__`` end-to-end —
audio concat -> 16 kHz resample -> wav2vec last-4 average (10-chunk) ->
2.4x upsample, EEG .mat load -> subject exclusion -> trim -> band-pass ->
resample-to-embedding-length, 150 ms shift, robust scale + clamp,
segmentation, per-segment baseline correction
[ref: speech_decoding/dataclass/brennan2018.py:28-301] — and asserts the
final X segment tensors, Y embeddings, srate and segment geometry match our
pipeline's output on the SAME raw files.

Dependency substitutions (and what they mean for the evidence):
  * ``load_wav2vec_model`` is patched to a tiny random HF *torch*
    Wav2Vec2Model on both sides (no network); our pipeline consumes the SAME
    weights through ``params_from_torch``, so the Y comparison exercises the
    real torch-vs-flax wav2vec2 forward *inside* the pipeline, including the
    executed reference ``getW2VLastFourLayersAvg`` chunking code.
  * ``torchaudio.load``/``functional.resample`` and ``mne.filter.*`` are
    faked with THIS repo's DSP ops, so DSP sample values are shared by
    construction — their independent evidence is the from-spec firwin twin
    (1e-12 tap parity) and frozen goldens in tests/test_ops.py. What this
    test adds on top is everything AROUND the DSP at pipeline fidelity:
    natsort/concat semantics, the embedding-length-driven resample factor
    [ref: brennan2018.py:269-270], subject exclusion and trim-to-shortest,
    our fused batched filter+resample (preprocess_batch) vs the reference's
    per-subject exact chain, shift/trim arithmetic, sklearn RobustScaler
    (executed) vs our jnp twin, clamp, split and baseline correction.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "speech_decoding")),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _force_module(name: str, **attrs) -> types.ModuleType:
    """Get-or-create sys.modules[name] and force-set the given attributes
    (other test files may have installed partial fakes already)."""
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _Tqdm:
    """Iterable with the two methods the reference uses."""

    def __init__(self, it=None, **kw):
        self._it = it

    def __iter__(self):
        return iter(self._it)

    def set_description(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def ref_brennan():
    """Import the reference Brennan2018Dataset with its unavailable deps
    backed by this repo's own implementations (see module docstring)."""
    from speech_decoding_tpu.ops.fir import bandpass_filter
    from speech_decoding_tpu.ops.resample import fft_resample, sinc_resample
    from speech_decoding_tpu.utils.natsort import natsorted
    from speech_decoding_tpu.utils.wavio import load_wav

    def fake_ta_load(path):
        wave, sr = load_wav(path)
        return torch.from_numpy(wave), sr

    def fake_ta_resample(waveform, orig_freq, new_freq, lowpass_filter_width=6):
        out = sinc_resample(
            jnp.asarray(waveform.numpy()),
            int(orig_freq),
            int(new_freq),
            lowpass_filter_width=lowpass_filter_width,
        )
        return torch.from_numpy(np.array(out))

    def fake_filter_data(x, sfreq, l_freq, h_freq, **kw):
        return np.asarray(bandpass_filter(jnp.asarray(x), float(sfreq), l_freq, h_freq))

    def fake_resample(x, up=1.0, down=1.0, axis=-1, **kw):
        assert axis in (-1, x.ndim - 1)
        return np.asarray(fft_resample(jnp.asarray(x), up=float(up), down=float(down)))

    _force_module("termcolor", cprint=lambda *a, **k: None)
    _force_module("tqdm", tqdm=_Tqdm)
    _force_module("natsort", natsorted=natsorted)
    ta_func = _force_module("torchaudio.functional", resample=fake_ta_resample)
    _force_module("torchaudio", load=fake_ta_load, functional=ta_func)
    mne_filter = _force_module(
        "mne.filter", filter_data=fake_filter_data, resample=fake_resample
    )
    _force_module("mne", set_log_level=lambda **k: None, filter=mne_filter)
    _force_module("mne_bids")

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib

    mod = importlib.import_module("speech_decoding.dataclass.brennan2018")
    return mod


def _tiny_w2v_pair():
    """One set of random wav2vec2 weights in both frameworks: an HF torch
    model (consumed by the executed reference code) and our flax port of the
    SAME state_dict. Real total stride 320 so rates land near 120 Hz."""
    from speech_decoding_tpu.models.wav2vec2 import Wav2Vec2Config, params_from_torch
    from speech_decoding_tpu.models.wav2vec_util import FrozenWav2Vec2

    cfg = Wav2Vec2Config(
        conv_dim=(16, 16, 16),
        conv_stride=(10, 8, 4),
        conv_kernel=(10, 8, 4),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=list(cfg.conv_dim),
        conv_stride=list(cfg.conv_stride),
        conv_kernel=list(cfg.conv_kernel),
        conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        hidden_act="gelu",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(7)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()
    variables = params_from_torch(hf.state_dict(), cfg)
    return hf, FrozenWav2Vec2(cfg, variables)


class _NS(types.SimpleNamespace):
    pass


def _ref_args(root):
    return _NS(
        root_dir=str(root),
        wav2vec_model="<patched>",
        rebuild_dataset=False,
        preprocs=_NS(
            seq_len_sec=3.0,
            baseline_len_sec=0.5,
            clamp=True,
            clamp_lim=20,
            brain_filter_low=1.0,
            brain_filter_high=60.0,
            last4layers=True,
            subject_wise=True,
        ),
    )


@pytest.fixture(scope="module")
def built(tmp_path_factory, ref_brennan):
    """Build ONE synthetic raw tree and run both full pipelines on it."""
    from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset
    from speech_decoding_tpu.data.synthetic import make_brennan_tree, make_config

    root = tmp_path_factory.mktemp("pipeline_golden")
    make_brennan_tree(str(root), n_subjects_present=3, eeg_secs=30.0, audio_secs=30.0)
    os.makedirs(os.path.join(root, "data", "Brennan2018", "Y_embeds"), exist_ok=True)

    hf, frozen = _tiny_w2v_pair()

    # ours ---------------------------------------------------------------
    # brennan_legacy_split replicates the executed reference's torch.split
    # chunk-size segmentation (see the flag's comment in data/brennan2018.py)
    cfg = make_config(str(root), "Brennan2018")
    cfg.preprocs["shift_len"] = 150
    cfg.preprocs["brennan_legacy_split"] = True
    ours = Brennan2018Dataset(cfg, wav2vec=frozen)

    # executed reference --------------------------------------------------
    # (torch>=2.6 defaults weights_only=True; the reference predates that
    # and caches a dict holding a numpy scalar [ref: brennan2018.py:57-58])
    ref_brennan.load_wav2vec_model = lambda name: hf
    orig_load = torch.load

    def _legacy_load(*a, **k):
        k.setdefault("weights_only", False)
        return orig_load(*a, **k)

    torch.load = _legacy_load
    try:
        ref = ref_brennan.Brennan2018Dataset(_ref_args(root))
    finally:
        torch.load = orig_load
    return ours, ref, str(root)


def test_segment_geometry_matches(built):
    """The reference's ``X.split(num_segments)`` uses torch.split, whose int
    argument is a CHUNK SIZE — so the executed reference yields seq_len_samp
    segments of num_segments samples each, not num_segments seq_len windows
    [ref: brennan2018.py:89-104]. Our brennan_legacy_split mode matches it."""
    ours, ref, root = built
    assert len(ref) == ours.num_segments
    assert ref.X[0].shape[-1] == ours.segment_len
    assert ref.seq_len_samp == ours.seq_len_samp
    assert ref.baseline_len_samp == ours.baseline_len_samp
    assert ref.num_subjects == ours.num_subjects
    # srate is persisted in the reference's X cache [ref: brennan2018.py:57-64]
    ref_srate = float(
        torch.load(
            os.path.join(root, "data", "Brennan2018", "processed_X.pt"),
            weights_only=False,
        )["srate"]
    )
    np.testing.assert_allclose(ref_srate, ours.srate, rtol=1e-9)


def test_audio_embeddings_match(built):
    """Y: wav load/concat -> sinc 16k -> EXECUTED getW2VLastFourLayersAvg on
    torch vs our batched flax chunks -> 2.4x upsample, then shift+trim."""
    ours, ref, _ = built
    ref_y = np.concatenate([y.numpy() for y in ref.Y], axis=-1)
    np.testing.assert_allclose(ref_y, ours.Y, rtol=2e-3, atol=2e-3)


def test_processed_eeg_segments_match(built):
    """X: the reference's eager per-segment baseline-corrected list vs our
    lazy native gather, after the full preproc/scale chain."""
    ours, ref, _ = built
    S = ours.num_subjects
    for i in range(ours.num_segments):
        got_x, _ = ours.get_segments(
            np.full(S, i, np.int64), np.arange(S, dtype=np.int64)
        )
        ref_x = ref.X[i].numpy()
        np.testing.assert_allclose(ref_x, got_x, rtol=2e-3, atol=2e-3)


def test_getitem_contract_matches(built):
    """Reference __getitem__ returns (X_seg[subj], Y_seg, subj, chunk_id);
    our sample_batch returns the same tensors for the same draws."""
    ours, ref, _ = built
    np.random.seed(0)
    x, y, subj, chunk = ref[2]
    batch = ours.sample_batch(
        np.random.default_rng(0),
        np.array([2]),
        choices=np.array([int(subj)]),
    )
    np.testing.assert_allclose(x.numpy(), batch["X"][0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(y.numpy(), batch["Y"][0], rtol=2e-3, atol=2e-3)
