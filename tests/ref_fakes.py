"""Shared shims for executing /root/reference's pipeline code in this image.

The reference's unavailable dependencies are faked; the DSP fakes are backed
by THIS repo's ops (shared-by-construction — the independent evidence for the
DSP values is the from-spec firwin twin and frozen goldens in tests/test_ops.py),
so the full-pipeline goldens prove everything AROUND the DSP matches the
executed reference. See tests/test_pipeline_golden*.py for what each golden
covers.
"""

import contextlib
import json
import os
import sys
import types

import numpy as np

import jax.numpy as jnp

REFERENCE = "/root/reference"


FAKE_NAMES = (
    "termcolor", "tqdm", "natsort", "torchaudio.functional", "torchaudio",
    "mne.filter", "mne", "mne_bids", "omegaconf",
)


def snapshot_fakes():
    """Current sys.modules entries for every name the fakes may touch; pass
    to restore_fakes at module teardown so fakes never leak into other test
    files (e.g. a functional fake mne_bids would flip default_source)."""
    return {n: sys.modules.get(n) for n in FAKE_NAMES}


def restore_fakes(snap) -> None:
    for n, mod in snap.items():
        if mod is None:
            sys.modules.pop(n, None)
        else:
            sys.modules[n] = mod


def force_module(name: str, **attrs) -> types.ModuleType:
    """Get-or-create sys.modules[name] and force-set the given attributes
    (other test files may have installed partial fakes already)."""
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class FakeTqdm:
    """Iterable with the methods the reference uses."""

    def __init__(self, it=None, **kw):
        self._it = it

    def __iter__(self):
        return iter(self._it)

    def set_description(self, *a, **k):
        pass


class AttrDict(dict):
    """dict with attribute access — stands in for OmegaConf's DictConfig in
    the reference's ``args.preprocs`` usage (indexing, .update, attr-set)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


@contextlib.contextmanager
def fake_open_dict(cfg):
    yield cfg


@contextlib.contextmanager
def legacy_torch_load():
    """torch>=2.6 defaults weights_only=True; the reference predates that and
    pickles numpy objects into its caches."""
    import torch

    orig = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return orig(*a, **k)

    torch.load = _load
    try:
        yield
    finally:
        torch.load = orig


def install_reference_fakes() -> None:
    """Install termcolor/tqdm/natsort/torchaudio/mne/omegaconf fakes and put
    the reference checkout on sys.path. torchaudio + mne.filter are backed by
    this repo's DSP ops (see module docstring)."""
    import torch

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

    force_module("termcolor", cprint=lambda *a, **k: None)
    force_module("tqdm", tqdm=FakeTqdm)
    force_module("natsort", natsorted=natsorted)
    ta_func = force_module("torchaudio.functional", resample=fake_ta_resample)
    force_module("torchaudio", load=fake_ta_load, functional=ta_func)
    mne_filter = force_module(
        "mne.filter", filter_data=fake_filter_data, resample=fake_resample
    )
    force_module("mne", set_log_level=lambda **k: None, filter=mne_filter)
    force_module("omegaconf", open_dict=fake_open_dict)
    if "mne_bids" not in sys.modules:
        force_module("mne_bids")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def install_fake_mne_bids() -> None:
    """A fake mne_bids that reads this repo's synthetic array-BIDS Gwilliams
    tree (data/synthetic.py make_gwilliams_tree): raw (224, T) .npy @1000 Hz
    + annotations.json, exposed through the two accessors the reference uses
    — raw.to_data_frame() with 'MEG nnn' columns and
    raw.annotations.to_data_frame() with Timestamp onsets and dict-string
    descriptions [ref: speech_decoding/dataclass/gwilliams2022.py:207-230]."""
    import pandas as pd

    class _Ann:
        def __init__(self, onsets, descs):
            self._onsets = np.asarray(onsets, np.float64)
            self._descs = descs

        def to_data_frame(self):
            return pd.DataFrame(
                {
                    "onset": pd.to_datetime(self._onsets, unit="s"),
                    "description": [repr(d) for d in self._descs],
                }
            )

    class _Raw:
        def __init__(self, meg, ann):
            self._meg = np.asarray(meg, np.float64)
            self.annotations = _Ann(ann["onset"], ann["description"])

        def to_data_frame(self):
            data = {"time": np.arange(self._meg.shape[1])}
            for i in range(self._meg.shape[0]):
                data[f"MEG {i + 1:03d}"] = self._meg[i]
            return pd.DataFrame(data)

    class BIDSPath:
        def __init__(self, subject=None, session=None, task=None, datatype=None, root=None):
            self.subject, self.session, self.task = subject, session, task
            self.root = root

    def read_raw_bids(bids_path):
        sub = int(bids_path.subject)
        ses = int(bids_path.session)
        task = int(bids_path.task)
        stem = f"sub-{sub:02d}_ses-{ses}_task-{task}"
        rec_dir = os.path.join(str(bids_path.root), f"sub-{sub:02d}", f"ses-{ses}", "meg")
        meg_path = os.path.join(rec_dir, f"{stem}_meg.npy")
        if not os.path.exists(meg_path):
            raise FileNotFoundError(meg_path)
        meg = np.load(meg_path)
        with open(os.path.join(rec_dir, f"{stem}_annotations.json")) as f:
            ann = json.load(f)
        return _Raw(meg, ann)

    force_module("mne_bids", BIDSPath=BIDSPath, read_raw_bids=read_raw_bids)


class SerialPool:
    """Drop-in for multiprocessing.Pool running jobs in-process (jax is not
    fork-safe once initialized; the reference's Pool(20) mechanics are not
    what the goldens prove)."""

    def __init__(self, processes=None):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def imap(self, fn, iterable):
        for item in iterable:
            yield fn(item)


def tiny_w2v_pair(seed: int = 7):
    """One set of random wav2vec2 weights in both frameworks: an HF torch
    model (consumed by the executed reference code) and our flax port of the
    SAME state_dict. Real total stride 320 so derived rates land near the
    real model's."""
    import torch
    import transformers

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
    torch.manual_seed(seed)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()
    variables = params_from_torch(hf.state_dict(), cfg)
    return hf, FrozenWav2Vec2(cfg, variables)
