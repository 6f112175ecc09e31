"""Frozen wav2vec2 embedding helpers.

Re-implements the reference's wav2vec_util
[ref: speech_decoding/utils/wav2vec_util.py:8-32]: load the (frozen) model and
produce per-frame embeddings as the average of the last four hidden layers,
computed chunk-by-chunk over 10 splits of the waveform — including the
reference's known chunk-boundary artifact, reproduced for parity
[ref: wav2vec_util.py:23-24 FIXME].
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from speech_decoding_tpu.models.wav2vec2 import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    extract_features,
    params_from_torch,
)
from speech_decoding_tpu.utils.logging import cprint

Array = jax.Array


class FrozenWav2Vec2:
    """Bundles module + params with jitted embedding entry points."""

    def __init__(self, cfg: Wav2Vec2Config, variables):
        self.cfg = cfg
        self.module = Wav2Vec2Model(cfg)
        self.variables = variables
        self._hidden_fn = jax.jit(
            lambda v, x: self.module.apply(v, x, output_hidden_states=True)
        )
        self._features_fn = jax.jit(lambda v, x: extract_features(v, cfg, x))

    def last4_mean(self, waveform: Array) -> Array:
        """(B, T) -> (B, T', hidden): mean of the last 4 hidden layers
        [ref: wav2vec_util.py:17-20]."""
        _, hidden = self._hidden_fn(self.variables, waveform)
        return jnp.mean(jnp.stack(hidden[-4:]), axis=0)

    def features(self, waveform: Array) -> Array:
        """(B, T) -> (B, T', 512) conv feature-extractor path."""
        return self._features_fn(self.variables, waveform)


def load_wav2vec_model(
    name_or_path: str = "facebook/wav2vec2-large-xlsr-53",
) -> FrozenWav2Vec2:
    """Load pretrained weights into the flax model [ref: wav2vec_util.py:8-11].

    Torch-free path: a ``.safetensors`` file (or a directory containing
    ``model.safetensors``) loads directly via
    ``models.wav2vec2_safetensors`` — no torch/transformers at deploy time.
    Otherwise falls back to the HF ``transformers`` port from the local cache
    or a local directory; this environment has no network egress, so a
    missing checkpoint raises with instructions rather than downloading."""
    import os

    st_path = None
    if name_or_path.endswith(".safetensors") and os.path.exists(name_or_path):
        st_path = name_or_path
    elif os.path.isdir(name_or_path) and os.path.exists(
        os.path.join(name_or_path, "model.safetensors")
    ):
        st_path = os.path.join(name_or_path, "model.safetensors")
    if st_path is not None:
        from speech_decoding_tpu.models.wav2vec2_safetensors import (
            load_safetensors_params,
        )

        cprint(f"Loading wav2vec2 weights from {st_path} (torch-free)", "cyan")
        variables, cfg = load_safetensors_params(st_path)
        variables = jax.tree.map(jnp.asarray, variables)
        return FrozenWav2Vec2(cfg, variables)
    try:
        import transformers

        cprint("Loading HuggingFace Wav2Vec2.0 weights", "cyan")
        hf = transformers.Wav2Vec2Model.from_pretrained(name_or_path)
    except Exception as e:
        raise RuntimeError(
            f"Could not load wav2vec2 weights for {name_or_path!r} "
            f"(offline environment?): {e}. Provide a local checkpoint "
            "directory via config wav2vec_model=<path>."
        ) from e
    hc = hf.config
    cfg = Wav2Vec2Config(
        conv_dim=tuple(hc.conv_dim),
        conv_stride=tuple(hc.conv_stride),
        conv_kernel=tuple(hc.conv_kernel),
        conv_bias=hc.conv_bias,
        feat_extract_norm=hc.feat_extract_norm,
        hidden_size=hc.hidden_size,
        num_hidden_layers=hc.num_hidden_layers,
        num_attention_heads=hc.num_attention_heads,
        intermediate_size=hc.intermediate_size,
        num_conv_pos_embeddings=hc.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hc.num_conv_pos_embedding_groups,
        do_stable_layer_norm=hc.do_stable_layer_norm,
        layer_norm_eps=hc.layer_norm_eps,
    )
    variables = params_from_torch(hf.state_dict(), cfg)
    variables = jax.tree.map(jnp.asarray, variables)
    return FrozenWav2Vec2(cfg, variables)


def embed_waveform(
    wav2vec: FrozenWav2Vec2, waveform: np.ndarray, last4layers: bool = True
) -> np.ndarray:
    """(T,) mono waveform -> (F, T_emb) embeddings.

    last4layers: split the waveform into 10 chunks, embed each, average the
    last four hidden layers, concatenate along time — reproducing the
    reference's chunking (and its boundary artifact)
    [ref: wav2vec_util.py:14-32]. Otherwise the conv feature-extractor path
    (F=512) [ref: brennan2018.py:187-189]."""
    assert wav2vec is not None, "a FrozenWav2Vec2 (or compatible) is required"
    waveform = np.asarray(waveform, np.float32).reshape(-1)
    if not last4layers:
        out = wav2vec.features(jnp.asarray(waveform)[None])  # (1, T', 512)
        return np.asarray(out)[0].T
    # np.array_split yields at most TWO distinct chunk lengths (q+1 x r then
    # q x (10-r)), so the reference's 10 sequential forwards batch into <= 2
    # exact forwards (each output row is an independent per-sample compute;
    # chunk boundaries — and the boundary artifact — are unchanged)
    bounds = np.array_split(np.arange(waveform.shape[-1]), 10)
    sizes = [len(b) for b in bounds]
    outs: list = [None] * len(bounds)
    for size in sorted(set(sizes), reverse=True):
        idxs = [i for i, s in enumerate(sizes) if s == size]
        batch = jnp.asarray(
            np.stack([waveform[bounds[i][0] : bounds[i][-1] + 1] for i in idxs])
        )
        emb = np.asarray(wav2vec.last4_mean(batch))  # (b, T', F)
        for j, i in enumerate(idxs):
            outs[i] = emb[j]
    return np.concatenate(outs, axis=0).T  # (F, T_emb)
