"""Resampling as XLA ops: MNE-style FFT resampling for brain signals and
embeddings, and torchaudio-style windowed-sinc polyphase resampling for audio.

Replaces:
  * ``mne.filter.resample`` — EEG/MEG down-sampling to 120 Hz and embedding
    up-sampling [ref: dataclass/brennan2018.py:197-201,267-272,
    dataclass/gwilliams2022.py:258-260,369-373];
  * ``torchaudio.functional.resample(…, lowpass_filter_width=128)`` — audio to
    16 kHz before wav2vec2 [ref: dataclass/brennan2018.py:171-172,
    dataclass/gwilliams2022.py:349-354].

``fft_resample`` follows MNE's method='fft' algorithm: odd-reflection
('reflect_limited') padding to the next power of two, spectral
truncation/extension with scipy.signal.resample's Nyquist-bin handling
(boxcar window = no spectral weighting, MNE's default), then cropping
round(ratio * pad) from each side.

``sinc_resample`` follows torchaudio's sinc_interp_hann kernel construction
(gcd-reduced polyphase, hann^2-windowed sinc, rolloff 0.99) applied as one
strided conv — MXU-friendly and exact to the algorithm.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_decoding_tpu.ops.fir import reflect_limited_pad

Array = jax.Array


# ---------------------------------------------------------------------------
# MNE-style FFT resample
# ---------------------------------------------------------------------------


def _auto_pad(n: int) -> Tuple[int, int]:
    """MNE npad='auto': pad to the next power of two past n + min(n//8, 100)."""
    min_add = min(n // 8, 100)
    total = 1 << max(n + min_add - 1, 1).bit_length()
    npad = total - n
    return npad // 2, npad - npad // 2


def _spectral_resize(X: Array, n_in: int, n_out: int) -> Array:
    """scipy.signal.resample spectrum copy (full complex FFT convention)."""
    N = min(n_in, n_out)
    nyq = N // 2 + 1
    shape = X.shape[:-1] + (n_out,)
    Y = jnp.zeros(shape, X.dtype)
    Y = Y.at[..., :nyq].set(X[..., :nyq])
    if N > 2:
        neg = N - nyq
        Y = Y.at[..., n_out - neg :].set(X[..., n_in - neg :])
    if N % 2 == 0:
        half = N // 2
        if n_out < n_in:  # downsampling: fold the two source bins
            Y = Y.at[..., half].multiply(2.0)
        elif n_out > n_in:  # upsampling: split the source Nyquist bin
            Y = Y.at[..., half].multiply(0.5)
            Y = Y.at[..., n_out - half].set(Y[..., half])
    return Y


@partial(jax.jit, static_argnames=("up", "down"))
def _fft_resample_jit(x: Array, up: float, down: float) -> Array:
    n = x.shape[-1]
    ratio = float(up) / float(down)
    n_out = int(round(ratio * n))
    pad_l, pad_r = _auto_pad(n)
    # odd-reflection padding on both sides (MNE pad='reflect_limited');
    # reflect_limited_pad pads symmetrically, trim to the exact l/r split
    extra = max(pad_l, pad_r)
    big = reflect_limited_pad(x.astype(jnp.float32), extra)
    big = big[..., extra - pad_l : big.shape[-1] - (extra - pad_r)]
    n_big = big.shape[-1]
    n_big_out = int(round(ratio * n_big))

    X = jnp.fft.fft(big.astype(jnp.complex64))
    Y = _spectral_resize(X, n_big, n_big_out)
    y = jnp.fft.ifft(Y).real * (n_big_out / n_big)

    to_l = int(round(ratio * pad_l))
    y = y[..., to_l : to_l + n_out]
    return y.astype(jnp.float32)


def fft_resample(x: Array, up: float = 1.0, down: float = 1.0) -> Array:
    """MNE-equivalent FFT resampling along the last axis. Output length =
    round(len * up / down). Batched over leading axes."""
    if float(up) == float(down):
        return jnp.asarray(x, jnp.float32)
    return _fft_resample_jit(jnp.asarray(x), float(up), float(down))


# ---------------------------------------------------------------------------
# torchaudio-style windowed-sinc polyphase resample
# ---------------------------------------------------------------------------


def _sinc_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int, rolloff: float
) -> Tuple[np.ndarray, int]:
    """torchaudio _get_sinc_resample_kernel (sinc_interp_hann): returns
    (kernel (new_g, taps), width) with freqs reduced by their gcd."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx[None, :]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window
    kernel *= base_freq / orig_freq
    return kernel.astype(np.float32), width


@partial(jax.jit, static_argnames=("orig_freq", "new_freq", "lowpass_filter_width", "rolloff"))
def sinc_resample(
    x: Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Array:
    """Windowed-sinc resampling along the last axis (torchaudio
    sinc_interp_hann algorithm). x: (..., T) -> (..., ceil(T * new / orig))."""
    if orig_freq == new_freq:
        return jnp.asarray(x, jnp.float32)
    g = math.gcd(int(orig_freq), int(new_freq))
    of, nf = int(orig_freq) // g, int(new_freq) // g
    kernel, width = _sinc_kernel(of, nf, lowpass_filter_width, rolloff)

    lead = x.shape[:-1]
    T = x.shape[-1]
    target_len = int(math.ceil(nf * T / of))
    xx = x.reshape((-1, T, 1)).astype(jnp.float32)  # (N, T, 1)
    xx = jnp.pad(xx, ((0, 0), (width, width + of), (0, 0)))
    # one strided conv produces all nf polyphase outputs as channels
    w = jnp.asarray(kernel.T)[:, None, :]  # (taps, 1, nf)
    y = jax.lax.conv_general_dilated(
        xx,
        w,
        window_strides=(of,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )  # (N, frames, nf)
    y = y.reshape(y.shape[0], -1)[:, :target_len]
    return y.reshape(lead + (target_len,))
