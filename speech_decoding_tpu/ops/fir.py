"""Zero-phase FIR band-pass filtering as batched XLA ops.

Replaces ``mne.filter.filter_data`` in the reference's brain preprocessing
[ref: dataclass/brennan2018.py:263-265, dataclass/gwilliams2022.py:253-255].
The reference runs it per-recording on CPU worker processes; here the taps are
designed host-side once (numpy/scipy) and the filtering is one batched FFT
convolution on device over (subjects/recordings × channels × time).

Design follows MNE's defaults (fir_design='firwin', fir_window='hamming',
phase='zero', filter_length='auto', transition bandwidths 'auto'):

  * l_trans = min(max(0.25 * l_freq, 2 Hz), l_freq)
  * h_trans = min(max(0.25 * h_freq, 2 Hz), nyquist - h_freq)
  * total length = 3.3 * sfreq / min(l_trans, h_trans), forced odd
  * band-pass taps = centered lowpass(h_freq + h_trans/2, len 3.3*sfreq/h_trans)
                   - centered lowpass(l_freq - l_trans/2, len 3.3*sfreq/l_trans)
    with scipy.signal.firwin (hamming, DC-normalized), i.e. each edge gets its
    own transition-matched length — the MNE 'firwin' construction.
  * zero-phase: odd-symmetric taps applied centered (group delay compensated),
    with MNE's 'reflect_limited' (odd-reflection) edge padding.

Exact tap-level parity with MNE can be asserted when MNE is installed
(tests/test_ops.py has a skipif-gated golden test); in this environment the
frequency-response contract is tested instead.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

Array = jax.Array

_HAMMING_LENGTH_FACTOR = 3.3  # MNE's length factor for the hamming window


def _odd(n: int) -> int:
    return n + 1 - (n % 2)


def _centered_lowpass(cutoff_hz: float, n_taps: int, total_len: int, sfreq: float) -> np.ndarray:
    h = scipy.signal.firwin(
        n_taps, cutoff_hz, window="hamming", pass_zero=True, fs=sfreq
    )
    out = np.zeros(total_len)
    offset = (total_len - n_taps) // 2
    out[offset : offset + n_taps] = h
    return out


def design_bandpass_fir(
    sfreq: float, l_freq: Optional[float], h_freq: Optional[float]
) -> np.ndarray:
    """MNE-default band-pass (or low/high-pass if one edge is None) FIR taps."""
    nyq = sfreq / 2.0
    l_trans = h_trans = None
    if l_freq is not None:
        l_trans = min(max(0.25 * l_freq, 2.0), l_freq)
    if h_freq is not None:
        h_trans = min(max(0.25 * h_freq, 2.0), nyq - h_freq)

    trans = [t for t in (l_trans, h_trans) if t is not None]
    assert trans, "at least one of l_freq/h_freq required"
    N = _odd(int(round(_HAMMING_LENGTH_FACTOR * sfreq / min(trans))))

    if h_freq is not None:
        n_h = _odd(int(round(_HAMMING_LENGTH_FACTOR * sfreq / h_trans)))
        lp_h = _centered_lowpass(h_freq + h_trans / 2.0, min(n_h, N), N, sfreq)
    else:
        lp_h = np.zeros(N)
        lp_h[N // 2] = 1.0  # all-pass
    if l_freq is not None:
        n_l = _odd(int(round(_HAMMING_LENGTH_FACTOR * sfreq / l_trans)))
        lp_l = _centered_lowpass(l_freq - l_trans / 2.0, min(n_l, N), N, sfreq)
    else:
        lp_l = np.zeros(N)
    return (lp_h - lp_l).astype(np.float64)


def reflect_limited_pad(x: Array, n_pad: int) -> Array:
    """MNE 'reflect_limited' padding: odd reflection about the edge sample
    (2*edge - x reversed), applied on the last axis. Pads beyond one full
    reflection (n_pad > T-1) are ZERO-extended, exactly like MNE's
    ``_smart_pad`` — silently truncating instead would return a
    shorter-than-requested array and desynchronize callers that slice by the
    requested pad."""
    T = x.shape[-1]
    m = min(n_pad, T - 1)
    left = 2 * x[..., :1] - x[..., m:0:-1]
    right = 2 * x[..., -1:] - x[..., -2 : -m - 2 : -1]
    parts = [left, x, right]
    if n_pad > m:
        z = jnp.zeros(x.shape[:-1] + (n_pad - m,), x.dtype)
        parts = [z, *parts, z]
    return jnp.concatenate(parts, axis=-1)


@partial(jax.jit, static_argnames=("pad",))
def fir_filter_zero_phase(x: Array, taps: Array, pad: bool = True) -> Array:
    """Apply odd-length symmetric FIR taps zero-phase via FFT convolution.

    x: (..., T); taps: (N,) with N odd. Batched over all leading axes —
    an entire (subjects, channels, T) stack filters in one XLA op.
    """
    x = x.astype(jnp.float32)
    taps = taps.astype(jnp.float32)
    N = taps.shape[-1]
    assert N % 2 == 1, "zero-phase application requires odd-length taps"
    T = x.shape[-1]
    # full N-1 edge pad like MNE (zero-extended beyond one reflection for
    # T <= N-1): the FFT convolution then never wraps into the signal
    n_edge = N - 1 if pad else 0
    if pad:
        x = reflect_limited_pad(x, n_edge)
    Tp = x.shape[-1]
    # linear convolution length, rounded up to a power of two for the FFT
    conv_len = Tp + N - 1
    fft_len = 1 << max(conv_len - 1, 1).bit_length()
    X = jnp.fft.rfft(x, n=fft_len)
    H = jnp.fft.rfft(taps, n=fft_len)
    y = jnp.fft.irfft(X * H, n=fft_len)[..., :conv_len]
    # compensate the (N-1)/2 group delay, then strip the padding
    start = (N - 1) // 2 + n_edge
    return jax.lax.dynamic_slice_in_dim(y, start, T, axis=-1)


def bandpass_filter(
    x: Array, sfreq: float, l_freq: Optional[float], h_freq: Optional[float]
) -> Array:
    """Design + apply in one call (the mne.filter.filter_data equivalent)."""
    taps = jnp.asarray(design_bandpass_fir(sfreq, l_freq, h_freq))
    return fir_filter_zero_phase(x, taps)
