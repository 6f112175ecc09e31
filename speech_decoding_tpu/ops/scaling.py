"""Robust scaling, clamping and baseline correction as batched XLA ops.

The reference does these on CPU with sklearn's RobustScaler — per-subject over
the whole recording for Brennan [ref: dataclass/brennan2018.py:109-134] and
per-segment inside the DataLoader collator for Gwilliams
[ref: dataclass/gwilliams2022.py:653-661, utils/preproc_utils.py:93-142].
Here they are pure jnp functions that run inside the jitted train step (the
"collator" becomes device compute), vectorized over all batch/channel axes at
once.

Parity notes: sklearn RobustScaler defaults = centering on the median, scaling
by the (25, 75) IQR with linear-interpolation quantiles, and zero IQRs replaced
by 1 (sklearn _handle_zeros_in_scale). jnp.percentile uses the same linear
interpolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def robust_scale(x: Array, axis: int = -1, eps_zero: float = 1e-12) -> Array:
    """(x - median) / IQR along ``axis`` (sklearn RobustScaler semantics).

    For Brennan, axis=-1 over the full time axis per (subject, channel)
    [ref: brennan2018.py:117-120]; for Gwilliams, per (segment, channel) over
    the 360-sample window [ref: preproc_utils.py:97-99].
    """
    x = x.astype(jnp.float32)
    q25, q50, q75 = jnp.percentile(x, jnp.array([25.0, 50.0, 75.0]), axis=axis, keepdims=True)
    iqr = q75 - q25
    iqr = jnp.where(jnp.abs(iqr) < eps_zero, 1.0, iqr)  # sklearn zero-scale rule
    return (x - q50) / iqr


def clamp(x: Array, lim: float) -> Array:
    """Symmetric clamp to ±lim [ref: brennan2018.py:124]."""
    return jnp.clip(x, -lim, lim)


def baseline_correct(x: Array, baseline_len_samp: int) -> Array:
    """Subtract the per-(…, channel) mean of the first ``baseline_len_samp``
    time samples [ref: brennan2018.py:136-142, preproc_utils.py:129-142].

    x: (..., C, T).
    """
    baseline = jnp.mean(x[..., :baseline_len_samp], axis=-1, keepdims=True)
    return x - baseline


def gwilliams_collate(
    X: Array, baseline_len_samp: int, clamp_lim: float, do_clamp: bool = True
) -> Array:
    """The Gwilliams2022Collator as one fused device op: baseline-correct the
    first 0.5 s, then robust-scale and clamp each (segment, channel) window
    [ref: gwilliams2022.py:653-661]. X: (B, C, T).

    Note the composition collapses: median(x - b) = median(x) - b and the IQR
    is shift-invariant, so baseline-correct-then-robust-scale ==
    robust-scale alone. The baseline step is kept for clarity/parity; the
    precomputed-stats path (window_scale_stats/apply_scale_stats) exploits the
    identity to move the quantile sort out of the train step entirely."""
    X = baseline_correct(X, baseline_len_samp)
    X = robust_scale(X, axis=-1)
    if do_clamp:
        X = clamp(X, clamp_lim)
    return X


@jax.jit
def window_scale_stats(windows: Array) -> Array:
    """Per-(window, channel) robust-scaling statistics over the time axis:
    returns (..., C, 2) with [median, IQR] (zero IQRs replaced by 1). Computed
    ONCE per segment at dataset-build time — the train-step collate then needs
    no sort."""
    q25, q50, q75 = jnp.percentile(
        windows.astype(jnp.float32), jnp.array([25.0, 50.0, 75.0]), axis=-1
    )
    iqr = q75 - q25
    iqr = jnp.where(jnp.abs(iqr) < 1e-12, 1.0, iqr)
    return jnp.stack([q50, iqr], axis=-1)


def apply_scale_stats(
    X: Array, stats: Array, clamp_lim: float, do_clamp: bool = True,
    channels_last: bool = False,
) -> Array:
    """Elementwise collate using precomputed stats: clip((X - med) / IQR).
    Exactly equals gwilliams_collate on the same windows (the baseline
    subtraction cancels inside the median; see gwilliams_collate).
    X: (B, C, T) — or (B, T, C) with channels_last; stats: (B, C, 2)."""
    if channels_last:
        med = stats[..., 0][:, None, :]
        iqr = stats[..., 1][:, None, :]
    else:
        med = stats[..., 0:1]
        iqr = stats[..., 1:2]
    Y = (X.astype(jnp.float32) - med) / iqr
    if do_clamp:
        Y = clamp(Y, clamp_lim)
    return Y
