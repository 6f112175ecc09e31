"""Time-sharded preprocessing across the mesh: zero-phase FIR band-pass over a
recording whose TIME axis is sharded over the "data" axis, with halo exchange
between neighboring shards (jax.lax.ppermute over ICI).

This is the long-context story for preprocessing (SURVEY §5): recordings are
minutes-to-hours long ((208, ~396000) and up [ref: gwilliams2022.py:249]);
a single chip handles today's sizes, but time-sharding bounds per-chip memory
for arbitrarily long recordings. FIR filtering is local-with-halo: each shard
sends its edge samples (half the filter length) to its neighbors, the
boundary shards reproduce the reflect-limited padding of the global edges, so
the sharded result equals the single-device `bandpass_filter` exactly (up to
fp reassociation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from speech_decoding_tpu.ops.fir import design_bandpass_fir, fir_filter_zero_phase
from speech_decoding_tpu.parallel.mesh import DATA_AXIS

Array = jax.Array


def bandpass_filter_sharded(
    x: Array,
    sfreq: float,
    l_freq: Optional[float],
    h_freq: Optional[float],
    mesh: Mesh,
) -> Array:
    """x: (..., T) with T divisible by the data-axis size; returns the
    band-passed signal, computed shard-locally with halo exchange."""
    taps_np = design_bandpass_fir(sfreq, l_freq, h_freq)
    taps = jnp.asarray(taps_np, jnp.float32)
    halo = (len(taps_np) - 1) // 2
    d = mesh.shape[DATA_AXIS]
    T = x.shape[-1]
    assert T % d == 0, (T, d)
    assert T // d > halo, (
        f"shard length {T // d} must exceed the filter half-length {halo}"
    )

    def local(xl: Array) -> Array:
        idx = jax.lax.axis_index(DATA_AXIS)
        right_edge = xl[..., -halo:]  # goes to my right neighbor's left halo
        left_edge = xl[..., :halo]  # goes to my left neighbor's right halo
        from_left = jax.lax.ppermute(
            right_edge, DATA_AXIS, [(i, i + 1) for i in range(d - 1)]
        )
        from_right = jax.lax.ppermute(
            left_edge, DATA_AXIS, [(i, i - 1) for i in range(1, d)]
        )
        # global boundaries: reflect-limited extension of the signal edges
        # (matches fir_filter_zero_phase's padding)
        reflect_left = 2 * xl[..., :1] - xl[..., halo:0:-1]
        reflect_right = 2 * xl[..., -1:] - xl[..., -2 : -halo - 2 : -1]
        from_left = jnp.where(idx == 0, reflect_left, from_left)
        from_right = jnp.where(idx == d - 1, reflect_right, from_right)
        extended = jnp.concatenate([from_left, xl, from_right], axis=-1)
        y = fir_filter_zero_phase(extended, taps, pad=False)
        return y[..., halo:-halo]

    spec_in = P(*([None] * (x.ndim - 1) + [DATA_AXIS]))
    fn = shard_map(local, mesh=mesh, in_specs=(spec_in,), out_specs=spec_in)
    return fn(x.astype(jnp.float32))


def fft_resample_sharded(
    x: Array, up: float, down: float, mesh: Mesh
) -> Array:
    """MNE-exact FFT resampling with the CHANNEL axis sharded over "data".

    The resample's FFT is global over time (its padded-power-of-two transform
    couples every sample), so an exact *time*-sharded version is a distributed
    FFT — all_to_all transposes for a per-channel 1-D transform that fits
    comfortably on one chip (~400k samples = 1.6 MB [ref:
    gwilliams2022.py:249]). The axis that actually grows in this workload is
    channels × recordings; sharding it keeps every device's slice exact
    (identical to ops.resample.fft_resample) with zero communication.

    x: (C, ..., T) with C divisible by the data-axis size.
    """
    from speech_decoding_tpu.ops.resample import fft_resample

    d = mesh.shape[DATA_AXIS]
    assert x.shape[0] % d == 0, (x.shape, d)
    spec = P(*([DATA_AXIS] + [None] * (x.ndim - 1)))
    fn = shard_map(
        lambda xl: fft_resample(xl, up=up, down=down),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
    )
    return fn(x)


def bandpass_resample_sharded(
    x: Array,
    sfreq: float,
    l_freq: Optional[float],
    h_freq: Optional[float],
    new_rate: float,
    mesh: Mesh,
) -> Array:
    """The full brain-preprocessing DSP chain (band-pass -> resample
    [ref: gwilliams2022.py:253-260]) with the channel/recording axis sharded
    over "data": both stages are per-channel independent, so each device
    processes its channel block exactly like the single-device pipeline —
    memory and compute scale 1/D with zero inter-chip traffic. Use
    ``bandpass_filter_sharded`` instead when a single channel's time axis
    exceeds device memory (FIR is local-with-halo; the resample then runs on
    the gathered result).

    x: (C, T); returns (C, round(T * new_rate / sfreq)).
    """
    taps = jnp.asarray(design_bandpass_fir(sfreq, l_freq, h_freq), jnp.float32)

    def local(xl: Array) -> Array:
        from speech_decoding_tpu.ops.resample import fft_resample

        y = fir_filter_zero_phase(xl, taps)
        return fft_resample(y, up=new_rate, down=sfreq)

    d = mesh.shape[DATA_AXIS]
    assert x.shape[0] % d == 0, (x.shape, d)
    spec = P(DATA_AXIS, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(x.astype(jnp.float32))
