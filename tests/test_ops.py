"""DSP-op parity tests: FIR band-pass (frequency-response contract + MNE
golden when available), FFT resample (scipy spectral-core parity + signal
properties), sinc resample (torchaudio algorithm twin + spectral checks),
robust scaling (sklearn parity), baseline correction."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from speech_decoding_tpu.ops.fir import (
    bandpass_filter,
    design_bandpass_fir,
    fir_filter_zero_phase,
    reflect_limited_pad,
)
from speech_decoding_tpu.ops.resample import fft_resample, sinc_resample, _sinc_kernel
from speech_decoding_tpu.ops.scaling import (
    baseline_correct,
    gwilliams_collate,
    robust_scale,
)


class TestFIRDesign:
    def test_bandpass_response(self):
        """1–60 Hz band-pass at 500 Hz: unity in band, strong attenuation in
        the stop bands, -6 dB (half amplitude) at the band edges (MNE's firwin
        convention puts the -6 dB point at the passband edge)."""
        sfreq = 500.0
        taps = design_bandpass_fir(sfreq, 1.0, 60.0)
        assert len(taps) % 2 == 1
        w, h = scipy.signal.freqz(taps, worN=16384, fs=sfreq)
        mag = np.abs(h)

        def at(f):
            return mag[np.argmin(np.abs(w - f))]

        assert abs(at(10.0) - 1.0) < 0.01
        assert abs(at(30.0) - 1.0) < 0.01
        # MNE firwin convention: -6 dB at the transition-band center
        assert abs(at(0.5) - 0.5) < 0.05  # low edge center (l_trans = 1 Hz)
        assert abs(at(67.5) - 0.5) < 0.05  # high edge center (h_trans = 15 Hz)
        assert abs(at(1.0) - 1.0) < 0.05  # passband edge
        assert abs(at(60.0) - 1.0) < 0.05
        assert at(0.05) < 0.05  # low stop band
        assert at(100.0) < 1e-3

    def test_expected_length(self):
        # l_trans=1 Hz dominates: 3.3 * 500 / 1 = 1650 -> odd 1651
        taps = design_bandpass_fir(500.0, 1.0, 60.0)
        assert len(taps) == 1651

    # -- independent from-spec twin (pure numpy, no scipy/MNE) ---------------

    @staticmethod
    def _firwin_spec(numtaps: int, cutoff_hz: float, sfreq: float) -> np.ndarray:
        """firwin from its mathematical definition: hamming-windowed ideal
        sinc lowpass, unity DC gain — independent of scipy internals."""
        m = np.arange(numtaps) - (numtaps - 1) / 2.0
        fc = cutoff_hz / (sfreq / 2.0)  # cutoff in Nyquist units
        h = fc * np.sinc(fc * m)
        n = np.arange(numtaps)
        h *= 0.54 - 0.46 * np.cos(2 * np.pi * n / (numtaps - 1))  # hamming
        return h / h.sum()

    @classmethod
    def _mne_bandpass_spec(
        cls, sfreq: float, l_freq: float, h_freq: float
    ) -> np.ndarray:
        """MNE's documented 'firwin' band-pass construction, re-derived from
        spec with the pure-numpy firwin twin: per-edge transition bandwidths,
        per-edge lengths 3.3*sfreq/trans (odd), band-pass = centered
        lowpass(high edge) - centered lowpass(low edge)."""

        def odd(n):
            return n + 1 - n % 2

        nyq = sfreq / 2.0
        l_trans = min(max(0.25 * l_freq, 2.0), l_freq)
        h_trans = min(max(0.25 * h_freq, 2.0), nyq - h_freq)
        N = odd(int(round(3.3 * sfreq / min(l_trans, h_trans))))

        def centered(cutoff, trans):
            n = min(odd(int(round(3.3 * sfreq / trans))), N)
            h = cls._firwin_spec(n, cutoff, sfreq)
            out = np.zeros(N)
            off = (N - n) // 2
            out[off : off + n] = h
            return out

        return centered(h_freq + h_trans / 2.0, h_trans) - centered(
            l_freq - l_trans / 2.0, l_trans
        )

    def test_taps_match_from_spec_twin(self):
        """design_bandpass_fir (scipy-built) == the independent pure-numpy
        from-spec construction, tap for tap, for both dataset configs."""
        for sfreq in (500.0, 1000.0):
            ours = design_bandpass_fir(sfreq, 1.0, 60.0)
            spec = self._mne_bandpass_spec(sfreq, 1.0, 60.0)
            np.testing.assert_allclose(ours, spec, atol=1e-12)

    def test_tap_golden(self):
        """Tap-level golden parity. Against true MNE when installed; always
        against the independent from-spec twin otherwise — never skipped."""
        try:
            import mne

            h_ref = mne.filter.create_filter(
                np.zeros(100000), 500.0, 1.0, 60.0, fir_design="firwin"
            )
            atol = 1e-7
        except ImportError:
            h_ref = self._mne_bandpass_spec(500.0, 1.0, 60.0)
            atol = 1e-12
        taps = design_bandpass_fir(500.0, 1.0, 60.0)
        np.testing.assert_allclose(taps, h_ref, atol=atol)


class TestDSPGoldenFixtures:
    """Frozen end-to-end filter+resample goldens (tests/golden/dsp_golden.npz,
    regenerate with tools/make_dsp_golden.py — from true MNE outputs when run
    in an MNE env, else pinned from the spec-verified implementation)."""

    @pytest.fixture(scope="class")
    def golden(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "golden", "dsp_golden.npz")
        return np.load(path)

    @pytest.mark.parametrize("case", ["gwilliams", "brennan"])
    def test_filter_and_resample_match_golden(self, golden, case):
        from speech_decoding_tpu.ops.resample import fft_resample

        sfreq, l_freq, h_freq, new_rate = golden[f"{case}_meta"]
        x = jnp.asarray(golden[f"{case}_input"])
        taps = design_bandpass_fir(sfreq, l_freq, h_freq)
        np.testing.assert_allclose(taps, golden[f"{case}_taps"], atol=1e-10)
        filt = np.asarray(fir_filter_zero_phase(x, jnp.asarray(taps)))
        np.testing.assert_allclose(
            filt, golden[f"{case}_filtered"], rtol=2e-4, atol=2e-4
        )
        res = np.asarray(fft_resample(jnp.asarray(filt), up=new_rate, down=sfreq))
        np.testing.assert_allclose(
            res, golden[f"{case}_resampled"], rtol=2e-4, atol=2e-4
        )


class TestFIRApply:
    def test_zero_phase_and_scipy_parity(self, rng):
        """Zero-phase FFT application == scipy filtfilt-style centered
        convolution on the padded signal."""
        x = rng.normal(size=(3, 4, 2000)).astype(np.float32)
        taps = design_bandpass_fir(250.0, 2.0, 40.0)
        ours = np.asarray(fir_filter_zero_phase(jnp.asarray(x), jnp.asarray(taps)))
        # numpy twin: odd-reflect pad, full conv, center crop
        n_edge = len(taps) - 1
        ref = np.empty_like(x)
        for i in range(3):
            for j in range(4):
                row = x[i, j]
                left = 2 * row[0] - row[n_edge:0:-1]
                right = 2 * row[-1] - row[-2 : -n_edge - 2 : -1]
                padded = np.concatenate([left, row, right])
                full = np.convolve(padded, taps)
                start = (len(taps) - 1) // 2 + n_edge
                ref[i, j] = full[start : start + row.shape[-1]]
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_inband_sine_preserved(self):
        sfreq, f0 = 500.0, 10.0
        t = np.arange(5000) / sfreq
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(bandpass_filter(jnp.asarray(x)[None], sfreq, 1.0, 60.0))[0]
        core = slice(1000, 4000)
        # no phase shift, amplitude preserved
        np.testing.assert_allclose(y[core], x[core], atol=0.02)

    def test_out_of_band_removed(self):
        sfreq = 500.0
        t = np.arange(5000) / sfreq
        x = (np.sin(2 * np.pi * 10 * t) + np.sin(2 * np.pi * 150 * t)).astype(np.float32)
        y = np.asarray(bandpass_filter(jnp.asarray(x)[None], sfreq, 1.0, 60.0))[0]
        target = np.sin(2 * np.pi * 10 * t)
        np.testing.assert_allclose(y[1000:4000], target[1000:4000], atol=0.02)

    def test_reflect_limited_pad(self):
        x = jnp.asarray(np.array([[1.0, 2.0, 5.0]]))
        y = np.asarray(reflect_limited_pad(x, 2))
        np.testing.assert_allclose(y[0], [-3.0, 0.0, 1.0, 2.0, 5.0, 8.0, 9.0])


class TestFFTResample:
    @staticmethod
    def _numpy_twin(x: np.ndarray, up: float, down: float) -> np.ndarray:
        """The documented MNE resample algorithm, in numpy/scipy."""
        ratio = up / down
        n = x.shape[-1]
        min_add = min(n // 8, 100)
        total = 1 << int(np.ceil(np.log2(n + min_add)))
        npad = total - n
        pad_l, pad_r = npad // 2, npad - npad // 2
        left = 2 * x[..., :1] - x[..., pad_l:0:-1]
        right = 2 * x[..., -1:] - x[..., -2 : -pad_r - 2 : -1]
        big = np.concatenate([left, x, right], axis=-1)
        new_len = int(round(ratio * big.shape[-1]))
        y = scipy.signal.resample(big, new_len, axis=-1)
        to_l = int(round(ratio * pad_l))
        n_out = int(round(ratio * n))
        return y[..., to_l : to_l + n_out]

    def test_matches_numpy_twin(self, rng):
        x = rng.normal(size=(3, 2000)).astype(np.float64)
        for up, down in [(120.0, 1000.0), (2.4, 1.0), (1.0, 3.0)]:
            ours = np.asarray(fft_resample(jnp.asarray(x), up=up, down=down))
            theirs = self._numpy_twin(x, up, down)
            np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    def test_downsample_sine(self):
        """FFT resampling on padded-to-pow2 lengths has a ~1e-5 relative
        frequency quirk (inherent to the MNE algorithm) — tolerance reflects
        the accumulated phase error, not noise."""
        sfreq, f0 = 1000.0, 7.0
        t = np.arange(20000) / sfreq
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(fft_resample(jnp.asarray(x)[None], up=120.0, down=1000.0))[0]
        assert y.shape[0] == round(20000 * 120 / 1000)
        t2 = np.arange(y.shape[0]) / 120.0
        expected = np.sin(2 * np.pi * f0 * t2)
        np.testing.assert_allclose(y[50:-50], expected[50:-50], atol=0.05)

    def test_upsample_matches_mne_factor(self):
        """Brennan upsamples embeddings by 2.4 [ref: brennan2018.py:197-201]."""
        x = np.cos(2 * np.pi * 3.0 * np.arange(3000) / 50.0).astype(np.float32)
        y = np.asarray(fft_resample(jnp.asarray(x)[None, None], up=2.4))[0, 0]
        assert y.shape[0] == round(3000 * 2.4)
        t2 = np.arange(y.shape[0]) / 120.0
        np.testing.assert_allclose(y[100:-100], np.cos(2 * np.pi * 3.0 * t2)[100:-100], atol=0.08)

    def test_spectral_core_matches_scipy(self, rng):
        """On an exact power-of-two input with no padding effects at the center,
        our spectral resize == scipy.signal.resample."""
        from speech_decoding_tpu.ops.resample import _spectral_resize

        for n_in, n_out in [(256, 100), (256, 611), (250, 125), (128, 127)]:
            x = rng.normal(size=(2, n_in)).astype(np.float64)
            X = np.fft.fft(x)
            ours = np.fft.ifft(np.asarray(_spectral_resize(jnp.asarray(X), n_in, n_out))).real * (
                n_out / n_in
            )
            theirs = scipy.signal.resample(x, n_out, axis=-1)
            np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_batched(self, rng):
        x = rng.normal(size=(4, 6, 1000)).astype(np.float32)
        y = np.asarray(fft_resample(jnp.asarray(x), up=1.0, down=2.0))
        assert y.shape == (4, 6, 500)


class TestSincResample:
    def test_kernel_matches_torchaudio_algorithm(self):
        """Pure-numpy twin of torchaudio's _get_sinc_resample_kernel."""
        kernel, width = _sinc_kernel(441, 160, 128, 0.99)
        assert kernel.shape[0] == 160
        base = min(441, 160) * 0.99
        assert width == int(np.ceil(128 * 441 / base))
        # DC: each phase row must sum to ~new/orig gain preservation
        np.testing.assert_allclose(kernel.sum(axis=1), 1.0, atol=5e-3)

    def test_sine_preserved_44k_to_16k(self):
        orig, new, f0 = 44100, 16000, 440.0
        t = np.arange(44100) / orig
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(sinc_resample(jnp.asarray(x)[None], orig, new, 128))[0]
        assert y.shape[0] == int(np.ceil(len(x) * new / orig))
        t2 = np.arange(y.shape[0]) / new
        expected = np.sin(2 * np.pi * f0 * t2)
        np.testing.assert_allclose(y[200:-200], expected[200:-200], atol=5e-3)

    def test_scipy_resample_poly_agreement(self, rng):
        """Band-limited noise through ours vs scipy.resample_poly (different
        window, so compare loosely in the passband sense)."""
        x = rng.normal(size=8000).astype(np.float32)
        x = scipy.signal.sosfilt(
            scipy.signal.butter(8, 3000, fs=44100, output="sos"), x
        ).astype(np.float32)
        ours = np.asarray(sinc_resample(jnp.asarray(x)[None], 44100, 16000, 128))[0]
        theirs = scipy.signal.resample_poly(x, 160, 441)
        n = min(len(ours), len(theirs))
        err = np.sqrt(np.mean((ours[500 : n - 500] - theirs[500 : n - 500]) ** 2))
        assert err < 0.02, err


class TestScaling:
    def test_robust_scale_matches_sklearn(self, rng):
        from sklearn.preprocessing import RobustScaler

        x = (rng.normal(size=(5, 300)) * rng.uniform(0.1, 10, (5, 1))).astype(np.float64)
        ours = np.asarray(robust_scale(jnp.asarray(x), axis=-1))
        theirs = RobustScaler().fit_transform(x.T).T
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_robust_scale_constant_channel(self):
        x = np.ones((3, 50), np.float32)
        out = np.asarray(robust_scale(jnp.asarray(x), axis=-1))
        np.testing.assert_allclose(out, 0.0)  # sklearn zero-IQR rule

    def test_baseline_correct(self, rng):
        x = rng.normal(size=(2, 4, 100)).astype(np.float32) + 5.0
        y = np.asarray(baseline_correct(jnp.asarray(x), 30))
        np.testing.assert_allclose(y[..., :30].mean(-1), 0.0, atol=1e-5)

    def test_gwilliams_collate_matches_reference_order(self, rng):
        """baseline FIRST, then robust-scale, then clamp
        [ref: gwilliams2022.py:658-659]."""
        from sklearn.preprocessing import RobustScaler

        X = (rng.normal(size=(4, 8, 360)) * 40).astype(np.float64)
        ours = np.asarray(gwilliams_collate(jnp.asarray(X), 60, 20.0, True))
        ref = np.empty_like(X)
        for b in range(4):
            xb = X[b] - X[b][:, :60].mean(-1, keepdims=True)
            xb = RobustScaler().fit_transform(xb.T).T
            ref[b] = np.clip(xb, -20, 20)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestPreprocessBatch:
    def test_fused_matches_exact_up_to_subsample_alignment(self, rng):
        """The fused path shares pads across a length bucket, so its output
        grid can sit up to ~0.5 output samples off the per-recording MNE
        (exact) grid and carries the same ~1e-4 relative rate quirk; the
        signals must be identical up to that sub-sample alignment (lag-scan
        correlation), and low-frequency content must agree pointwise."""
        from speech_decoding_tpu.ops.brain_preproc import (
            preprocess_batch,
            preprocess_exact,
        )

        recs = [
            rng.normal(size=(4, 20000)).astype(np.float32),
            rng.normal(size=(4, 18500)).astype(np.float32),
        ]
        outs = preprocess_batch(recs, 500.0, 1.0, 60.0, 120.0)
        for r, o in zip(recs, outs):
            ex = np.asarray(
                preprocess_exact(jnp.asarray(r), 500.0, 1.0, 60.0, down=500 / 120)
            )
            assert o.shape == ex.shape
            # compare on an 8x-oversampled grid so the fractional shift
            # becomes a findable integer lag
            up = 8
            of = np.asarray(fft_resample(jnp.asarray(o[0:1]), up=float(up)))[0]
            ef = np.asarray(fft_resample(jnp.asarray(ex[0:1]), up=float(up)))[0]
            core = slice(200 * up, -200 * up)
            a = of[core] - of[core].mean()
            best = 0.0
            for lag in range(-up, up + 1):
                b = ef[core.start + lag : len(ef) + core.stop + lag]
                b = b - b.mean()
                best = max(best, float(np.corrcoef(a, b)[0, 1]))
            # white noise at the 60 Hz band edge maximizes spectral-leakage
            # differences between padding choices (inherent to MNE-style FFT
            # resampling: different npad -> ~0.1 RMS differences near the
            # output Nyquist); real 1/f M/EEG agrees far tighter
            assert best > 0.995, best

    def test_fused_sine_absolute(self):
        """In-band sine through the fused pipeline equals the analytically
        resampled sine (tolerance covers the MNE rate quirk's phase drift)."""
        from speech_decoding_tpu.ops.brain_preproc import preprocess_batch

        for n in (20000, 20037):
            t = np.arange(n) / 1000.0
            x = np.sin(2 * np.pi * 7.0 * t).astype(np.float32)[None]
            y = preprocess_batch([x], 1000.0, 1.0, 60.0, 120.0, microbatch=1)[0][0]
            t2 = np.arange(len(y)) / 120.0
            ideal = np.sin(2 * np.pi * 7.0 * t2)
            assert np.abs(y[60:-60] - ideal[60:-60]).max() < 0.25

    def test_very_mixed_lengths(self, rng):
        """A 45x length spread in one bucket: the short recording's share of
        the pow2 pad greatly exceeds its own length, so reflect-limited
        padding must ZERO-extend beyond one full reflection (MNE _smart_pad
        semantics). Regression: the on-device pad used to truncate silently
        and crash jnp.stack with a shape mismatch."""
        from speech_decoding_tpu.ops.brain_preproc import (
            preprocess_batch,
            preprocess_exact,
        )

        recs = [
            rng.normal(size=(2, 4000)).astype(np.float32),
            rng.normal(size=(2, 180000)).astype(np.float32),
        ]
        outs = preprocess_batch(recs, 500.0, 1.0, 60.0, 120.0)
        # exact-chain threshold: 0.995 for the short recording; the long one
        # accumulates the MNE padded-grid rate quirk (~1e-5 relative) into a
        # PROGRESSIVE drift (~0.5 output samples over 180k input samples at
        # white-noise bandwidth) that no constant lag compensates — the
        # default fused path resamples on the exact rational grid instead
        # (documented deviation, cf. preprocs.exact_mne_grid)
        for r, o, margin, thresh in zip(recs, outs, (100, 200), (0.995, 0.98)):
            ex = np.asarray(
                preprocess_exact(jnp.asarray(r), 500.0, 1.0, 60.0, down=500 / 120)
            )
            assert o.shape == ex.shape == (2, round(r.shape[-1] * 120 / 500))
            up = 8
            of = np.asarray(fft_resample(jnp.asarray(o[0:1]), up=float(up)))[0]
            ef = np.asarray(fft_resample(jnp.asarray(ex[0:1]), up=float(up)))[0]
            core = slice(margin * up, -margin * up)
            a = of[core] - of[core].mean()
            best = 0.0
            for lag in range(-up, up + 1):
                b = ef[core.start + lag : len(ef) + core.stop + lag]
                b = b - b.mean()
                best = max(best, float(np.corrcoef(a, b)[0, 1]))
            assert best > thresh, (r.shape, best)

    def test_short_recordings_fall_back_to_exact(self, rng):
        """When the shared pow2 padding is shorter than the filter half-length
        the circular wrap would corrupt the signal; the exact per-recording
        path is used instead."""
        from speech_decoding_tpu.ops.brain_preproc import (
            preprocess_batch,
            preprocess_exact,
        )

        # a 0.1 Hz high-pass edge needs 16501 taps (half-length 8250), which
        # exceeds the shared pad of a ~20k recording -> exact fallback
        recs = [rng.normal(size=(3, 20000)).astype(np.float32)]
        outs = preprocess_batch(recs, 500.0, 0.1, 60.0, 120.0)
        ex = np.asarray(
            preprocess_exact(jnp.asarray(recs[0]), 500.0, 0.1, 60.0, down=500 / 120)
        )
        np.testing.assert_allclose(outs[0], ex, rtol=1e-5, atol=1e-6)

    def test_device_resident_mode(self, rng):
        from speech_decoding_tpu.ops.brain_preproc import preprocess_batch
        import jax

        recs = [rng.normal(size=(2, 20000)).astype(np.float32)]
        outs = preprocess_batch(recs, 500.0, 1.0, 60.0, 120.0, to_host=False)
        assert isinstance(outs[0], jax.Array)
        host = preprocess_batch(recs, 500.0, 1.0, 60.0, 120.0, to_host=True)
        np.testing.assert_allclose(np.asarray(outs[0]), host[0], rtol=1e-5)

    def test_quantized_transfer_parity(self, rng):
        """int16 (per-channel scale) / bf16 raw transfer modes halve the
        host->device bytes on link-bound hosts; the preprocessed output must
        stay within tight bounds of the f32 path (the band-pass attenuates
        out-of-band quantization noise) [VERDICT r2 next #6]."""
        from speech_decoding_tpu.ops.brain_preproc import preprocess_batch

        # realistic amplitude spread across channels (per-channel scaling)
        amps = np.array([[1.0], [50.0], [2e3], [1e-3]], np.float32)
        recs = [
            (rng.normal(size=(4, 20000)) * amps).astype(np.float32),
            (rng.normal(size=(4, 12000)) * amps).astype(np.float32),
        ]
        f32 = preprocess_batch(recs, 500.0, 1.0, 60.0, 120.0)
        i16 = preprocess_batch(
            recs, 500.0, 1.0, 60.0, 120.0, transfer_dtype="int16"
        )
        bf16 = preprocess_batch(
            recs, 500.0, 1.0, 60.0, 120.0, transfer_dtype="bfloat16"
        )
        for a, b, c in zip(f32, i16, bf16):
            scale = np.abs(a).max(axis=-1, keepdims=True)
            np.testing.assert_allclose(b / scale, a / scale, atol=2e-4)
            np.testing.assert_allclose(c / scale, a / scale, atol=6e-3)
            # int16 is strictly tighter than bf16 at the same byte count
            assert np.abs(b - a).max() < np.abs(c - a).max()

    def test_quantized_transfer_zero_channel(self):
        """An all-zero channel must not divide by zero in the int16 scale."""
        from speech_decoding_tpu.ops.brain_preproc import preprocess_batch

        x = np.zeros((2, 20000), np.float32)
        x[1] = np.sin(np.arange(20000) * 0.05)
        out = preprocess_batch([x], 500.0, 1.0, 60.0, 120.0, transfer_dtype="int16")[0]
        assert np.isfinite(out).all()
        assert np.abs(out[0]).max() == 0.0


class TestPrecomputedScaleStats:
    def test_baseline_cancellation_identity(self, rng):
        """clip((x-b) - med(x-b)) / iqr(x-b)) == clip((x - med(x)) / iqr(x)):
        the precomputed-stats collate equals the reference composition."""
        from speech_decoding_tpu.ops.scaling import (
            apply_scale_stats,
            window_scale_stats,
        )

        X = (rng.normal(size=(5, 8, 360)) * 30 + 4).astype(np.float32)
        ref = np.asarray(gwilliams_collate(jnp.asarray(X), 60, 20.0, True))
        stats = window_scale_stats(jnp.asarray(X))
        fast = np.asarray(apply_scale_stats(jnp.asarray(X), stats, 20.0, True))
        np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)


class TestDSPFuzz:
    """Property fuzz over the DSP parity surface: random rates/bands/shapes
    against the independent numpy/scipy twins."""

    def test_fuzz_resample_rates(self, rng):
        from speech_decoding_tpu.ops.resample import fft_resample

        local = np.random.default_rng(42)
        x = rng.normal(size=(2, 1777)).astype(np.float64)
        for _ in range(8):
            up = float(local.uniform(0.3, 4.0))
            down = float(local.uniform(0.3, 4.0))
            ours = np.asarray(fft_resample(jnp.asarray(x), up=up, down=down))
            theirs = TestFFTResample._numpy_twin(x, up, down)
            assert ours.shape == theirs.shape, (up, down)
            np.testing.assert_allclose(
                ours, theirs, rtol=2e-3, atol=2e-4, err_msg=f"up={up} down={down}"
            )

    def test_fuzz_bandpass_response(self):
        """Random band edges: -6 dB at each transition-band center, unity in
        the passband midpoint, attenuation in the stop bands."""
        local = np.random.default_rng(7)
        for _ in range(6):
            sfreq = float(local.choice([250.0, 500.0, 1000.0]))
            l_freq = float(local.uniform(0.5, 5.0))
            h_freq = float(local.uniform(30.0, sfreq / 2 - 40.0))
            taps = design_bandpass_fir(sfreq, l_freq, h_freq)
            w, h = scipy.signal.freqz(taps, worN=32768, fs=sfreq)
            mag = np.abs(h)

            def at(f):
                return mag[np.argmin(np.abs(w - f))]

            l_trans = min(max(0.25 * l_freq, 2.0), l_freq)
            h_trans = min(max(0.25 * h_freq, 2.0), sfreq / 2 - h_freq)
            mid = np.sqrt(l_freq * h_freq)
            case = f"sfreq={sfreq} l={l_freq:.2f} h={h_freq:.1f}"
            assert abs(at(mid) - 1.0) < 0.02, case
            assert abs(at(l_freq - l_trans / 2) - 0.5) < 0.06, case
            assert abs(at(h_freq + h_trans / 2) - 0.5) < 0.06, case
            assert at(max(l_freq - 2 * l_trans, w[1])) < 0.12, case
            assert at(min(h_freq + 2 * h_trans, sfreq / 2 - 1)) < 0.12, case
