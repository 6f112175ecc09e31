"""Host-CPU preprocessing twin + hybrid dispatcher (VERDICT r3 item 1):
parity of the production numpy path with the device exact-grid path, and
order/route correctness of ``preprocess_auto``."""

import numpy as np
import pytest

import jax.numpy as jnp

from speech_decoding_tpu.ops.brain_preproc import preprocess_batch, preprocess_exact
from speech_decoding_tpu.ops.brain_preproc_host import (
    fft_resample_np,
    fir_filter_zero_phase_np,
    preprocess_host,
    reflect_limited_pad_np,
)
from speech_decoding_tpu.ops.fir import (
    design_bandpass_fir,
    fir_filter_zero_phase,
    reflect_limited_pad,
)
from speech_decoding_tpu.ops.preproc_dispatch import (
    model_device_e2e,
    plan_split,
    preprocess_auto,
)
from speech_decoding_tpu.ops.resample import fft_resample


class TestHostTwin:
    def test_pad_matches_device(self, rng):
        x = rng.normal(size=(3, 50)).astype(np.float32)
        for pad in (0, 1, 10, 49, 80):  # incl. beyond-one-reflection zero-extend
            a = reflect_limited_pad_np(x, pad)
            b = np.asarray(reflect_limited_pad(jnp.asarray(x), pad))
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_filter_matches_device(self, rng):
        x = rng.normal(size=(4, 3000)).astype(np.float32)
        taps = design_bandpass_fir(500.0, 1.0, 60.0)
        a = fir_filter_zero_phase_np(x, taps)
        b = np.asarray(fir_filter_zero_phase(jnp.asarray(x), jnp.asarray(taps)))
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_resample_matches_device(self, rng):
        x = rng.normal(size=(4, 3000)).astype(np.float32)
        for up, down in [(1.0, 500 / 120), (2.4, 1.0), (1.0, 25 / 3)]:
            a = fft_resample_np(x, up, down)
            b = np.asarray(fft_resample(jnp.asarray(x), up, down))
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_preprocess_host_matches_exact_chain(self, rng):
        """The production host path == the device exact-grid chain (the same
        per-recording MNE grids) to f32 FFT rounding. This is the parity
        that makes hybrid routing numerically inert."""
        r = rng.normal(size=(4, 20000)).astype(np.float32)
        host = preprocess_host([r], 500.0, 1.0, 60.0, 120.0)[0]
        dev = np.asarray(
            preprocess_exact(jnp.asarray(r), 500.0, 1.0, 60.0, down=500 / 120)
        )
        assert host.shape == dev.shape
        scale = np.abs(dev).max()
        assert np.abs(host - dev).max() / scale < 1e-5

    def test_preprocess_host_threaded_matches_serial(self, rng):
        recs = [rng.normal(size=(2, n)).astype(np.float32) for n in (4000, 5000, 4000)]
        a = preprocess_host(recs, 500.0, 1.0, 60.0, 120.0, workers=1)
        b = preprocess_host(recs, 500.0, 1.0, 60.0, 120.0, workers=3)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestDispatcher:
    def test_model_device_e2e(self):
        # compute-bound on a fast link, link-bound on a slow one
        fast = model_device_e2e(12900.0, 10_000.0, 208, 1000.0, 120.0, "int16")
        slow = model_device_e2e(12900.0, 45.0, 208, 1000.0, 120.0, "int16")
        assert fast == 12900.0
        bytes_per_megsec = 208 * 1000 * 2 / 1e6 + 208 * 120 * 4 / 1e6
        assert slow == pytest.approx(45.0 / bytes_per_megsec)
        assert model_device_e2e(0.0, 45.0, 208, 1000.0, 120.0) == 0.0

    def test_plan_split_proportional(self):
        durs = [10.0] * 20
        routes = plan_split(durs, host_rate=25.0, device_e2e=75.0)
        assert routes.count("device") == 15 and routes.count("host") == 5
        assert plan_split(durs, 10.0, 0.0) == ["host"] * 20
        assert plan_split(durs, 0.0, 10.0) == ["device"] * 20

    def test_auto_mixed_split_preserves_order_and_values(self, rng):
        """Inject rates that force a genuine mixed split; every output must
        equal its single-route reference and sit at its input index."""
        recs = [rng.normal(size=(3, 4000 + 200 * i)).astype(np.float32) for i in range(6)]
        rates = {"host_rate": 50.0, "device_rate": 1000.0, "link_mbps": 10_000.0}
        out = preprocess_auto(
            recs, 500.0, 1.0, 60.0, 120.0, rates=rates, verbose=False,
            transfer_dtype="float32",
        )
        ref = preprocess_host(recs, 500.0, 1.0, 60.0, 120.0)
        assert len(out) == len(recs)
        for o, r in zip(out, ref):
            assert o.shape == r.shape
            scale = np.abs(r).max()
            assert np.abs(o - r).max() / scale < 1e-5

    def test_auto_forced_routes(self, rng):
        recs = [rng.normal(size=(3, 4000)).astype(np.float32)]
        h = preprocess_auto(recs, 500.0, 1.0, 60.0, 120.0, force="host", verbose=False)
        d = preprocess_auto(
            recs, 500.0, 1.0, 60.0, 120.0, force="device", verbose=False,
            transfer_dtype="float32",
        )
        ref = preprocess_batch(recs, 500.0, 1.0, 60.0, 120.0, exact_grid=True)
        np.testing.assert_array_equal(h[0], preprocess_host(recs, 500.0, 1.0, 60.0, 120.0)[0])
        np.testing.assert_array_equal(d[0], ref[0])
        scale = np.abs(ref[0]).max()
        assert np.abs(h[0] - d[0]).max() / scale < 1e-5

    def test_auto_int16_transfer_within_quantization_bound(self, rng):
        """The dispatcher's default int16 raw transfer on the device share is
        the documented ~90 dB SNR quantized path; routes then agree to the
        quantization bound (not f32 rounding)."""
        recs = [rng.normal(size=(3, 4000)).astype(np.float32)]
        d = preprocess_auto(recs, 500.0, 1.0, 60.0, 120.0, force="device", verbose=False)
        ref = preprocess_host(recs, 500.0, 1.0, 60.0, 120.0)
        scale = np.abs(ref[0]).max()
        assert np.abs(d[0] - ref[0]).max() / scale < 5e-4

    def test_auto_empty(self):
        assert preprocess_auto([], 500.0, 1.0, 60.0, 120.0, verbose=False) == []

    def test_auto_host_only_when_no_device_rate(self, rng):
        recs = [rng.normal(size=(2, 3000)).astype(np.float32)]
        rates = {"host_rate": 10.0, "device_rate": 0.0, "link_mbps": 0.0}
        out = preprocess_auto(recs, 500.0, 1.0, 60.0, 120.0, rates=rates, verbose=False)
        np.testing.assert_array_equal(
            out[0], preprocess_host(recs, 500.0, 1.0, 60.0, 120.0)[0]
        )

    def test_usable_cpus_respects_affinity_not_machine_size(self, monkeypatch):
        """A pinned/quota-limited process must size by its grant, not the
        machine: os.cpu_count() on a 64-core host pinned to one core says 64,
        which would let the dispatcher take the mixed host+device split that
        a single core cannot pump. Affinity masks and cgroup-v2 CPU quotas
        (docker --cpus) are independent limits; both must clamp."""
        import os

        from speech_decoding_tpu.ops import brain_preproc_host as bph

        monkeypatch.setattr(bph, "_cgroup_cpu_quota", lambda: float("inf"))
        monkeypatch.setattr(os, "cpu_count", lambda: 64)
        monkeypatch.setattr(os, "sched_getaffinity", lambda pid: {0}, raising=False)
        assert bph.usable_cpus() == 1
        # non-Linux fallback: no sched_getaffinity -> cpu_count
        def _raise(pid):
            raise AttributeError
        monkeypatch.setattr(os, "sched_getaffinity", _raise, raising=False)
        assert bph.usable_cpus() == 64
        # cgroup quota invisible to the affinity mask (docker --cpus=2)
        monkeypatch.setattr(
            os, "sched_getaffinity", lambda pid: set(range(64)), raising=False
        )
        monkeypatch.setattr(bph, "_cgroup_cpu_quota", lambda: 2.0)
        assert bph.usable_cpus() == 2

    def test_derive_transfer_dtype_rule(self):
        """The ONE shared upload-dtype rule (explicit > device->float32 >
        exact_grid->float32 > int16) every dataset call site routes through."""
        from speech_decoding_tpu.ops.preproc_dispatch import derive_transfer_dtype

        assert derive_transfer_dtype(None, False, "auto") == "int16"
        assert derive_transfer_dtype(None, False, "host") == "int16"
        assert derive_transfer_dtype(None, True, "auto") == "float32"
        assert derive_transfer_dtype(None, False, "device") == "float32"
        assert derive_transfer_dtype("bfloat16", True, "device") == "bfloat16"
        assert derive_transfer_dtype("int16", False, "device") == "int16"

    def test_auto_never_mixes_routes_on_one_core(self, rng, monkeypatch):
        """With a single usable core the dispatcher must pick ONE route (the
        concurrent host FFT thread starves the device stream's pump), even
        when rates would otherwise plan a mixed split."""
        from speech_decoding_tpu.ops import brain_preproc
        from speech_decoding_tpu.ops import brain_preproc_host as bph

        recs = [rng.normal(size=(2, 3000)).astype(np.float32) for _ in range(4)]
        # host faster than modeled device e2e -> single-core pick = host
        rates = {"host_rate": 500.0, "device_rate": 1000.0, "link_mbps": 0.1}
        monkeypatch.setattr(bph, "usable_cpus", lambda: 1)

        def _no_device(*a, **kw):
            raise AssertionError("device route must not run on a 1-core host pick")

        monkeypatch.setattr(brain_preproc, "preprocess_batch", _no_device)
        out = preprocess_auto(recs, 500.0, 1.0, 60.0, 120.0, rates=rates, verbose=False)
        ref = preprocess_host(recs, 500.0, 1.0, 60.0, 120.0)
        for o, r in zip(out, ref):
            np.testing.assert_array_equal(o, r)


class TestDatasetBackendWiring:
    """tpu.preproc_backend routes the dataset cache builds; host and device
    builds must produce equivalent recordings (exact-grid numerics)."""

    @pytest.mark.slow  # fast twin: test_auto_route_transfer_dtype_derivation (same wiring, lighter)
    def test_gwilliams_host_backend_matches_exact_device(self, tmp_path):
        import fixtures
        from speech_decoding_tpu.data.gwilliams2022 import Gwilliams2022ShallowSplit

        root = str(tmp_path)
        fixtures.make_gwilliams_tree(root)
        w2v = fixtures.tiny_wav2vec()

        cfg_h = fixtures.make_config(root, "Gwilliams2022")
        cfg_h.rebuild_dataset = True
        cfg_h.set_path("tpu.preproc_backend", "host")
        ds_h = Gwilliams2022ShallowSplit(
            cfg_h, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )

        cfg_d = fixtures.make_config(root, "Gwilliams2022")
        cfg_d.rebuild_dataset = True
        cfg_d.preprocs["exact_mne_grid"] = True  # device exact grid == host grid
        ds_d = Gwilliams2022ShallowSplit(
            cfg_d, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        assert set(ds_h.X) == set(ds_d.X)
        for k in ds_h.X:  # after batchfy: {session_key: {task: (C, T)}}
            assert set(ds_h.X[k]) == set(ds_d.X[k])
            for task in ds_h.X[k]:
                a = np.asarray(ds_h.X[k][task])
                b = np.asarray(ds_d.X[k][task])
                scale = np.abs(b).max()
                assert np.abs(a - b).max() / scale < 1e-5, (k, task)

    def test_auto_route_transfer_dtype_derivation(self, tmp_path, monkeypatch):
        """The auto route's device-share upload dtype must follow the rule:
        explicit tpu.preproc_transfer_dtype wins; otherwise int16 unless
        preprocs.exact_mne_grid (whose byte-stable-caches promise int16
        quantization would break) forces float32. Regression for the r4
        review finding that the auto route hardwired int16 and silently
        ignored exact_mne_grid."""
        import fixtures
        from speech_decoding_tpu.data.gwilliams2022 import Gwilliams2022ShallowSplit
        from speech_decoding_tpu.ops import preproc_dispatch
        from speech_decoding_tpu.ops.brain_preproc_host import preprocess_host

        w2v = fixtures.tiny_wav2vec()
        seen = []

        def spy(recordings, sfreq, l_freq, h_freq, out_rate, **kw):
            seen.append(kw.get("transfer_dtype", "int16"))
            # host path produces valid outputs without touching a device
            return preprocess_host(recordings, sfreq, l_freq, h_freq, out_rate)

        monkeypatch.setattr(preproc_dispatch, "preprocess_auto", spy)
        for i, (exact, explicit, expect) in enumerate((
            (False, None, "int16"),
            (True, None, "float32"),
            (False, "bfloat16", "bfloat16"),
        )):
            # fresh tree per case: the per-recording parts cache would
            # otherwise resume and never reach the dispatcher
            root = str(tmp_path / f"case{i}")
            fixtures.make_gwilliams_tree(root)
            cfg = fixtures.make_config(root, "Gwilliams2022")
            cfg.rebuild_dataset = True
            cfg.set_path("tpu.preproc_backend", "auto")
            cfg.preprocs["exact_mne_grid"] = exact
            if explicit is not None:
                cfg.set_path("tpu.preproc_transfer_dtype", explicit)
            Gwilliams2022ShallowSplit(
                cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
            )
            assert seen[-1] == expect, (exact, explicit, seen[-1])
        assert len(seen) == 3

    def test_brennan_device_backend_honors_transfer_dtype(self, tmp_path, monkeypatch):
        """Regression (code-review r4): Brennan's pure-device branch dropped
        tpu.preproc_transfer_dtype on the floor — the documented slow-link
        override was silently dead on this dataset while working on
        Gwilliams. Every backend must route through the shared rule."""
        import fixtures
        from speech_decoding_tpu.data import brennan2018 as b18

        w2v = fixtures.tiny_wav2vec()
        real = b18.preprocess_batch
        seen = []

        def spy(recordings, sfreq, l_freq, h_freq, out_rate, **kw):
            seen.append(kw.get("transfer_dtype", "float32"))
            return real(recordings, sfreq, l_freq, h_freq, out_rate, **kw)

        monkeypatch.setattr(b18, "preprocess_batch", spy)
        for i, (explicit, expect) in enumerate(((None, "float32"), ("int16", "int16"))):
            root = str(tmp_path / f"case{i}")
            fixtures.make_brennan_tree(root, eeg_secs=20.0, audio_secs=20.0)
            cfg = fixtures.make_config(root, "Brennan2018")
            cfg.rebuild_dataset = True
            if explicit is not None:
                cfg.set_path("tpu.preproc_transfer_dtype", explicit)
            b18.Brennan2018Dataset(cfg, wav2vec=w2v)
            assert seen[-1] == expect, (explicit, seen[-1])
        assert len(seen) == 2

    def test_brennan_host_backend_matches_device(self, tmp_path):
        import fixtures
        from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset

        root = str(tmp_path)
        fixtures.make_brennan_tree(root, eeg_secs=20.0, audio_secs=20.0)
        w2v = fixtures.tiny_wav2vec()

        cfg_h = fixtures.make_config(root, "Brennan2018")
        cfg_h.rebuild_dataset = True
        cfg_h.set_path("tpu.preproc_backend", "host")
        ds_h = Brennan2018Dataset(cfg_h, wav2vec=w2v)

        cfg_d = fixtures.make_config(root, "Brennan2018")
        cfg_d.rebuild_dataset = True  # Brennan's ratio always uses the exact grid
        ds_d = Brennan2018Dataset(cfg_d, wav2vec=w2v)
        a, b = np.asarray(ds_h.X), np.asarray(ds_d.X)
        assert a.shape == b.shape
        # X is robust-scaled + clamped after preproc; compare post-pipeline
        assert np.abs(a - b).max() < 1e-3
