"""Unit tests: config system, natural sort, WAV IO, checkpoint manager,
profiling timer."""

import os

import jax
import numpy as np
import pytest
import scipy.io.wavfile

from speech_decoding_tpu.config import Config, load_config, parse_overrides
from speech_decoding_tpu.utils.natsort import natsorted
from speech_decoding_tpu.utils.profiling import StepTimer
from speech_decoding_tpu.utils.wavio import load_wav


class TestConfig:
    def test_defaults_schema(self):
        cfg = load_config()
        assert cfg.dataset == "Gwilliams2022"
        assert cfg.D1 == 270 and cfg.D2 == 320 and cfg.K == 32
        assert cfg.preprocs.brain_resample_rate == 120
        assert cfg.init_temperature == 5.1
        assert cfg.select("tpu.compute_dtype") == "bfloat16"

    def test_overrides(self):
        cfg = load_config(overrides=["dataset=Brennan2018", "lr=1e-4",
                                     "preprocs.clamp=false", "tpu.remat=true"])
        assert cfg.dataset == "Brennan2018"
        assert cfg.lr == 1e-4
        assert cfg.preprocs.clamp is False
        assert cfg.tpu.remat is True

    def test_parse_values(self):
        out = parse_overrides(["a=3", "b=3.5", "c=true", "d=[1,2]", "e=text"])
        assert out == {"a": 3, "b": 3.5, "c": True, "d": [1, 2], "e": "text"}

    def test_open_mutation_and_copy(self):
        cfg = Config({"a": {"b": 1}})
        cfg.set_path("a.c.d", 5)
        assert cfg.a.c.d == 5
        cp = cfg.copy()
        cp.a.b = 9
        assert cfg.a.b == 1


def test_natsorted():
    items = ["S10.mat", "S2.mat", "S1.mat", "task10_x", "task2_x"]
    assert natsorted(items) == ["S1.mat", "S2.mat", "S10.mat", "task2_x", "task10_x"]


def test_load_wav_int16(tmp_path):
    sr = 8000
    x = (np.sin(np.linspace(0, 40, 4000)) * 0.5 * 32767).astype(np.int16)
    path = str(tmp_path / "t.wav")
    scipy.io.wavfile.write(path, sr, x)
    wave, rate = load_wav(path)
    assert rate == sr and wave.shape == (1, 4000)
    assert np.abs(wave).max() <= 0.51
    np.testing.assert_allclose(wave[0], x / 32768.0, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.training import create_train_state
    from speech_decoding_tpu.training.checkpoint import CheckpointManager

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=8, D2=8, F=8, K=2)
    X = jnp.zeros((2, 208, 24))
    sidx = jnp.zeros((2,), jnp.int32)
    state = create_train_state(enc, jax.random.PRNGKey(0), X, sidx)

    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    mgr.save(0, state)
    mgr.save(1, state.replace(step=state.step + 7))
    mgr.wait()
    assert mgr.latest_epoch() == 1

    blank = create_train_state(enc, jax.random.PRNGKey(1), X, sidx)
    restored, epoch = mgr.restore(blank)
    assert epoch == 1
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.params["clip"]["temp"]),
        np.asarray(state.params["clip"]["temp"]),
    )
    # params restored from the epoch-1 save, not the blank init
    p0 = state.params["encoder"]["subject_block"]["subject_kernel"]
    pr = restored.params["encoder"]["subject_block"]["subject_kernel"]
    np.testing.assert_allclose(np.asarray(pr), np.asarray(p0))


@pytest.mark.slow  # fast twin: test_checkpoint_roundtrip
def test_checkpoint_best_tracking(tmp_path):
    """track_metric keeps the best-metric checkpoint independently of the
    rolling latest (restore(best=True) returns the peak epoch's state)."""
    import jax.numpy as jnp

    from speech_decoding_tpu.data.layout import ch_locations_2d
    from speech_decoding_tpu.models import BrainEncoder
    from speech_decoding_tpu.training import create_train_state
    from speech_decoding_tpu.training.checkpoint import CheckpointManager

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=8, D2=8, F=8, K=2)
    X = jnp.zeros((2, 208, 24))
    sidx = jnp.zeros((2,), jnp.int32)
    state = create_train_state(enc, jax.random.PRNGKey(0), X, sidx)

    mgr = CheckpointManager(
        str(tmp_path / "ck"), keep=2, track_metric="testTop10acc"
    )
    for epoch, acc in enumerate([0.2, 0.7, 0.4]):  # peak at epoch 1
        mgr.save(
            epoch,
            state.replace(step=state.step + epoch),
            extra={"testTop10acc": acc},
        )
    mgr.wait()
    assert mgr.latest_epoch() == 2
    assert mgr.best_epoch() == 1

    blank = create_train_state(enc, jax.random.PRNGKey(1), X, sidx)
    restored, epoch = mgr.restore(blank, best=True)
    assert epoch == 1 and int(restored.step) == 1
    latest, epoch = mgr.restore(blank)
    assert epoch == 2 and int(latest.step) == 2


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        t.start()
        t.stop(items=4)
    s = t.summary(items_per_step=4)
    assert s["steps"] == 5
    assert s["items_per_sec"] > 0
