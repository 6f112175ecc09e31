"""Layout cache provenance: an inexact (fallback) layout is never served
silently, and a stale fallback cache never suppresses MNE once it becomes
importable [ref: speech_decoding/utils/layout.py:6-43].
"""

import os
import sys
import types

import numpy as np
import pytest

from speech_decoding_tpu.data import layout


def _fake_mne_modules(n_montage: int = 61):
    """A minimal fake `mne` implementing exactly the Brennan layout recipe."""
    rng = np.random.RandomState(0)
    pos = rng.uniform(size=(n_montage, 4))  # find_layout-style (N, 4) pos

    class _Info:
        def set_montage(self, montage):
            self.montage = montage

    class _Layout:
        def __init__(self):
            self.pos = pos

    mne = types.ModuleType("mne")
    mne.set_log_level = lambda verbose=None: None
    mne.create_info = lambda ch_names, sfreq, ch_types: _Info()
    channels = types.ModuleType("mne.channels")
    channels.make_standard_montage = lambda name: types.SimpleNamespace(
        ch_names=[f"ch{i}" for i in range(n_montage)]
    )
    channels.find_layout = lambda info, ch_type: _Layout()
    mne.channels = channels
    expected = layout._normalize(np.delete(pos[:, :2], 28, axis=0).astype(np.float64))
    return {"mne": mne, "mne.channels": channels}, expected


def test_fallback_warns_every_call_and_tags_cache(tmp_path, capsys):
    # First call: no cache, no MNE -> fallback computed, warned, tagged.
    loc1 = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    assert "NOT exact" in capsys.readouterr().out
    cache = tmp_path / "data" / "Brennan2018" / "layout_2d.npz"
    assert cache.exists()
    with np.load(cache) as z:
        assert str(z["source"]) == "fallback"

    # Second call: served FROM the fallback cache -> still warns (the round-2
    # defect was exactly this call being silent).
    loc2 = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    assert "NOT exact" in capsys.readouterr().out
    np.testing.assert_array_equal(loc1, loc2)


def test_fallback_cache_does_not_suppress_mne(tmp_path, capsys, monkeypatch):
    # Seed a fallback cache (MNE absent).
    fallback = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    capsys.readouterr()

    # MNE "appears" in the environment: the stale fallback cache must be
    # bypassed and upgraded, with no fallback warning.
    fakes, expected = _fake_mne_modules()
    for name, mod in fakes.items():
        monkeypatch.setitem(sys.modules, name, mod)
    loc = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    out = capsys.readouterr().out
    assert "NOT exact" not in out
    np.testing.assert_allclose(loc, expected.astype(np.float32), rtol=1e-6)
    assert not np.allclose(loc, fallback)
    with np.load(tmp_path / "data" / "Brennan2018" / "layout_2d.npz") as z:
        assert str(z["source"]) == "mne"

    # MNE disappears again: the upgraded cache is position-exact and is now
    # served silently.
    for name in fakes:
        monkeypatch.delitem(sys.modules, name)
    loc3 = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    assert "NOT exact" not in capsys.readouterr().out
    np.testing.assert_array_equal(loc, loc3)


def test_legacy_npy_cache_is_unknown_provenance(tmp_path, capsys):
    # A pre-round-3 cache: bare .npy with no provenance. It must be served
    # with a warning, not trusted as exact.
    cache_dir = tmp_path / "data" / "Brennan2018"
    os.makedirs(cache_dir)
    legacy = np.random.RandomState(1).uniform(0.1, 0.9, size=(60, 2)).astype(np.float32)
    np.save(cache_dir / "layout_2d.npy", legacy)

    loc = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    assert "NOT exact" in capsys.readouterr().out
    np.testing.assert_array_equal(loc, legacy)


def test_legacy_npy_upgraded_by_mne(tmp_path, capsys, monkeypatch):
    cache_dir = tmp_path / "data" / "Brennan2018"
    os.makedirs(cache_dir)
    legacy = np.random.RandomState(1).uniform(0.1, 0.9, size=(60, 2)).astype(np.float32)
    np.save(cache_dir / "layout_2d.npy", legacy)

    fakes, expected = _fake_mne_modules()
    for name, mod in fakes.items():
        monkeypatch.setitem(sys.modules, name, mod)
    loc = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    assert "NOT exact" not in capsys.readouterr().out
    np.testing.assert_allclose(loc, expected.astype(np.float32), rtol=1e-6)
    # legacy cache replaced by the tagged one
    assert not (cache_dir / "layout_2d.npy").exists()
    assert (cache_dir / "layout_2d.npz").exists()


def test_torn_cache_files_never_crash(tmp_path, capsys):
    """A torn/corrupt cache (concurrent multi-host writer, killed process) is
    'no cache', never a crash: zip-magic garbage raises BadZipFile and a
    truncated npy raises EOFError — both must fall through to recompute."""
    cache_dir = tmp_path / "data" / "Brennan2018"
    os.makedirs(cache_dir)
    # zip magic + garbage: np.load raises zipfile.BadZipFile
    (cache_dir / "layout_2d.npz").write_bytes(b"PK\x03\x04" + b"\x00" * 16)
    # truncated npy header: EOFError/ValueError
    (cache_dir / "layout_2d.npy").write_bytes(b"\x93NUMPY\x01\x00")

    loc = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    assert loc.shape == (60, 2)
    assert "NOT exact" in capsys.readouterr().out
    # the torn npz was replaced by a valid tagged cache
    with np.load(cache_dir / "layout_2d.npz") as z:
        assert str(z["source"]) == "fallback"


def test_write_cache_failure_leaks_no_tmp_files(tmp_path, monkeypatch):
    """A failed cache write (full/readonly disk mid-savez) must clean up its
    temp file and report False."""
    cache_dir = tmp_path / "cache"
    os.makedirs(cache_dir)

    def boom(f, **kw):
        f.write(b"partial")
        raise OSError("disk full")

    monkeypatch.setattr(np, "savez", boom)
    ok = layout._write_cache(
        str(cache_dir), np.zeros((60, 2), np.float32), "fallback"
    )
    assert ok is False
    assert os.listdir(cache_dir) == []  # no layout_2d.npz, no tmp leftovers


def test_mne_failure_falls_back_with_warning(tmp_path, capsys, monkeypatch):
    # MNE importable but raising (e.g. missing BIDS tree) -> fallback + warning.
    def boom(dataset, root):
        raise RuntimeError("no BIDS data")

    monkeypatch.setattr(layout, "_try_mne", boom)
    loc = layout.ch_locations_2d("Gwilliams2022", str(tmp_path))
    out = capsys.readouterr().out
    assert "falling back" in out and "NOT exact" in out
    assert loc.shape == (208, 2)


def test_wrong_shape_cache_falls_through(tmp_path, capsys):
    """A structurally valid cache holding a wrong-shape array (stale file
    from another tool/dataset) is 'no cache': recompute, don't crash."""
    cache_dir = tmp_path / "data" / "Brennan2018"
    os.makedirs(cache_dir)
    np.savez(
        cache_dir / "layout_2d.npz",
        loc=np.zeros((208, 2), np.float32),  # Gwilliams shape, not Brennan's 60
        source=np.asarray("mne"),
    )
    loc = layout.ch_locations_2d("Brennan2018", str(tmp_path))
    assert loc.shape == (60, 2)
    assert "NOT exact" in capsys.readouterr().out


def test_cache_file_is_world_readable(tmp_path):
    """mkstemp creates 0600; the shared-data-dir cache must end up 0644 or a
    different user's np.load would fail (silently, via the torn-cache
    tolerance) and silently degrade exactness."""
    cache_dir = tmp_path / "cache"
    assert layout._write_cache(str(cache_dir), np.zeros((60, 2), np.float32), "mne")
    mode = os.stat(cache_dir / "layout_2d.npz").st_mode & 0o777
    assert mode == 0o644, oct(mode)
