"""Import-smoke: every module in the package, every tool, bench, and the
driver entry must IMPORT cleanly.

Motivation (round-4 regression): a refactor deleted ``pack_int8_bank`` from
``speech_decoding_tpu/inference.py`` while ``bench.py``, a test, and a tool
still imported it — the breakage shipped because the full fast tier takes
tens of minutes on a 1-core harness and was not re-run after the final
diff. This test imports everything in seconds, so a deleted public symbol
can never ship silently again. Tools/bench guard their work behind
``if __name__ == "__main__"`` so importing them is side-effect free.
"""

from __future__ import annotations

import importlib
import importlib.util
import pkgutil
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

import speech_decoding_tpu  # noqa: E402


def _package_modules():
    mods = []
    for info in pkgutil.walk_packages(
        speech_decoding_tpu.__path__, prefix="speech_decoding_tpu."
    ):
        mods.append(info.name)
    return sorted(mods)


def _script_files():
    files = [REPO / "bench.py", REPO / "train.py", REPO / "__graft_entry__.py"]
    files += sorted((REPO / "tools").glob("*.py"))
    return files


@pytest.mark.parametrize("name", _package_modules())
def test_package_module_imports(name):
    importlib.import_module(name)


@pytest.mark.parametrize(
    "path", _script_files(), ids=lambda p: str(p.relative_to(REPO))
)
def test_script_imports(path, monkeypatch):
    # tools do `sys.path.insert(0, ".")`; make that resolve to the repo root.
    # Running `python tools/x.py` also puts tools/ itself on sys.path[0]
    # (sibling-tool imports rely on it) — mirror both here.
    monkeypatch.chdir(REPO)
    monkeypatch.syspath_prepend(str(REPO))
    monkeypatch.syspath_prepend(str(REPO / "tools"))
    name = f"_smoke_{path.stem}"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(name, None)
