#!/usr/bin/env python
"""Precompute and cache the 2-D sensor layouts with MNE (run in an
environment with mne / mne_bids + the raw data; training then needs neither).

    python tools/precompute_layout.py Brennan2018 [root_dir]
    python tools/precompute_layout.py Gwilliams2022 [root_dir]

Writes {root_dir}/data/{dataset}/layout_2d.npz (loc + source="mne"
provenance) — the exact reference geometry
[ref: speech_decoding/utils/layout.py:6-43]. An existing fallback-provenance
cache is upgraded in place; a legacy .npy cache is replaced.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_decoding_tpu.data.layout import (
    NUM_CHANNELS,
    _normalize,
    _try_mne,
    _write_cache,
)


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "Brennan2018"
    root = sys.argv[2] if len(sys.argv) > 2 else "."
    loc = _try_mne(dataset, root)
    if loc is None:
        raise SystemExit("MNE (and mne_bids for Gwilliams2022) must be installed")
    import numpy as np

    loc = _normalize(np.asarray(loc, np.float64))
    assert loc.shape == (NUM_CHANNELS[dataset], 2), loc.shape
    cache_dir = os.path.join(root, "data", dataset)
    if not _write_cache(cache_dir, loc, "mne"):
        raise SystemExit(f"FAILED to write layout cache under {cache_dir}")
    print(f"wrote {os.path.join(cache_dir, 'layout_2d.npz')} {loc.shape} source=mne")


if __name__ == "__main__":
    main()
