"""ctypes bindings for the native batch-assembly library (native/
segment_gather.cpp) plus a host prefetcher that overlaps batch assembly and
host->device transfer with device compute.

Replaces the reference's 6-worker DataLoader processes
[ref: speech_decoding/utils/get_dataloaders.py:70-85] with: multithreaded C++
window gathers (ctypes releases the GIL) + a single Python prefetch thread
double-buffering device batches. Falls back to pure numpy when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from speech_decoding_tpu.utils.logging import cprint

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libsegment_gather.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "segment_gather.cpp")

_lib = None
_lib_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", _SO_PATH, _SRC_PATH, "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        cprint(f"native gather build failed ({e}); using numpy fallback", "yellow")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library; None -> numpy fallback."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    # rebuild only when the source is present AND newer; a prebuilt .so
    # without its .cpp (built-artifact-only deployments) loads as-is
    have_src = os.path.exists(_SRC_PATH)
    if not os.path.exists(_SO_PATH) or (
        have_src and os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
    ):
        if not have_src:
            cprint("native gather source and .so both missing; numpy fallback", "yellow")
            return None
        if not _build():
            return None
    lib = ctypes.CDLL(_SO_PATH)
    PP = ctypes.POINTER(ctypes.c_float)
    for name, extra in [
        ("sd_gather_segments", []),
        ("sd_gather_segments_baseline", [ctypes.c_int64]),
    ]:
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(PP),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            *extra,
            PP,
            ctypes.c_int,
        ]
    _lib = lib
    return _lib


def gather_segments(
    sources: Sequence[np.ndarray],
    onsets: Sequence[int],
    seq_len: int,
    baseline_len: int = 0,
    num_threads: int = 0,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """out[b] = sources[b][:, onsets[b]:onsets[b]+seq_len] (optionally
    baseline-corrected over the first baseline_len samples). Sources must be
    C-contiguous float32 (C, T_b) arrays."""
    B = len(sources)
    C = sources[0].shape[0]
    # reference baseline slice `win[..., :baseline_len]` clips to the window
    # [ref: brennan2018.py:140]; clamp so the native kernel never reads past it
    baseline_len = min(baseline_len, seq_len)
    if out is None:
        out = np.empty((B, C, seq_len), np.float32)
    lib = get_lib()
    if lib is None:
        for b, (src, on) in enumerate(zip(sources, onsets)):
            win = src[:, on : on + seq_len]
            if baseline_len:
                win = win - win[:, :baseline_len].mean(-1, keepdims=True)
            out[b] = win
        return out

    PP = ctypes.POINTER(ctypes.c_float)
    ptrs = (PP * B)()
    Ts = (ctypes.c_int64 * B)()
    ons = (ctypes.c_int64 * B)()
    sources = [
        s if (s.dtype == np.float32 and s.flags["C_CONTIGUOUS"])
        else np.ascontiguousarray(s, np.float32)
        for s in sources
    ]
    for b, src in enumerate(sources):
        assert src.shape[0] == C
        ptrs[b] = src.ctypes.data_as(PP)
        Ts[b] = src.shape[1]
        ons[b] = int(onsets[b])
    out_p = out.ctypes.data_as(PP)
    if baseline_len:
        lib.sd_gather_segments_baseline(
            ptrs, Ts, ons, B, C, seq_len, baseline_len, out_p, num_threads
        )
    else:
        lib.sd_gather_segments(ptrs, Ts, ons, B, C, seq_len, out_p, num_threads)
    return out


class Prefetcher:
    """Runs a batch-producing iterator in a background thread, keeping up to
    ``depth`` ready batches (optionally already device_put via ``transform``).
    The GIL is released during the native gather and the device transfer, so
    production overlaps device compute."""

    def __init__(
        self,
        batch_iter: Iterator,
        transform: Optional[Callable] = None,
        depth: int = 2,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._transform = transform
        self._done = object()
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def put(item) -> bool:
            # stop-aware bounded put: an abandoned consumer would otherwise
            # leave this thread blocked forever, pinning ``depth`` device
            # batches and the source iterator for the process lifetime
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False

        def run():
            try:
                for item in batch_iter:
                    if self._stop.is_set():
                        break
                    if not put(self._transform(item) if self._transform else item):
                        break
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                if hasattr(batch_iter, "close"):
                    try:
                        batch_iter.close()
                    except Exception:
                        pass
                put(self._done)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the producer and release queued batches. Idempotent; called
        automatically when the consuming iterator exits (normally or not)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):
        self._stop.set()

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is self._done:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()
