"""Native gather library: correctness vs numpy, baseline fusion, prefetcher
ordering and error propagation."""

import numpy as np
import pytest

from speech_decoding_tpu.data.native_loader import Prefetcher, gather_segments, get_lib


@pytest.fixture(scope="module")
def sources(rng):
    return [
        np.ascontiguousarray(rng.normal(size=(8, 500)).astype(np.float32))
        for _ in range(6)
    ]


def test_library_builds():
    assert get_lib() is not None, "g++ available in this image; build must succeed"


def test_gather_matches_numpy(sources):
    onsets = [3, 100, 250, 0, 440, 17]
    out = gather_segments(sources, onsets, seq_len=60)
    for b, (src, on) in enumerate(zip(sources, onsets)):
        np.testing.assert_array_equal(out[b], src[:, on : on + 60])


def test_gather_with_baseline(sources):
    onsets = [0, 10, 20, 30, 40, 50]
    out = gather_segments(sources, onsets, seq_len=60, baseline_len=20)
    for b, (src, on) in enumerate(zip(sources, onsets)):
        win = src[:, on : on + 60]
        expected = win - win[:, :20].mean(-1, keepdims=True)
        np.testing.assert_allclose(out[b], expected, rtol=1e-5, atol=1e-6)


def test_prefetcher_order_and_transform():
    items = list(range(20))
    pf = Prefetcher(iter(items), transform=lambda x: x * 2, depth=3)
    assert list(pf) == [x * 2 for x in items]


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    pf = Prefetcher(gen())
    it = iter(pf)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetcher_shuts_down_on_early_consumer_exit():
    """A consumer that stops iterating early (break / exception) must release
    the producer thread — it used to block forever on the bounded queue,
    pinning in-flight batches and the source iterator for the process
    lifetime."""
    import time

    closed = {"v": False}

    def gen():
        try:
            for i in range(1000):
                yield i
        finally:
            closed["v"] = True

    pf = Prefetcher(gen(), depth=2)
    for x in pf:
        if x >= 3:
            break  # abandon mid-stream
    pf._thread.join(timeout=5.0)
    assert not pf._thread.is_alive()
    assert closed["v"], "source iterator was not closed"

    # and an exception inside the consumer loop does the same
    pf2 = Prefetcher(iter(range(1000)), depth=2)
    with pytest.raises(ValueError):
        for x in pf2:
            raise ValueError("consumer failed")
    pf2._thread.join(timeout=5.0)
    assert not pf2._thread.is_alive()
    # close() is idempotent
    pf2.close()
    time.sleep(0)  # no deadlock / no error
