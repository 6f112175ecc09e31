"""Micro-batching HTTP serving: correctness vs direct decode, padding
inertness, request coalescing, chunking past max_batch, and the error
surface."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_decoding_tpu.data.layout import ch_locations_2d
from speech_decoding_tpu.inference import SpeechDecoder
from speech_decoding_tpu.models import BrainEncoder
from speech_decoding_tpu.serving import DecoderServer, MicroBatcher, decode_request
from speech_decoding_tpu.training import create_train_state

C, T, F, BANK_N = 208, 30, 16, 24


@pytest.fixture(scope="module")
def decoder():
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=3, loc=loc, D1=16, D2=16, F=F, K=4)
    X0 = jnp.zeros((2, C, T), jnp.float32)
    state = create_train_state(enc, jax.random.PRNGKey(0), X0, jnp.zeros((2,), jnp.int32))
    dec = SpeechDecoder(enc, state.params["encoder"], state.batch_stats)
    bank = np.random.default_rng(7).normal(size=(BANK_N, F, T)).astype(np.float32)
    dec.set_bank(jnp.asarray(bank))
    return dec


@pytest.fixture(scope="module")
def server(decoder):
    srv = DecoderServer(
        decoder, segment_shape=(C, T), max_batch=8, max_wait_ms=150.0
    ).start()
    yield srv
    srv.shutdown()


def _batch(rng, b):
    return (
        rng.normal(size=(b, C, T)).astype(np.float32),
        rng.integers(0, 3, size=b).astype(np.int32),
    )


def test_padded_rows_do_not_change_results(decoder):
    """The micro-batcher pads every dispatch to max_batch rows; each row's
    result must be independent of its batch neighbours (eval-mode BN, row-
    local ops). Direct decode of 3 rows == those rows inside a padded 8."""
    rng = np.random.default_rng(0)
    X, sidx = _batch(rng, 3)
    direct_s, direct_i = decoder.decode(X, sidx, k=5)

    mb = MicroBatcher(decoder, (C, T), max_batch=8, max_wait_ms=1.0)
    s, i = mb.submit(X, sidx, k=5)
    mb.close()
    np.testing.assert_array_equal(i, direct_i)
    np.testing.assert_allclose(s, direct_s, atol=1e-5)


def test_http_decode_roundtrip(server, decoder):
    rng = np.random.default_rng(1)
    X, sidx = _batch(rng, 4)
    s, i = decode_request(server.host, server.port, X, sidx, k=3)
    ds, di = decoder.decode(X, sidx, k=3)
    assert s.shape == (4, 3) and i.dtype == np.int32
    np.testing.assert_array_equal(i, di)
    np.testing.assert_allclose(s, ds, atol=1e-5)


def test_concurrent_requests_coalesce(server, decoder):
    """8 concurrent single-row requests land in far fewer than 8 device
    dispatches (the whole point of micro-batching) and every caller gets
    its own row back."""
    rng = np.random.default_rng(2)
    X, sidx = _batch(rng, 8)
    ds, di = decoder.decode(X, sidx, k=4)

    before = server.batcher.dispatches
    results = [None] * 8

    def call(j):
        results[j] = decode_request(
            server.host, server.port, X[j : j + 1], sidx[j : j + 1], k=4
        )

    threads = [threading.Thread(target=call, args=(j,)) for j in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for j, (s, i) in enumerate(results):
        np.testing.assert_array_equal(i[0], di[j])
        np.testing.assert_allclose(s[0], ds[j], atol=1e-5)
    # 8 rows, max_batch=8, 150 ms window: well under one dispatch per request
    assert server.batcher.dispatches - before <= 4


def test_oversize_request_chunks(server, decoder):
    """A request larger than max_batch spans multiple fixed-shape dispatches
    and reassembles in order."""
    rng = np.random.default_rng(3)
    X, sidx = _batch(rng, 19)  # max_batch=8 -> 3 chunks incl. padded tail
    s, i = decode_request(server.host, server.port, X, sidx, k=2)
    ds, di = decoder.decode(X, sidx, k=2)
    np.testing.assert_array_equal(i, di)
    np.testing.assert_allclose(s, ds, atol=1e-5)


def test_health_stats_and_errors(server):
    with urllib.request.urlopen(
        f"http://{server.host}:{server.port}/healthz"
    ) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["bank_segments"] == BANK_N
    assert h["segment_shape"] == [C, T]

    with urllib.request.urlopen(f"http://{server.host}:{server.port}/stats") as r:
        st = json.loads(r.read())
    assert st["rows"] >= 1 and st["dispatches"] >= 1
    assert st["rows_per_dispatch"] > 0

    # wrong shape -> 400 with a useful message, not a hung request
    buf = io.BytesIO()
    np.savez(
        buf,
        X=np.zeros((2, C + 1, T), np.float32),
        subject_idxs=np.zeros(2, np.int32),
    )
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/decode",
        data=buf.getvalue(),
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 400
    assert "must be (B, C, T)" in json.loads(exc.value.read())["error"]


def test_concurrent_latency_p99_bounded():
    """Latency SLO under concurrent single-row load: with a fixed 50 ms
    dispatch cost, coalescing must keep p99 request latency near a few
    dispatch windows — NOT the serialized one-dispatch-per-request regime
    (64 requests x 50 ms = 3.2 s; a p99 above ~1.5 s means rows are being
    dispatched one at a time). Deterministic twin of bench.py's
    bench_serve_latency (which measures the same path on the real chip)."""
    import time

    class _Slow:
        def decode(self, X, sidx, k=10):
            time.sleep(0.05)
            b = X.shape[0]
            return np.zeros((b, k), np.float32), np.zeros((b, k), np.int32)

    mb = MicroBatcher(_Slow(), (C, T), max_batch=8, max_wait_ms=20.0)
    lat_ms, lock = [], threading.Lock()
    X1 = np.zeros((1, C, T), np.float32)
    s1 = np.zeros(1, np.int32)

    def client():
        out = []
        for _ in range(4):
            t0 = time.perf_counter()
            mb.submit(X1, s1, k=3)
            out.append((time.perf_counter() - t0) * 1e3)
        with lock:
            lat_ms.extend(out)

    threads = [threading.Thread(target=client) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    rows_per_dispatch = mb.rows / max(mb.dispatches, 1)
    mb.close()
    p99 = float(np.percentile(np.asarray(lat_ms), 99))
    assert p99 < 1500.0, f"p99 {p99:.0f} ms — coalescing is not amortizing dispatches"
    assert rows_per_dispatch >= 3.0, rows_per_dispatch


def test_healthz_counts_int8_bank_rows(decoder):
    """Regression (round-5): the int8 bank became flat (N, D) rows when the
    packed (n_chunks, N, CHUNK) layout was retired — /healthz must report N
    (bank segments), not D (~F*T row length)."""
    dec = SpeechDecoder(
        decoder.encoder, decoder._variables["params"],
        decoder._variables["batch_stats"],
    )
    bank = np.random.default_rng(11).normal(size=(BANK_N, F, T)).astype(np.float32)
    dec.set_bank(jnp.asarray(bank), store_dtype="int8")
    srv = DecoderServer(dec, segment_shape=(C, T), max_batch=4)
    try:
        assert srv._bank_segments() == BANK_N
    finally:
        srv._httpd.server_close()
        srv.batcher.close()


def test_serve_cli_build_decoder(tmp_path):
    """tools/serve.py's restore path: orbax checkpoint -> decoder -> served
    request matches direct decode (the CLI minus serve_forever)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.serve import build_decoder

    from speech_decoding_tpu.config import load_config
    from speech_decoding_tpu.training.checkpoint import CheckpointManager

    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=3, loc=loc, D1=16, D2=16, F=F, K=4)
    X0 = jnp.zeros((2, C, T), jnp.float32)
    state = create_train_state(
        enc, jax.random.PRNGKey(3), X0, jnp.zeros((2,), jnp.int32)
    )
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, state)
    mgr.wait()

    cfg = load_config()
    cfg.root_dir = str(tmp_path)
    cfg.D1 = cfg.D2 = 16
    cfg.K = 4
    cfg.F = F
    cfg.preprocs.last4layers = False
    cfg.set_path("checkpoint.dir", "ck")
    cfg.set_path("tpu.compute_dtype", "float32")
    cfg.set_path("tpu.channels_last_io", False)
    dec = build_decoder(cfg, num_subjects=3)

    rng = np.random.default_rng(4)
    bank = rng.normal(size=(BANK_N, F, T)).astype(np.float32)
    dec.set_bank(jnp.asarray(bank))

    srv = DecoderServer(dec, segment_shape=(C, T), max_batch=4).start()
    try:
        X, sidx = _batch(rng, 2)
        s, i = decode_request(srv.host, srv.port, X, sidx, k=3)
        ds, di = dec.decode(X, sidx, k=3)
        np.testing.assert_array_equal(i, di)
        np.testing.assert_allclose(s, ds, atol=1e-5)
    finally:
        srv.shutdown()


class _FailingDecoder:
    def decode(self, X, sidx, k=10):
        raise TypeError("boom from device")


def test_dispatch_failure_returns_500():
    """A non-ValueError failure inside the dispatch (device error, bad bank)
    surfaces as a 500 JSON response, not a dropped connection."""
    srv = DecoderServer(_FailingDecoder(), segment_shape=(C, T), max_batch=4).start()
    try:
        buf = io.BytesIO()
        np.savez(
            buf,
            X=np.zeros((1, C, T), np.float32),
            subject_idxs=np.zeros(1, np.int32),
        )
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/decode", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 500
        assert "TypeError" in json.loads(exc.value.read())["error"]
    finally:
        srv.shutdown()


def test_shutdown_unblocks_queued_requests():
    """Requests still queued behind the shutdown sentinel fail fast with
    RuntimeError instead of stranding their callers forever."""
    from concurrent.futures import Future

    from speech_decoding_tpu.serving import _SHUTDOWN

    ev = threading.Event()

    class _Blocking:
        def decode(self, X, sidx, k=10):
            ev.wait(timeout=10.0)
            b = X.shape[0]
            return np.zeros((b, k), np.float32), np.zeros((b, k), np.int32)

    mb = MicroBatcher(_Blocking(), (C, T), max_batch=1, max_wait_ms=1.0)
    X = np.zeros((1, C, T), np.float32)
    sidx = np.zeros(1, np.int32)
    fut1, fut2 = Future(), Future()
    mb._q.put((X, sidx, 2, fut1))      # dispatcher blocks inside decode
    mb._q.put(_SHUTDOWN)               # shutdown while a request is queued...
    mb._q.put((X, sidx, 2, fut2))      # ...behind the sentinel
    ev.set()
    s, _ = fut1.result(timeout=10.0)   # in-flight request completes
    assert s.shape == (1, 2)
    with pytest.raises(RuntimeError, match="shut down"):
        fut2.result(timeout=10.0)
    mb._thread.join(timeout=10.0)
    assert not mb._thread.is_alive()

def test_submit_after_close_fails_fast():
    """ADVICE fix: a submit() racing/trailing close() must raise immediately
    (MicroBatcherClosed) rather than enqueue behind the drained sentinel and
    block its caller forever."""
    from speech_decoding_tpu.serving import MicroBatcherClosed

    class _Echo:
        def decode(self, X, sidx, k=10):
            b = X.shape[0]
            return np.zeros((b, k), np.float32), np.zeros((b, k), np.int32)

    mb = MicroBatcher(_Echo(), (C, T), max_batch=2, max_wait_ms=1.0)
    mb.close()
    with pytest.raises(MicroBatcherClosed):
        mb.submit(np.zeros((1, C, T), np.float32), np.zeros(1, np.int32))


def test_oversized_payload_rejected_413():
    """Bodies above max_payload_bytes are refused with 413 before the body
    is buffered (Content-Length check; connection closed)."""

    class _Echo:
        def decode(self, X, sidx, k=10):
            b = X.shape[0]
            return np.zeros((b, k), np.float32), np.zeros((b, k), np.int32)

    srv = DecoderServer(
        _Echo(), segment_shape=(C, T), max_batch=4, max_payload_bytes=1024
    ).start()
    try:
        buf = io.BytesIO()
        np.savez(
            buf,
            X=np.zeros((2, C, T), np.float32),  # ~50 KB >> 1 KB cap
            subject_idxs=np.zeros(2, np.int32),
        )
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/decode", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 413
        assert "max_payload_bytes" in json.loads(exc.value.read())["error"]
    finally:
        srv.shutdown()


def test_graceful_drain_returns_503():
    """A request that reaches the batcher during/after shutdown gets a 503
    (retryable) rather than a generic 500, and the server still answers
    (handler threads can outlive httpd.shutdown())."""
    from speech_decoding_tpu.serving import MicroBatcherClosed

    class _Echo:
        def decode(self, X, sidx, k=10):
            b = X.shape[0]
            return np.zeros((b, k), np.float32), np.zeros((b, k), np.int32)

    srv = DecoderServer(_Echo(), segment_shape=(C, T), max_batch=4).start()
    # close only the batcher: the HTTP listener is still up, so the request
    # exercises the drain path end-to-end through the 503 mapping
    srv.batcher.close()
    try:
        buf = io.BytesIO()
        np.savez(
            buf,
            X=np.zeros((1, C, T), np.float32),
            subject_idxs=np.zeros(1, np.int32),
        )
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/decode", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 503
        body = json.loads(exc.value.read())
        assert body.get("retryable") is True
    finally:
        srv._httpd.shutdown()
        srv._httpd.server_close()


def test_clean_shutdown_joins_threads():
    """shutdown() drains and joins: dispatcher thread dead, port released."""

    class _Echo:
        def decode(self, X, sidx, k=10):
            b = X.shape[0]
            return np.zeros((b, k), np.float32), np.zeros((b, k), np.int32)

    srv = DecoderServer(_Echo(), segment_shape=(C, T), max_batch=4).start()
    X = np.zeros((1, C, T), np.float32)
    s, i = decode_request(srv.host, srv.port, X, np.zeros(1, np.int32), k=3)
    assert s.shape == (1, 3)
    srv.shutdown()
    assert not srv.batcher._thread.is_alive()
    assert srv._serve_thread is not None and not srv._serve_thread.is_alive()
    # a fresh server can immediately rebind an ephemeral port (no fd leak)
    srv2 = DecoderServer(_Echo(), segment_shape=(C, T), max_batch=4).start()
    srv2.shutdown()
