"""Multi-host (multi-process) training test: two jax.distributed CPU
processes (2 virtual devices each -> a 4-device global mesh) run one epoch
through the REAL Trainer wiring (host-local batch shards reassembled via
jax.make_array_from_process_local_data) and must agree with each other AND
with a single-process run on the same global batches.

The reference has nothing multi-host [ref: train.py:31]; this validates the
v4-32-style data-parallel loading path (SURVEY §2.10) end-to-end.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nproc: int = 2, timeout: int = 600, ckpt_dir: str = None):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "multihost_worker.py"),
                str(i),
                str(nproc),
                str(port),
            ]
            + ([ckpt_dir] if ckpt_dir else []),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.args[-2]} failed:\n{out[-4000:]}"
    results = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-4000:]
        r = json.loads(lines[-1][len("RESULT ") :])
        results[r["pid"]] = r
    return results


@pytest.mark.slow  # spawns 2 jax.distributed processes (full tier)
def test_two_process_training_matches_single_process():
    results = _run_workers(2)
    assert set(results) == {0, 1}
    r0, r1 = results[0], results[1]

    # both processes observe the SAME global metrics (replicated outputs)
    for k in ("train_loss", "test_loss", "testTop10acc", "temp"):
        np.testing.assert_allclose(r0[k], r1[k], rtol=1e-6, err_msg=k)

    # ground truth: the identical epoch on this (single-process, 8-device
    # CPU mesh) interpreter — different device count, same global math
    from tests.multihost_worker import make_args, make_batches, make_encoder
    from speech_decoding_tpu.training.trainer import Trainer

    *train, test = make_batches()
    trainer = Trainer(make_encoder(), make_args(), train[0])
    assert not trainer.multihost
    out = trainer.run_epoch(0, iter(train), test)

    np.testing.assert_allclose(r0["train_loss"], out["train_loss"], rtol=2e-4)
    np.testing.assert_allclose(r0["test_loss"], out["test_loss"], rtol=2e-4)
    np.testing.assert_allclose(r0["temp"], out["temp"], rtol=2e-4)
    np.testing.assert_allclose(r0["testTop10acc"], out["testTop10acc"], atol=1e-9)


@pytest.mark.slow  # spawns 2 jax.distributed processes (full tier)
def test_two_process_symmetric_checkpointing(tmp_path):
    """Every process participates in the orbax save (cross-process barrier);
    the written checkpoint restores in a plain single-process context."""
    ckpt_dir = str(tmp_path / "shared_ckpts")
    results = _run_workers(2, ckpt_dir=ckpt_dir)
    assert set(results) == {0, 1}

    import jax
    from tests.multihost_worker import make_args, make_batches, make_encoder
    from speech_decoding_tpu.training.checkpoint import CheckpointManager
    from speech_decoding_tpu.training.state import create_train_state

    *train, _ = make_batches()
    enc = make_encoder()
    state = create_train_state(
        enc,
        jax.random.PRNGKey(0),
        train[0]["X"],
        train[0]["subject_idxs"],
        init_temperature=5.1,
        lr=1e-3,
    )
    mgr = CheckpointManager(ckpt_dir, track_metric="testTop10acc")
    assert mgr.latest_epoch() == 0
    assert mgr.best_epoch() == 0
    restored, epoch = mgr.restore(state)
    assert epoch == 0
    # two train batches ran -> optimizer stepped twice
    assert int(restored.step) == 2


@pytest.mark.slow  # spawns 2 jax.distributed processes (full tier)
def test_cli_two_process_end_to_end(tmp_path):
    """The documented multi-host launch recipe end-to-end: two processes run
    the REAL CLI (train.run) with tpu.multihost=True, JAX_* env vars,
    reproducible=False (shared-seed broadcast), and a shared checkpoint.dir
    on synthetic data; both must finish and the primary's checkpoint must
    exist."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import fixtures

    root = str(tmp_path)
    fixtures.make_gwilliams_tree(root)
    cfg = fixtures.make_config(root, "Gwilliams2022")
    cfg.D1 = 16
    cfg.D2 = 16
    cfg.K = 4
    cfg.F = 16
    cfg.preprocs.last4layers = False
    from speech_decoding_tpu.data.gwilliams2022 import Gwilliams2022ShallowSplit

    build_cfg = cfg.copy()
    build_cfg.rebuild_dataset = True
    Gwilliams2022ShallowSplit(
        build_cfg, wav2vec=fixtures.tiny_wav2vec(),
        num_subjects=2, num_sessions=2, num_tasks=2,
    )

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "multihost_cli_worker.py"),
                str(i), "2", str(port), root,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "RESULT" in out, out[-2000:]
    ckpts = os.path.join(root, "shared_ckpts")
    assert os.path.isdir(ckpts) and os.listdir(ckpts)


class _Args:
    """Minimal args stub exposing .select (the only Config API used)."""

    def __init__(self, multihost):
        self._mh = multihost

    def select(self, key, default=None):
        return self._mh if key == "tpu.multihost" else default


def test_multihost_flag_without_coords_fails_loudly(monkeypatch):
    """tpu.multihost=True with no coordinator env must NEVER silently run
    single-process (ADVICE r2): bare auto-detect initialize is attempted and
    failure raises instead of falling through."""
    import jax

    from speech_decoding_tpu.parallel.multihost import maybe_init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)

    def no_autodetect(*a, **k):
        raise ValueError("coordinator_address must be defined")

    monkeypatch.setattr(jax.distributed, "initialize", no_autodetect)
    with pytest.raises(RuntimeError, match="auto-detection failed"):
        maybe_init_distributed(_Args(True))


def test_multihost_flag_single_process_autodetect_fails_loudly(monkeypatch):
    """Auto-detection 'succeeding' on a single-host env (process_count=1)
    is still a misconfiguration when multihost was explicitly requested."""
    import jax

    from speech_decoding_tpu.parallel.multihost import maybe_init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: None)
    with pytest.raises(RuntimeError, match="single-process"):
        maybe_init_distributed(_Args(True))


def test_multihost_default_off_is_noop(monkeypatch):
    from speech_decoding_tpu.parallel.multihost import maybe_init_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_init_distributed(_Args(False)) is False


def _tiny_brennan(num_subjects=8, num_segments=16, C=4, L=10):
    """A Brennan2018Dataset with just the attributes sample_batch needs."""
    from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset

    ds = Brennan2018Dataset.__new__(Brennan2018Dataset)
    rng = np.random.default_rng(7)
    T = num_segments * L
    ds.X = np.ascontiguousarray(
        rng.normal(size=(num_subjects, C, T)).astype(np.float32)
    )
    ds.Y = np.ascontiguousarray(rng.normal(size=(3, T)).astype(np.float32))
    ds.num_subjects = num_subjects
    ds.num_segments = num_segments
    ds.seq_len_samp = L
    ds.segment_len = L  # == seq_len_samp outside brennan_legacy_split mode
    ds.baseline_len_samp = 2
    return ds


def test_multihost_sampling_decorrelated_and_matches_single_process():
    """VERDICT r2 weak #6: with a shared per-epoch rng, per-host internal
    draws repeat the same subject pattern in every host block. The fix draws
    the FULL global choice vector on every host and slices blocks: blocks are
    iid AND the reassembled global batch is bit-identical to single-process."""
    ds = _tiny_brennan()
    B, nhost = 16, 2
    ids = np.arange(B)
    blocks = [slice(0, B // nhost), slice(B // nhost, B)]

    # The OLD scheme (each host draws its block internally from the shared
    # stream): identical subject sequences across hosts — the defect.
    old = [ds.sample_batch(np.random.default_rng(3), ids[blk]) for blk in blocks]
    np.testing.assert_array_equal(
        old[0]["subject_idxs"], old[1]["subject_idxs"]
    )  # documents the failure mode being fixed

    # The NEW scheme (train.py multihost path): global draw, block slice.
    host_batches = []
    for blk in blocks:
        rng = np.random.default_rng(3)  # shared seed, as in train.py
        choices = ds.draw_choices(rng, B)
        host_batches.append(ds.sample_batch(rng, ids[blk], choices[blk]))
    b0, b1 = host_batches
    assert not np.array_equal(b0["subject_idxs"], b1["subject_idxs"])

    # Reassembled global batch == single-process batch from the same rng.
    single = ds.sample_batch(np.random.default_rng(3), ids)
    np.testing.assert_array_equal(
        np.concatenate([b0["subject_idxs"], b1["subject_idxs"]]),
        single["subject_idxs"],
    )
    np.testing.assert_array_equal(
        np.concatenate([b0["X"], b1["X"]]), single["X"]
    )


def test_multihost_rng_stream_position_matches_single_process():
    """After one global-draw batch, hosts and a single process are at the
    same stream position: the NEXT batch also matches."""
    ds = _tiny_brennan()
    B = 8
    ids1, ids2 = np.arange(B), np.arange(B, 2 * B) % len(ds.Y.T)

    rng_host = np.random.default_rng(11)
    choices1 = ds.draw_choices(rng_host, B)
    _ = ds.sample_batch(rng_host, ids1[:4], choices1[:4])  # host 0, batch 1
    choices2 = ds.draw_choices(rng_host, B)

    rng_single = np.random.default_rng(11)
    s1 = ds.sample_batch(rng_single, ids1)
    s2 = ds.sample_batch(rng_single, ids2)
    np.testing.assert_array_equal(choices1, s1["subject_idxs"])
    np.testing.assert_array_equal(choices2, s2["subject_idxs"])


def test_gwilliams_draw_choices_matches_internal_draw(tmp_path):
    """Gwilliams draw_choices mirrors sample_batch's per-segment scalar-draw
    pattern exactly (values AND stream position)."""
    from speech_decoding_tpu.data.gwilliams2022 import Gwilliams2022DatasetBase

    ds = Gwilliams2022DatasetBase.__new__(Gwilliams2022DatasetBase)
    ds.X = {f"s{i:02d}_sess0": {} for i in range(6)}  # only len() is used

    r1, r2 = np.random.default_rng(5), np.random.default_rng(5)
    n = 32
    a = ds.draw_choices(r1, n)
    b = np.asarray([r2.integers(len(ds.X)) for _ in range(n)])
    np.testing.assert_array_equal(a, b)
    # stream positions equal afterwards
    assert r1.integers(1 << 30) == r2.integers(1 << 30)


def test_multihost_flag_env_coords_init_failure_fails_loudly(monkeypatch):
    """Env-coords path: a swallowed initialize() failure must not demote an
    explicit tpu.multihost=True run to silent single-process."""
    import jax

    from speech_decoding_tpu.parallel.multihost import maybe_init_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")

    def fail(*a, **k):
        raise RuntimeError("unreachable coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    with pytest.raises(RuntimeError, match="did not reach"):
        maybe_init_distributed(_Args(True))


def test_env_coords_without_flag_also_fails_loudly(monkeypatch):
    """Setting the JAX_* env vars IS an explicit multi-process launch (the
    docstring's second activation mode): a swallowed init failure must fail
    loudly even when tpu.multihost is unset — otherwise each pod host
    silently demotes to an independent single-process primary."""
    import jax

    from speech_decoding_tpu.parallel.multihost import maybe_init_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")

    def fail(*a, **k):
        raise RuntimeError("unreachable coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", fail)
    with pytest.raises(RuntimeError, match="did not reach"):
        maybe_init_distributed(_Args(False))


def test_env_coords_num_processes_one_is_legitimate(monkeypatch):
    """JAX_NUM_PROCESSES=1 is the one legitimately single-process env launch
    (a pod launcher templating env vars onto a 1-host slice): no raise."""
    import jax

    from speech_decoding_tpu.parallel.multihost import maybe_init_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: None)
    assert maybe_init_distributed(_Args(False)) is False


def test_multihost_flag_tolerates_prior_launcher_init(monkeypatch):
    """A launcher that already ran jax.distributed.initialize() itself makes
    the in-run re-initialize raise; the run is still valid if the backend is
    genuinely multi-process and must NOT abort."""
    import jax

    from speech_decoding_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)

    def already(*a, **k):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    monkeypatch.setattr(multihost.jax, "process_count", lambda: 4)
    assert multihost.maybe_init_distributed(_Args(True)) is True


def test_multihost_flag_env_nproc_one_still_raises(monkeypatch):
    """tpu.multihost=True is an explicit multi-process request: even the
    otherwise-legitimate JAX_NUM_PROCESSES=1 env launch must fail loudly
    when the run stays single-process under the flag."""
    import jax

    from speech_decoding_tpu.parallel.multihost import maybe_init_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **k: None)
    with pytest.raises(RuntimeError, match="did not reach"):
        maybe_init_distributed(_Args(True))
