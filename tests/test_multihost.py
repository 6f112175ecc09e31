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
