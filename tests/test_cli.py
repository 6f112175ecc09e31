"""End-to-end CLI tests: build caches with the tiny wav2vec, then drive
train.run(args) for both datasets on fixture data — epoch loop, eval,
checkpointing, resume."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fixtures
import train as train_cli


def _common_overrides(cfg):
    cfg.epochs = 2
    cfg.batch_size = 4
    cfg.updates = 3
    cfg.D1 = 16
    cfg.D2 = 16
    cfg.K = 4
    cfg.F = 16
    cfg.preprocs.last4layers = False  # F=16 (tiny w2v feature dim)
    cfg.set_path("tpu.compute_dtype", "float32")
    cfg.set_path("checkpoint.keep", 2)
    # shared dir => auto-resume across run() calls (the default is a fresh
    # per-run outputs/ dir, covered by test_run_dir_isolation)
    cfg.set_path("checkpoint.dir", "checkpoints")
    return cfg


@pytest.fixture(scope="module")
def w2v():
    return fixtures.tiny_wav2vec()


@pytest.mark.slow  # fast twins: test_gwilliams_cli_and_resume (CLI e2e), test_data Brennan build
def test_brennan_cli_end_to_end(tmp_path, w2v):
    root = str(tmp_path)
    fixtures.make_brennan_tree(root, eeg_secs=30.0, audio_secs=30.0)
    cfg = _common_overrides(fixtures.make_config(root, "Brennan2018"))
    # batch_size 2 -> accumulate_steps 3: the checkpoint's opt_state is a
    # MultiSteps wrapper, which evaluate's restore must tolerate (it
    # restores params/stats only)
    cfg.batch_size = 2

    # pre-build caches with the tiny wav2vec (no network)
    from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset

    build_cfg = cfg.copy()
    build_cfg.root_dir = root
    build_cfg.rebuild_dataset = True
    Brennan2018Dataset(build_cfg, wav2vec=w2v)

    hist = train_cli.run(cfg)
    ckpt_dir = os.path.join(root, "checkpoints")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # tools/evaluate.py must reproduce the training-time eval of the saved
    # state: same split pools, same fixed test batch (seed+1), same metrics
    from tools.evaluate import evaluate

    out = evaluate(cfg.copy())
    assert out["epoch"] == hist[-1]["epoch"]
    assert out["test_segments"] > 0
    assert out["test_loss"] == pytest.approx(hist[-1]["test_loss"], rel=1e-4)
    assert out["testTop1acc"] == pytest.approx(hist[-1]["testTop1acc"], abs=1e-6)
    assert out["testTop10acc"] == pytest.approx(hist[-1]["testTop10acc"], abs=1e-6)

    # best-checkpoint restore: the tracked best epoch's metrics, not the last
    best_cfg = cfg.copy()
    best_cfg.set_path("eval.best", True)
    out_best = evaluate(best_cfg)
    best_val = max(h["testTop10acc"] for h in hist)
    # ties possible on tiny pools — any argmax epoch is a valid "best"
    best_epochs = [h["epoch"] for h in hist if h["testTop10acc"] == best_val]
    assert out_best["epoch"] in best_epochs
    assert out_best["testTop10acc"] == pytest.approx(best_val, abs=1e-6)


def test_gwilliams_cli_and_resume(tmp_path, w2v):
    root = str(tmp_path)
    fixtures.make_gwilliams_tree(root)
    cfg = _common_overrides(fixtures.make_config(root, "Gwilliams2022"))
    cfg.split_mode = "shallow"
    cfg.set_path("gwilliams.num_subjects", 2)
    cfg.set_path("gwilliams.num_sessions", 2)
    cfg.set_path("gwilliams.num_tasks", 2)

    from speech_decoding_tpu.data.gwilliams2022 import Gwilliams2022ShallowSplit

    build_cfg = cfg.copy()
    build_cfg.rebuild_dataset = True
    Gwilliams2022ShallowSplit(
        build_cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
    )

    train_cli.run(cfg)
    ckpt_dir = os.path.join(root, "checkpoints")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # resume: runs epochs 2.. from the checkpoint
    cfg2 = cfg.copy()
    cfg2.epochs = 3
    train_cli.run(cfg2)

    # default (no checkpoint.dir): fresh isolated run dir with a resolved
    # config snapshot — two runs never collide [ref: config.yaml:51-54]
    cfg3 = cfg.copy()
    del cfg3["checkpoint"]["dir"]
    train_cli.run(cfg3)
    outputs = os.path.join(root, "outputs")
    assert os.path.isdir(outputs)
    run_dirs = [
        os.path.join(dp, d)
        for dp, dns, _ in os.walk(outputs)
        for d in dns
        if os.path.isfile(os.path.join(dp, d, "config.yaml"))
    ]
    assert len(run_dirs) == 1, run_dirs
    assert os.listdir(os.path.join(run_dirs[0], "checkpoints"))


@pytest.mark.slow  # fast twins: test_gwilliams_cli_and_resume + test_data device-resident units
def test_gwilliams_device_resident(tmp_path, w2v):
    """Full CLI run with the device-resident data path (indices-only steps)."""
    root = str(tmp_path)
    fixtures.make_gwilliams_tree(root)
    cfg = _common_overrides(fixtures.make_config(root, "Gwilliams2022"))
    cfg.split_mode = "shallow"
    cfg.set_path("gwilliams.num_subjects", 2)
    cfg.set_path("gwilliams.num_sessions", 2)
    cfg.set_path("gwilliams.num_tasks", 2)
    cfg.set_path("tpu.device_resident_data", True)
    cfg.set_path("tpu.scan_steps", 2)
    cfg.updates = 4

    from speech_decoding_tpu.data.gwilliams2022 import Gwilliams2022ShallowSplit

    build_cfg = cfg.copy()
    build_cfg.rebuild_dataset = True
    Gwilliams2022ShallowSplit(
        build_cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
    )
    hist = train_cli.run(cfg)
    assert os.listdir(os.path.join(root, "checkpoints"))

    # evaluate must reproduce the training-time eval even though the run
    # trained channels-last on device-resident data: the param tree is
    # layout-independent and the host sample_batch draws the identical
    # session choices (same rng stream as the device-index path)
    from tools.evaluate import evaluate

    out = evaluate(cfg.copy())
    assert out["epoch"] == hist[-1]["epoch"]
    assert out["test_loss"] == pytest.approx(hist[-1]["test_loss"], rel=2e-4)
    assert out["testTop10acc"] == pytest.approx(hist[-1]["testTop10acc"], abs=1e-6)


@pytest.mark.slow  # fast twin: test_train.py::test_preemption_mid_epoch_checkpoint
def test_preemption_drill_and_resume(tmp_path, w2v):
    """Fault-injection drill through the CLI: tpu.preempt_after_steps
    self-delivers a real SIGTERM mid-epoch; the run checkpoints, exits
    cleanly after the interrupted epoch, and a plain rerun resumes from the
    next epoch and completes."""
    root = str(tmp_path)
    fixtures.make_brennan_tree(root, eeg_secs=30.0, audio_secs=30.0)
    cfg = _common_overrides(fixtures.make_config(root, "Brennan2018"))
    cfg.epochs = 3

    from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset

    build_cfg = cfg.copy()
    build_cfg.root_dir = root
    build_cfg.rebuild_dataset = True
    Brennan2018Dataset(build_cfg, wav2vec=w2v)

    drill = cfg.copy()
    drill.set_path("tpu.preempt_after_steps", 2)
    hist = train_cli.run(drill)
    assert len(hist) == 1 and hist[0]["epoch"] == 0
    assert "test_loss" not in hist[0]  # eval skipped mid-preemption
    ckpt_dir = os.path.join(root, "checkpoints")
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

    # plain rerun: resumes at epoch 1 and finishes the remaining epochs
    hist2 = train_cli.run(cfg.copy())
    assert [h["epoch"] for h in hist2] == [1, 2]
    assert "test_loss" in hist2[-1]
