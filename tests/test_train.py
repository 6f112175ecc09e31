"""End-to-end training smoke tests on synthetic data: loss decreases, the
model can overfit a small fixed batch, and gradient accumulation steps only
every k batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_decoding_tpu.data.layout import ch_locations_2d
from speech_decoding_tpu.models import BrainEncoder
from speech_decoding_tpu.training import create_train_state, make_eval_step, make_train_step

B, C, T, F = 8, 208, 60, 64


def _setup(accumulate_steps=1, lr=1e-3):
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=32, D2=48, F=F, K=4)
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(jax.random.PRNGKey(1), (B, C, T))
    sidx = jnp.zeros((B,), jnp.int32)
    state = create_train_state(
        enc, key, X, sidx, init_temperature=5.1, lr=lr, accumulate_steps=accumulate_steps
    )
    return enc, state, X, sidx


def test_overfit_fixed_batch():
    enc, state, X, sidx = _setup()
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    batch = {"X": X, "Y": Y, "subject_idxs": sidx}
    train_step = make_train_step(enc, donate=False)
    losses = []
    for i in range(60):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert float(metrics["top1"]) == 1.0  # memorized the batch
    # temperature is being trained too
    assert float(metrics["temp"]) != 5.1


def test_eval_step_runs_and_is_deterministic():
    enc, state, X, sidx = _setup()
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    batch = {"X": X, "Y": Y, "subject_idxs": sidx}
    eval_step = make_eval_step(enc)
    m1 = eval_step(state, batch)
    m2 = eval_step(state, batch)
    assert float(m1["loss"]) == float(m2["loss"])
    assert 0.0 <= float(m1["top10"]) <= 1.0


def test_gradient_accumulation_brennan_semantics():
    """With accumulate_steps=k, params change only after k micro-batches
    (the corrected per-epoch stepping [ref: train.py:205-209])."""
    k = 3
    enc, state, X, sidx = _setup(accumulate_steps=k)
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    batch = {"X": X, "Y": Y, "subject_idxs": sidx}
    train_step = make_train_step(enc, donate=False)
    p0 = jax.tree.map(np.asarray, state.params)
    for i in range(k - 1):
        state, _ = train_step(state, batch, jax.random.PRNGKey(i))
        same = jax.tree.map(np.array_equal, p0, jax.tree.map(np.asarray, state.params))
        assert all(jax.tree.leaves(same)), f"params moved early at micro-step {i}"
    state, _ = train_step(state, batch, jax.random.PRNGKey(99))
    same = jax.tree.map(np.array_equal, p0, jax.tree.map(np.asarray, state.params))
    assert not all(jax.tree.leaves(same)), "params did not move after k micro-steps"


def test_collate_inside_step():
    enc, state, X, sidx = _setup()
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    batch = {"X": X * 50.0 + 7.0, "Y": Y, "subject_idxs": sidx}
    collate = {"baseline_len_samp": 10, "clamp_lim": 20.0, "clamp": True}
    train_step = make_train_step(enc, collate=collate, donate=False)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_legacy_last_batch_only(tmp_path):
    """The compat mode steps params only from the last batch of an epoch
    (reference train.py:205-209 quirk)."""
    from speech_decoding_tpu.config import load_config
    from speech_decoding_tpu.training.trainer import Trainer

    enc, state, X, sidx = _setup()
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    batch = {"X": np.asarray(X), "Y": np.asarray(Y), "subject_idxs": np.asarray(sidx)}

    cfg = load_config()
    cfg.set_path("tpu.brennan_legacy_accumulation", True)
    cfg.set_path("tpu.compute_dtype", "float32")
    cfg.epochs = 1
    trainer = Trainer(enc, cfg, batch)
    p0 = jax.tree.map(np.asarray, trainer.state.params)
    out = trainer.run_epoch(0, [batch, batch, batch], None)
    assert np.isfinite(out["train_loss"])
    # params moved exactly once (from the last batch); step counter == 1
    assert int(trainer.state.step) == 1
    same = jax.tree.map(
        np.array_equal, p0, jax.tree.map(np.asarray, trainer.state.params)
    )
    assert not all(jax.tree.leaves(same))


def test_scan_steps_match_single_steps():
    """k scanned steps == k sequential single steps (same keys/batches)."""
    from speech_decoding_tpu.training import make_train_step_scan

    enc, state, X, sidx = _setup()
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    base_key = jax.random.PRNGKey(9)
    k = 3
    batches = {
        "X": jnp.stack([X + i for i in range(k)]),
        "Y": jnp.stack([Y] * k),
        "subject_idxs": jnp.stack([sidx] * k),
    }

    single = make_train_step(enc, donate=False)
    s1 = state
    losses = []
    for i in range(k):
        b = {kk: v[i] for kk, v in batches.items()}
        s1, m = single(s1, b, base_key)
        losses.append(float(m["loss"]))

    scan = make_train_step_scan(enc, donate=False)
    s2, ms = scan(state, batches, base_key)
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2.params["clip"]["temp"]),
        np.asarray(s1.params["clip"]["temp"]),
        rtol=1e-6,
    )
    # param trees agree up to fp-reassociation drift amplified by Adam's
    # normalization (losses above already match to ~1e-5)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=0.02)


@pytest.mark.slow  # fast twin: test_scan_steps_match_single_steps
def test_trainer_scan_mode_epoch():
    """Trainer with tpu.scan_steps=2 over 5 batches: 2 scanned groups + 1
    single remainder; 5 optimizer steps total, 5 metric entries."""
    from speech_decoding_tpu.config import load_config
    from speech_decoding_tpu.training.trainer import Trainer

    enc, state, X, sidx = _setup()
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    batch = {"X": np.asarray(X), "Y": np.asarray(Y), "subject_idxs": np.asarray(sidx)}

    cfg = load_config()
    cfg.set_path("tpu.scan_steps", 2)
    cfg.set_path("tpu.compute_dtype", "float32")
    trainer = Trainer(enc, cfg, batch)
    out = trainer.run_epoch(0, [dict(batch) for _ in range(5)], None)
    assert int(trainer.state.step) == 5
    assert np.isfinite(out["train_loss"])


def test_chunked_eval_matches_full_eval():
    """Chunked full-test eval == one-shot eval (incl. a padded tail chunk)."""
    from speech_decoding_tpu.training.steps import make_chunked_eval

    enc, state, X, sidx = _setup()
    B2 = 11  # not a multiple of the chunk size -> exercises tail padding
    X2 = jax.random.normal(jax.random.PRNGKey(5), (B2, C, T))
    Y2 = jax.random.normal(jax.random.PRNGKey(6), (B2, F, T))
    batch = {"X": X2, "Y": Y2, "subject_idxs": jnp.zeros((B2,), jnp.int32)}

    full = make_eval_step(enc)(state, batch)
    chunked = make_chunked_eval(enc, chunk_size=4)(state, batch)
    assert abs(float(full["loss"]) - float(chunked["loss"])) < 1e-4
    assert float(full["top1"]) == float(chunked["top1"])
    assert float(full["top10"]) == float(chunked["top10"])


def test_preemption_mid_epoch_checkpoint(tmp_path):
    """A preemption request between dispatches stops the epoch, force-saves
    the mid-epoch state (bypassing the every_epochs cadence), skips eval,
    and a fresh Trainer resumes from it with the step counter intact."""
    from speech_decoding_tpu.config import load_config
    from speech_decoding_tpu.training.checkpoint import CheckpointManager
    from speech_decoding_tpu.training.preemption import PreemptionGuard
    from speech_decoding_tpu.training.trainer import Trainer

    enc, _, X, sidx = _setup()
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    batch = {"X": np.asarray(X), "Y": np.asarray(Y), "subject_idxs": np.asarray(sidx)}

    def make_cfg():
        cfg = load_config()
        cfg.set_path("tpu.compute_dtype", "float32")
        cfg.set_path("tpu.scan_steps", 1)
        cfg.epochs = 1
        return cfg

    ckpts = CheckpointManager(str(tmp_path / "ck"), every_epochs=100)
    trainer = Trainer(enc, make_cfg(), batch, checkpoints=ckpts)
    # not installed (no signal handler): step_tick flags directly after 2 steps
    trainer.preemption = PreemptionGuard(inject_after_steps=2)

    out = trainer.run_epoch(0, [dict(batch) for _ in range(6)], batch)
    assert trainer.preempted
    assert "test_loss" not in out  # eval skipped on preemption
    assert np.isfinite(out["train_loss"])
    assert int(trainer.state.step) == 2  # stopped after exactly 2 dispatches
    ckpts.wait()
    assert ckpts.latest_epoch() == 0  # force-saved despite every_epochs=100

    trainer2 = Trainer(enc, make_cfg(), batch, checkpoints=ckpts)
    assert trainer2.start_epoch == 1
    assert int(trainer2.state.step) == 2
    same = jax.tree.map(
        np.array_equal,
        jax.tree.map(np.asarray, trainer.state.params),
        jax.tree.map(np.asarray, trainer2.state.params),
    )
    assert all(jax.tree.leaves(same))


def test_preemption_guard_signal_roundtrip():
    """Installed guard turns a real SIGTERM into a flag (process survives)
    and uninstall restores the previous handler."""
    import os
    import signal

    from speech_decoding_tpu.training.preemption import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.requested
    assert signal.getsignal(signal.SIGTERM) is before


def test_preempt_multihost_agreement_cadence(tmp_path):
    """Multi-host agreement must fire even when epochs are shorter than the
    sync cadence: the dispatch counter is monotonic across epochs and the
    epoch-end sync point forces an agreement check (regression: a per-epoch
    index never reached the cadence, leaving the guard silently inert)."""
    from speech_decoding_tpu.config import load_config
    from speech_decoding_tpu.training.preemption import PreemptionGuard
    from speech_decoding_tpu.training.trainer import Trainer

    enc, _, X, sidx = _setup()
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    batch = {"X": np.asarray(X), "Y": np.asarray(Y), "subject_idxs": np.asarray(sidx)}
    cfg = load_config()
    cfg.set_path("tpu.compute_dtype", "float32")
    cfg.set_path("tpu.scan_steps", 1)

    def flagged_trainer():
        t = Trainer(enc, cfg, batch)
        # exercise the agreement path (process_allgather is a no-op gather
        # with one process, but the cadence/sync control flow is identical)
        t.multihost = True
        t.preemption = PreemptionGuard()
        t.preemption.request()
        return t

    # epoch-end sync acts on the flag even with 3 dispatches/epoch < cadence
    t = flagged_trainer()
    for _ in range(3):
        assert not t._preempt_check()  # below cadence: deferred
    assert t._preempt_check(sync=True)
    assert t.preempted

    # monotonic counter: the cadence is crossed ACROSS epochs (dispatch 25)
    t = flagged_trainer()
    for _ in range(24):
        assert not t._preempt_check()
    assert t._preempt_check()
    assert t.preempted
