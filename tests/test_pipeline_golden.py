"""FULL-PIPELINE golden: raw Brennan2018 files -> the EXECUTED reference
dataset build vs ours, on an identical synthetic raw tree.

This runs /root/reference's ``Brennan2018Dataset.__init__`` end-to-end —
audio concat -> 16 kHz resample -> wav2vec last-4 average (10-chunk) ->
2.4x upsample, EEG .mat load -> subject exclusion -> trim -> band-pass ->
resample-to-embedding-length, 150 ms shift, robust scale + clamp,
segmentation, per-segment baseline correction
[ref: speech_decoding/dataclass/brennan2018.py:28-301] — and asserts the
final X segment tensors, Y embeddings, srate and segment geometry match our
pipeline's output on the SAME raw files.

Dependency substitutions (and what they mean for the evidence):
  * ``load_wav2vec_model`` is patched to a tiny random HF *torch*
    Wav2Vec2Model on both sides (no network); our pipeline consumes the SAME
    weights through ``params_from_torch``, so the Y comparison exercises the
    real torch-vs-flax wav2vec2 forward *inside* the pipeline, including the
    executed reference ``getW2VLastFourLayersAvg`` chunking code.
  * ``torchaudio.load``/``functional.resample`` and ``mne.filter.*`` are
    faked with THIS repo's DSP ops (tests/ref_fakes.py), so DSP sample values
    are shared by construction — their independent evidence is the from-spec
    firwin twin (1e-12 tap parity) and frozen goldens in tests/test_ops.py.
    What this test adds on top is everything AROUND the DSP at pipeline
    fidelity: natsort/concat semantics, the embedding-length-driven resample
    factor [ref: brennan2018.py:269-270], subject exclusion and
    trim-to-shortest, our batched filter+resample vs the reference's
    per-subject chain, shift/trim arithmetic, sklearn RobustScaler (executed)
    vs our jnp twin, clamp, split and baseline correction.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_fakes

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(ref_fakes.REFERENCE, "speech_decoding")),
        reason="reference checkout not available",
    ),
    pytest.mark.slow,  # executes the torch reference pipeline; full tier only
]

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def ref_brennan():
    """Import the reference Brennan2018Dataset with its unavailable deps
    backed by this repo's own implementations (see module docstring)."""
    snap = ref_fakes.snapshot_fakes()
    ref_fakes.install_reference_fakes()
    import importlib

    yield importlib.import_module("speech_decoding.dataclass.brennan2018")
    ref_fakes.restore_fakes(snap)


def _ref_args(root):
    ns = types.SimpleNamespace
    return ns(
        root_dir=str(root),
        wav2vec_model="<patched>",
        rebuild_dataset=False,
        preprocs=ns(
            seq_len_sec=3.0,
            baseline_len_sec=0.5,
            clamp=True,
            clamp_lim=20,
            brain_filter_low=1.0,
            brain_filter_high=60.0,
            last4layers=True,
            subject_wise=True,
        ),
    )


@pytest.fixture(scope="module")
def built(tmp_path_factory, ref_brennan):
    """Build ONE synthetic raw tree and run both full pipelines on it."""
    from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset
    from speech_decoding_tpu.data.synthetic import make_brennan_tree, make_config

    root = tmp_path_factory.mktemp("pipeline_golden")
    make_brennan_tree(str(root), n_subjects_present=3, eeg_secs=30.0, audio_secs=30.0)
    os.makedirs(os.path.join(root, "data", "Brennan2018", "Y_embeds"), exist_ok=True)

    hf, frozen = ref_fakes.tiny_w2v_pair()

    # ours ---------------------------------------------------------------
    # brennan_legacy_split replicates the executed reference's torch.split
    # chunk-size segmentation (see the flag's comment in data/brennan2018.py)
    cfg = make_config(str(root), "Brennan2018")
    cfg.preprocs["shift_len"] = 150
    cfg.preprocs["brennan_legacy_split"] = True
    ours = Brennan2018Dataset(cfg, wav2vec=frozen)

    # executed reference --------------------------------------------------
    ref_brennan.load_wav2vec_model = lambda name: hf
    with ref_fakes.legacy_torch_load():
        ref = ref_brennan.Brennan2018Dataset(_ref_args(root))
    return ours, ref, str(root)


def test_segment_geometry_matches(built):
    """The reference's ``X.split(num_segments)`` uses torch.split, whose int
    argument is a CHUNK SIZE — so the executed reference yields seq_len_samp
    segments of num_segments samples each, not num_segments seq_len windows
    [ref: brennan2018.py:89-104]. Our brennan_legacy_split mode matches it."""
    ours, ref, root = built
    assert len(ref) == ours.num_segments
    assert ref.X[0].shape[-1] == ours.segment_len
    assert ref.seq_len_samp == ours.seq_len_samp
    assert ref.baseline_len_samp == ours.baseline_len_samp
    assert ref.num_subjects == ours.num_subjects
    # srate is persisted in the reference's X cache [ref: brennan2018.py:57-64]
    with ref_fakes.legacy_torch_load():
        ref_srate = float(
            torch.load(os.path.join(root, "data", "Brennan2018", "processed_X.pt"))[
                "srate"
            ]
        )
    np.testing.assert_allclose(ref_srate, ours.srate, rtol=1e-9)


def test_audio_embeddings_match(built):
    """Y: wav load/concat -> sinc 16k -> EXECUTED getW2VLastFourLayersAvg on
    torch vs our batched flax chunks -> 2.4x upsample, then shift+trim."""
    ours, ref, _ = built
    ref_y = np.concatenate([y.numpy() for y in ref.Y], axis=-1)
    np.testing.assert_allclose(ref_y, ours.Y, rtol=2e-3, atol=2e-3)


def test_processed_eeg_segments_match(built):
    """X: the reference's eager per-segment baseline-corrected list vs our
    lazy native gather, after the full preproc/scale chain."""
    ours, ref, _ = built
    S = ours.num_subjects
    for i in range(ours.num_segments):
        got_x, _ = ours.get_segments(
            np.full(S, i, np.int64), np.arange(S, dtype=np.int64)
        )
        ref_x = ref.X[i].numpy()
        np.testing.assert_allclose(ref_x, got_x, rtol=2e-3, atol=2e-3)


def test_full_system_training_trajectory_brennan(built):
    """RAW FILES -> LOSS CURVE, Brennan branch: both frameworks run the
    reference's Brennan epoch semantics — every batch does a train-mode
    forward (BN advances) but ONLY the last batch of each epoch is
    backpropagated [ref: train.py:205-209] — for 2 epochs x 3 batches on
    batches their OWN pipelines assemble from the same raw bytes (pinned
    segment/subject draws, legacy-split segments). Losses, BN running stats
    and the temperature must track."""
    import importlib

    import jax

    import test_reference_golden as trg
    from speech_decoding_tpu.training import (
        create_train_state,
        make_train_forward_step,
        make_train_step,
    )

    ours_ds, ref_ds, _ = built
    models = importlib.import_module("speech_decoding.models")
    ref_loss_mod = importlib.import_module("speech_decoding.utils.loss")

    S = ours_ds.num_subjects
    F = ref_ds.Y[0].shape[0]
    ref_enc, our_enc, variables, _, _ = trg._make_pair(
        models, d_drop=0.0, D1=16, D2=16, F=F, K=4, S=S, dataset="Brennan2018"
    )

    EPOCHS, NB, B = 2, 3, 8
    draw = np.random.default_rng(21)
    seg_draws = [
        [draw.choice(ours_ds.num_segments, size=B, replace=False) for _ in range(NB)]
        for _ in range(EPOCHS)
    ]
    subj_draws = [
        [draw.integers(0, S, size=B) for _ in range(NB)] for _ in range(EPOCHS)
    ]

    # --- torch: the executed Brennan epoch loop on ITS dataset ---
    largs = types.SimpleNamespace(reduction="mean", init_temperature=5.1)
    ref_loss = ref_loss_mod.CLIPLoss(largs)
    opt = torch.optim.Adam(
        list(ref_enc.parameters()) + list(ref_loss.parameters()), lr=3e-4
    )
    ref_enc.train()
    ref_losses = []
    for e in range(EPOCHS):
        loss = None
        for k in range(NB):
            X_b = torch.stack(
                [ref_ds.X[int(i)][int(s)] for i, s in zip(seg_draws[e][k], subj_draws[e][k])]
            )
            Y_b = torch.stack([ref_ds.Y[int(i)] for i in seg_draws[e][k]])
            Z = ref_enc(X_b, torch.from_numpy(subj_draws[e][k]))
            loss = ref_loss(Y_b, Z)
            ref_losses.append(float(loss))
        opt.zero_grad()
        loss.backward()  # ONLY the last batch — the reference quirk
        opt.step()

    # --- ours: same draws through OUR pipeline, legacy-accumulation steps ---
    first = ours_ds.sample_batch(
        np.random.default_rng(0), seg_draws[0][0], choices=subj_draws[0][0]
    )
    state = create_train_state(
        our_enc, jax.random.PRNGKey(9), first["X"], first["subject_idxs"],
        init_temperature=5.1, lr=3e-4,
    )
    state = state.replace(
        params={"encoder": variables["params"], "clip": state.params["clip"]},
        batch_stats=variables["batch_stats"],
    )
    fwd_step = make_train_forward_step(our_enc)
    train_step = make_train_step(our_enc, donate=False)
    our_losses = []
    for e in range(EPOCHS):
        for k in range(NB):
            batch = ours_ds.sample_batch(
                np.random.default_rng(0), seg_draws[e][k], choices=subj_draws[e][k]
            )
            step_fn = train_step if k == NB - 1 else fwd_step
            state, m = step_fn(state, batch, jax.random.PRNGKey(0))
            our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-4, atol=5e-4)
    assert (
        abs(float(ref_loss.temp.detach()) - float(state.params["clip"]["temp"][0]))
        < 1e-3
    )


def test_getitem_contract_matches(built):
    """Reference __getitem__ returns (X_seg[subj], Y_seg, subj, chunk_id);
    our sample_batch returns the same tensors for the same draws."""
    ours, ref, _ = built
    np.random.seed(0)
    x, y, subj, chunk = ref[2]
    batch = ours.sample_batch(
        np.random.default_rng(0),
        np.array([2]),
        choices=np.array([int(subj)]),
    )
    np.testing.assert_allclose(x.numpy(), batch["X"][0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(y.numpy(), batch["Y"][0], rtol=2e-3, atol=2e-3)
