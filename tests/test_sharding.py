"""Multi-device tests on the 8-device CPU mesh: sharded CLIP loss / retrieval
match the single-device implementations, and the full train step runs under
jit with batch-sharded inputs (GSPMD data parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_decoding_tpu.data.layout import ch_locations_2d
from speech_decoding_tpu.models import BrainEncoder, clip_loss, retrieval_metrics
from speech_decoding_tpu.parallel import (
    clip_loss_sharded,
    make_mesh,
    retrieval_metrics_sharded,
    shard_batch,
)
from speech_decoding_tpu.training import create_train_state, make_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 8, "model": 1}
    m2 = make_mesh({"data": 4, "model": 2})
    assert m2.shape == {"data": 4, "model": 2}


def test_clip_loss_sharded_matches_dense(mesh, rng):
    B = 32
    x = rng.normal(size=(B, 16, 6)).astype(np.float32)
    y = rng.normal(size=(B, 16, 6)).astype(np.float32)
    temp = jnp.float32(2.0)
    dense = float(clip_loss(jnp.asarray(x), jnp.asarray(y), temp))
    sharded = float(clip_loss_sharded(jnp.asarray(x), jnp.asarray(y), temp, mesh))
    assert abs(dense - sharded) < 1e-4, (dense, sharded)


def test_clip_loss_sharded_sum_reduction(mesh, rng):
    B = 16
    x = rng.normal(size=(B, 8)).astype(np.float32)
    y = rng.normal(size=(B, 8)).astype(np.float32)
    temp = jnp.float32(0.0)
    dense = float(clip_loss(jnp.asarray(x), jnp.asarray(y), temp, reduction="sum"))
    sharded = float(
        clip_loss_sharded(jnp.asarray(x), jnp.asarray(y), temp, mesh, reduction="sum")
    )
    assert abs(dense - sharded) / max(abs(dense), 1) < 1e-5


def test_retrieval_sharded_matches_dense(mesh, rng):
    B = 40
    Z = rng.normal(size=(B, 12, 4)).astype(np.float32)
    Y = (0.6 * Z + 0.4 * rng.normal(size=Z.shape)).astype(np.float32)
    d1, d10 = retrieval_metrics(jnp.asarray(Z), jnp.asarray(Y), ks=(1, 10))
    s1, s10 = retrieval_metrics_sharded(jnp.asarray(Z), jnp.asarray(Y), mesh, ks=(1, 10))
    assert abs(float(d1) - float(s1)) < 1e-6
    assert abs(float(d10) - float(s10)) < 1e-6


def test_train_step_with_sharded_batch(mesh):
    """The jitted train step accepts a batch sharded over the data axis and
    produces the same metrics as the unsharded run (GSPMD handles the
    collectives, incl. global BatchNorm stats)."""
    B, C, T, F = 16, 208, 48, 32
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=24, F=F, K=4)
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(jax.random.PRNGKey(1), (B, C, T))
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    sidx = jnp.zeros((B,), jnp.int32)
    state = create_train_state(enc, key, X, sidx)
    batch = {"X": X, "Y": Y, "subject_idxs": sidx}

    train_step = make_train_step(enc, donate=False)
    _, m_dense = train_step(state, batch, jax.random.PRNGKey(3))

    sbatch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    for v in sbatch.values():
        assert len(v.sharding.device_set) == 8
    _, m_shard = train_step(state, sbatch, jax.random.PRNGKey(3))

    assert abs(float(m_dense["loss"]) - float(m_shard["loss"])) < 1e-4
    assert abs(float(m_dense["top10"]) - float(m_shard["top10"])) < 1e-6


@pytest.mark.slow  # fast twins: test_train_step_with_sharded_batch (DP) + dryrun leg dp4xtp2
def test_tp_train_steps_match_replicated(mesh):
    """Numerical TP proof: k train steps on a (data=4, model=2) mesh with
    params sharded over "model" by parallel.sharding_rules.param_shardings
    (Megatron-style column parallelism on the wide kernels) produce the same
    gradients and the same per-step loss trajectory as the replicated run.
    Validates that the sharding heuristic only ever re-lays-out math that
    XLA/GSPMD can reduce exactly. (Final *params* after k Adam steps are NOT
    compared: early Adam updates are ~lr*sign(g), so fp-noise sign flips in
    near-zero gradients cost O(lr) per element — ill-conditioned for a
    parity check. Gradients and the loss trajectory are the conditioned
    observables.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_decoding_tpu.parallel.mesh import replicated
    from speech_decoding_tpu.parallel.sharding_rules import param_shardings

    tp_mesh = make_mesh({"data": 4, "model": 2})
    B, C, T, F = 8, 208, 24, 32
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=24, F=F, K=4)
    X = jax.random.normal(jax.random.PRNGKey(1), (B, C, T))
    Y = jax.random.normal(jax.random.PRNGKey(2), (B, F, T))
    sidx = jnp.arange(B, dtype=jnp.int32) % 2
    batch = {"X": X, "Y": Y, "subject_idxs": sidx}
    train_step = make_train_step(enc, donate=False)

    def run(state, batch, k=4):
        losses = []
        for _ in range(k):
            state, m = train_step(state, batch, jax.random.PRNGKey(3))
            losses.append(float(m["loss"]))
        return state, losses

    state0 = create_train_state(enc, jax.random.PRNGKey(0), X, sidx)
    ref_state, ref_losses = run(state0, batch)

    # TP placement: model-axis-sharded params, replicated everything else,
    # batch sharded over "data"
    psh = param_shardings(state0.params, tp_mesh, min_dim=16)
    n_sharded = sum(
        1
        for s in jax.tree.leaves(
            psh, is_leaf=lambda x: isinstance(x, NamedSharding)
        )
        if s.spec != P()
    )
    assert n_sharded >= 3, "TP heuristic sharded nothing — test is vacuous"
    tp_state = create_train_state(enc, jax.random.PRNGKey(0), X, sidx)
    tp_state = tp_state.replace(
        params=jax.tree.map(jax.device_put, tp_state.params, psh),
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, replicated(tp_mesh)), tp_state.batch_stats
        ),
    )
    tp_batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, tp_mesh)

    # 1) gradient parity: same grads whether params are TP-sharded or not
    from speech_decoding_tpu.models import clip_loss as _clip_loss

    @jax.jit
    def grads_of(params, batch_stats, batch):
        def loss_fn(p):
            Z, _ = enc.apply(
                {"params": p["encoder"], "batch_stats": batch_stats},
                batch["X"],
                batch["subject_idxs"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3)},
            )
            return _clip_loss(batch["Y"], Z, p["clip"]["temp"][0])

        return jax.grad(loss_fn)(params)

    g_ref = grads_of(state0.params, state0.batch_stats, batch)
    g_tp = grads_of(tp_state.params, tp_state.batch_stats, tp_batch)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_tp = jax.tree.leaves(g_tp)
    for (path, r), t in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(
            np.asarray(t),
            np.asarray(r),
            # conv biases feeding straight into BN have mathematically-zero
            # grads (BN subtracts the mean), so those leaves are pure fp
            # cancellation noise; atol must cover it
            rtol=1e-3,
            atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )

    # 2) dynamics parity: the loss trajectory over k Adam steps (loss at step
    # i reflects all i-1 previous sharded updates)
    _, tp_losses = run(tp_state, tp_batch)
    np.testing.assert_allclose(tp_losses, ref_losses, rtol=1e-5, atol=1e-6)


def test_global_batch_from_host_local(mesh):
    """Single-process case: the local batch IS the global batch, sharded over
    the data axis."""
    from speech_decoding_tpu.parallel.multihost import (
        global_batch_from_host_local,
        init_distributed,
    )

    assert init_distributed() is False  # single process
    batch = {"X": np.arange(16 * 4, dtype=np.float32).reshape(16, 4)}
    out = global_batch_from_host_local(batch, mesh)
    assert out["X"].shape == (16, 4)
    assert len(out["X"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out["X"]), batch["X"])


def test_time_sharded_bandpass_matches_single_device(mesh, rng):
    """FIR band-pass with time-axis sharding + halo exchange == the
    single-device path (the halo reproduces exact neighborhood context and
    the boundary shards reproduce the global reflect padding)."""
    import jax.numpy as jnp

    from speech_decoding_tpu.ops.fir import bandpass_filter
    from speech_decoding_tpu.parallel.preproc_sharded import bandpass_filter_sharded

    sfreq = 250.0  # filter half-length 412 < shard length 500
    x = rng.normal(size=(3, 4000)).astype(np.float32)
    dense = np.asarray(bandpass_filter(jnp.asarray(x), sfreq, 2.0, 40.0))
    sharded = np.asarray(
        bandpass_filter_sharded(jnp.asarray(x), sfreq, 2.0, 40.0, mesh)
    )
    np.testing.assert_allclose(sharded, dense, rtol=2e-4, atol=2e-5)


def test_channel_sharded_resample_matches_single_device(mesh, rng):
    """Channel-sharded FFT resample == the single-device fft_resample bit-for
    -bit structure (zero communication; each device runs the exact MNE
    algorithm on its channel block)."""
    import jax.numpy as jnp

    from speech_decoding_tpu.ops.resample import fft_resample
    from speech_decoding_tpu.parallel.preproc_sharded import fft_resample_sharded

    x = rng.normal(size=(16, 3000)).astype(np.float32)
    dense = np.asarray(fft_resample(jnp.asarray(x), up=120.0, down=1000.0))
    sharded = np.asarray(
        fft_resample_sharded(jnp.asarray(x), 120.0, 1000.0, mesh)
    )
    np.testing.assert_allclose(sharded, dense, rtol=1e-5, atol=1e-6)


def test_channel_sharded_preproc_chain_matches_single_device(mesh, rng):
    """Full band-pass -> resample chain, channel-sharded, == the unsharded
    chain (the memory-scaling path for many recordings/channels)."""
    import jax.numpy as jnp

    from speech_decoding_tpu.ops.fir import bandpass_filter
    from speech_decoding_tpu.ops.resample import fft_resample
    from speech_decoding_tpu.parallel.preproc_sharded import (
        bandpass_resample_sharded,
    )

    sfreq = 500.0
    x = rng.normal(size=(8, 5000)).astype(np.float32)
    dense = np.asarray(
        fft_resample(
            bandpass_filter(jnp.asarray(x), sfreq, 1.0, 60.0), up=120.0, down=sfreq
        )
    )
    sharded = np.asarray(
        bandpass_resample_sharded(jnp.asarray(x), sfreq, 1.0, 60.0, 120.0, mesh)
    )
    np.testing.assert_allclose(sharded, dense, rtol=2e-4, atol=2e-5)


def test_retrieve_topk_with_bank_sharded_over_mesh(mesh, rng):
    """Serving against a bank too large for one chip: shard the normalized
    bank's N axis over the mesh ("data") and jit retrieve_topk with sharded
    inputs — GSPMD partitions the (B, N) similarity matmul per shard and
    gathers only the (B, k) winners. Results must equal the single-device
    call; the replicated-query sharding keeps the per-chip bank slice as the
    only O(N) resident."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_decoding_tpu.inference import retrieve_topk

    B, Fd, T, N = 4, 16, 30, 64
    Z = jnp.asarray(rng.normal(size=(B, Fd, T)), jnp.float32)
    bank = rng.normal(size=(N, Fd * T)).astype(np.float32)
    bank_norm = jnp.asarray(bank / np.linalg.norm(bank, axis=-1, keepdims=True))

    s_ref, i_ref = retrieve_topk(Z, bank_norm, k=10)

    bank_sharded = jax.device_put(bank_norm, NamedSharding(mesh, P("data", None)))
    Z_rep = jax.device_put(Z, NamedSharding(mesh, P()))
    s_sh, i_sh = jax.jit(retrieve_topk, static_argnames=("k",))(
        Z_rep, bank_sharded, k=10
    )
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref), atol=1e-5)


def test_speech_decoder_sharded_bank(mesh, rng):
    """SpeechDecoder.set_bank(mesh=...) shards the normalized bank over the
    mesh "data" axis; decode results equal the unsharded decoder."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_decoding_tpu.inference import SpeechDecoder

    B, C, T, Fd = 4, 208, 30, 16
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=16, F=Fd, K=4)
    X = rng.normal(size=(B, C, T)).astype(np.float32)
    state = create_train_state(
        enc, jax.random.PRNGKey(0), jnp.asarray(X), jnp.zeros((B,), jnp.int32)
    )
    bank = rng.normal(size=(64, Fd, T)).astype(np.float32)
    dec = SpeechDecoder(
        enc, state.params["encoder"], state.batch_stats, use_fused_blocks=False
    )
    dec.set_bank(jnp.asarray(bank))
    s_ref, i_ref = dec.decode(X, np.zeros(B, np.int32), k=5)

    dec.set_bank(jnp.asarray(bank), mesh=mesh)
    shard_spec = dec._bank_norm.sharding
    assert shard_spec == NamedSharding(mesh, P("data", None)), shard_spec
    s_sh, i_sh = dec.decode(X, np.zeros(B, np.int32), k=5)
    np.testing.assert_array_equal(i_sh, i_ref)
    np.testing.assert_allclose(s_sh, s_ref, atol=1e-5)


def test_speech_decoder_sharded_int8_bank(mesh, rng):
    """set_bank(mesh=..., store_dtype="int8"): the quantized bank rows and
    per-row scales shard over "data"; GSPMD partitions the int8 similarity
    and the results equal the single-device int8 decoder exactly (same
    quantized values, reduction over the unsharded D axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_decoding_tpu.inference import SpeechDecoder

    B, C, T, Fd = 4, 208, 30, 16
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=16, F=Fd, K=4)
    X = rng.normal(size=(B, C, T)).astype(np.float32)
    state = create_train_state(
        enc, jax.random.PRNGKey(0), jnp.asarray(X), jnp.zeros((B,), jnp.int32)
    )
    bank = rng.normal(size=(64, Fd, T)).astype(np.float32)
    dec = SpeechDecoder(
        enc, state.params["encoder"], state.batch_stats, use_fused_blocks=False
    )
    dec.set_bank(jnp.asarray(bank), store_dtype="int8")
    s_ref, i_ref = dec.decode(X, np.zeros(B, np.int32), k=5)

    dec.set_bank(jnp.asarray(bank), mesh=mesh, store_dtype="int8")
    # flat (N, D) int8 bank: rows shard along the bank axis, D unsharded
    assert dec._bank_q.sharding == NamedSharding(mesh, P("data", None))
    assert dec._bank_scale.sharding == NamedSharding(mesh, P("data"))
    s_sh, i_sh = dec.decode(X, np.zeros(B, np.int32), k=5)
    np.testing.assert_array_equal(i_sh, i_ref)
    np.testing.assert_allclose(s_sh, s_ref, atol=1e-6)
