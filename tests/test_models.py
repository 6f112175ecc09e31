"""Golden parity tests: JAX brain encoder / loss / retrieval vs independent
torch twins (tests/torch_twin.py), plus init-distribution and spatial-dropout
semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_decoding_tpu.data.layout import ch_locations_2d
from speech_decoding_tpu.models import (
    BrainEncoder,
    CLIPLoss,
    clip_loss,
    mse_loss,
    retrieval_metrics,
    spatial_dropout_mask,
)
from speech_decoding_tpu.models.brain_encoder import TorchBatchNorm

import torch_twin as twin

B, C, T = 6, 208, 120
NUM_SUBJECTS = 4
K = 8


@pytest.fixture(scope="module")
def loc():
    return ch_locations_2d("Gwilliams2022", cache=False)


@pytest.fixture(scope="module")
def encoder_and_vars(loc):
    enc = BrainEncoder(num_subjects=NUM_SUBJECTS, loc=loc, D1=64, D2=96, F=128, K=K)
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(jax.random.PRNGKey(1), (B, C, T))
    sidx = jnp.array([0, 1, 2, 3, 0, 1])
    variables = enc.init({"params": key, "dropout": key}, X, sidx, train=False)
    return enc, variables, np.asarray(X), np.asarray(sidx)


class TestBrainEncoderParity:
    def test_eval_forward_matches_torch_twin(self, encoder_and_vars, loc):
        enc, variables, X, sidx = encoder_and_vars
        Z = np.asarray(enc.apply(variables, X, sidx, train=False))
        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        Z_t = twin.brain_encoder_forward(params, stats, loc, X, sidx, K=K).numpy()
        assert Z.shape == (B, 128, T)
        np.testing.assert_allclose(Z, Z_t, rtol=1e-4, atol=1e-4)

    def test_train_batchnorm_matches_torch(self, encoder_and_vars, loc):
        """Train-mode BN (batch stats) forward parity; dropout disabled by
        comparing a model applied with train batchstats but a fixed mask of
        ones is not exposed — instead we check TorchBatchNorm alone below and
        full-model train parity via the twin's training_bn flag with dropout
        made into a no-op (d_drop=0 -> no channel within distance)."""
        enc0 = BrainEncoder(
            num_subjects=NUM_SUBJECTS, loc=loc, D1=64, D2=96, F=128, K=K, d_drop=0.0
        )
        key = jax.random.PRNGKey(0)
        X = np.random.default_rng(2).normal(size=(B, C, T)).astype(np.float32)
        sidx = np.array([0, 1, 2, 3, 0, 1])
        variables = enc0.init({"params": key, "dropout": key}, X, sidx, train=False)
        Z, _ = enc0.apply(
            variables,
            X,
            sidx,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        Z_t = twin.brain_encoder_forward(
            params, stats, loc, X, sidx, K=K, training_bn=True
        ).numpy()
        np.testing.assert_allclose(np.asarray(Z), Z_t, rtol=2e-4, atol=2e-4)

    def test_init_distributions(self, encoder_and_vars):
        _, variables, _, _ = encoder_and_vars
        p = variables["params"]
        z_re = np.asarray(p["subject_block"]["spatial_attention"]["z_re"])
        assert z_re.min() >= 0 and z_re.max() <= 1  # torch.rand on cfloat
        k = np.asarray(p["conv0"]["conv0"]["kernel"])  # (3, 64, 96)
        bound = 1 / np.sqrt(64 * 3)
        assert np.abs(k).max() <= bound + 1e-6
        assert np.abs(k).max() > 0.8 * bound  # actually fills the range
        sk = np.asarray(p["subject_block"]["subject_kernel"])
        assert sk.shape == (NUM_SUBJECTS, 64, 64)
        assert np.abs(sk).max() <= 1 / np.sqrt(64) + 1e-6

    def test_subject_specificity(self, encoder_and_vars):
        """Same input through different subject layers gives different output."""
        enc, variables, X, _ = encoder_and_vars
        Xs = np.repeat(X[:1], 2, axis=0)
        Z = np.asarray(enc.apply(variables, Xs, np.array([0, 1]), train=False))
        assert not np.allclose(Z[0], Z[1])
        Z2 = np.asarray(enc.apply(variables, Xs, np.array([2, 2]), train=False))
        np.testing.assert_allclose(Z2[0], Z2[1], rtol=1e-5, atol=1e-5)


class TestBatchNorm:
    def test_train_and_running_stats_match_torch(self):
        import torch

        x = np.random.default_rng(0).normal(size=(4, 16, 8)).astype(np.float32) * 3 + 1
        bn = TorchBatchNorm(features=8)
        variables = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
        y, mut = bn.apply(x=jnp.asarray(x), variables=variables,
                          use_running_average=False, mutable=["batch_stats"])

        tbn = torch.nn.BatchNorm1d(8)
        with torch.no_grad():
            xt = torch.from_numpy(x).permute(0, 2, 1)  # (B, C, T*)
            yt = tbn(xt)
        np.testing.assert_allclose(
            np.asarray(y), yt.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]), tbn.running_mean.numpy(),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]), tbn.running_var.numpy(),
            rtol=1e-5, atol=1e-6,
        )


class TestSpatialDropout:
    def test_mask_semantics(self, loc):
        key = jax.random.PRNGKey(0)
        mask = np.asarray(spatial_dropout_mask(key, jnp.asarray(loc), 0.1))
        assert mask.shape == (C,)
        assert set(np.unique(mask)) <= {0.0, 1.0}
        assert mask.min() == 0.0  # the center itself is always dropped
        # every dropped channel is within d_drop of SOME channel (the center)
        dropped = np.where(mask == 0)[0]
        centers = [
            c
            for c in range(C)
            if np.all(np.linalg.norm(loc[dropped] - loc[c], axis=-1) < 0.1)
        ]
        assert len(centers) >= 1

    def test_deterministic_mode_identity(self, encoder_and_vars):
        enc, variables, X, sidx = encoder_and_vars
        Z1 = enc.apply(variables, X, sidx, train=False)
        Z2 = enc.apply(variables, X, sidx, train=False)
        np.testing.assert_array_equal(np.asarray(Z1), np.asarray(Z2))


class TestLossParity:
    def test_clip_loss_matches_torch(self, rng):
        x = rng.normal(size=(8, 32, 12)).astype(np.float32)
        y = rng.normal(size=(8, 32, 12)).astype(np.float32)
        for temp in [0.0, 5.1]:
            ours = float(clip_loss(jnp.asarray(x), jnp.asarray(y), jnp.float32(temp)))
            theirs = twin.clip_loss_twin(x, y, temp)
            assert abs(ours - theirs) < 1e-3, (ours, theirs)

    def test_clip_loss_module_and_logits(self, rng):
        x = rng.normal(size=(4, 8)).astype(np.float32)
        y = rng.normal(size=(4, 8)).astype(np.float32)
        mod = CLIPLoss(init_temperature=1.0)
        variables = mod.init(jax.random.PRNGKey(0), x, y)
        assert float(variables["params"]["temp"][0]) == 1.0
        logits, loss = mod.apply(variables, x, y, return_logits=True)
        assert logits.shape == (4, 4)
        # identical inputs -> diagonal dominant -> small loss
        same = float(clip_loss(jnp.asarray(x), jnp.asarray(x), jnp.float32(5.0)))
        assert same < 1e-3

    def test_mse_loss(self, rng):
        y = rng.normal(size=(4, 8, 3)).astype(np.float32)
        z = rng.normal(size=(4, 8, 3)).astype(np.float32)
        expected = np.mean(np.sum((y - z) ** 2, axis=(-1, -2)))
        assert abs(float(mse_loss(jnp.asarray(y), jnp.asarray(z))) - expected) < 1e-4


class TestRetrievalParity:
    def test_matches_naive_double_loop(self, rng):
        Z = rng.normal(size=(16, 8, 4)).astype(np.float32)
        Y = (0.7 * Z + 0.3 * rng.normal(size=Z.shape)).astype(np.float32)
        ours = retrieval_metrics(jnp.asarray(Z), jnp.asarray(Y), ks=(1, 10))
        theirs = twin.retrieval_twin(Z, Y, ks=(1, 10))
        assert abs(float(ours[0]) - theirs[0]) < 1e-6
        assert abs(float(ours[1]) - theirs[1]) < 1e-6

    def test_perfect_retrieval(self, rng):
        Z = rng.normal(size=(12, 6, 5)).astype(np.float32)
        t1, t10 = retrieval_metrics(jnp.asarray(Z), jnp.asarray(Z), ks=(1, 10))
        assert float(t1) == 1.0 and float(t10) == 1.0


def test_conv_impl_gemm_matches_xla(loc_module=None):
    """The 3-shifted-GEMM conv formulation == XLA's conv lowering."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    X = np.random.default_rng(3).normal(size=(3, 208, 48)).astype(np.float32)
    sidx = np.zeros(3, np.int32)
    outs = {}
    for impl in ("xla", "gemm", "gemm_wide"):
        enc = BrainEncoder(
            num_subjects=2, loc=loc, D1=16, D2=24, F=32, K=4, conv_impl=impl
        )
        v = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            X, sidx, train=False,
        )
        outs[impl] = np.asarray(enc.apply(v, X, sidx, train=False))
    np.testing.assert_allclose(outs["xla"], outs["gemm"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        outs["xla"], outs["gemm_wide"], rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow  # gemm_wide is a documented-negative non-default impl; fast twin: test_conv_impl_gemm_matches_xla
def test_conv_impl_gemm_wide_grad_parity():
    """gemm and gemm_wide must also match in the backward pass (same loss
    grads as the xla lowering), exercising every dilation in the 5-block
    stack. 'gemm' carries a hand-written custom VJP (_gemm_conv_bwd — XLA's
    autodiff transpose re-forms a convolution whose TPU emitter collapses at
    B=128); this is the numerical gate on that backward."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    X = np.random.default_rng(4).normal(size=(2, 208, 48)).astype(np.float32)
    sidx = np.zeros(2, np.int32)
    grads = {}
    for impl in ("xla", "gemm", "gemm_wide"):
        enc = BrainEncoder(
            num_subjects=2, loc=loc, D1=16, D2=24, F=32, K=4, conv_impl=impl
        )
        v = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            X, sidx, train=False,
        )

        def loss(params):
            Z = enc.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                X, sidx, train=False,
            )
            return (Z * Z).mean()

        grads[impl] = jax.grad(loss)(v["params"])
    for impl in ("gemm", "gemm_wide"):
        jax.tree.map(
            lambda ga, gb: np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), rtol=2e-4, atol=1e-6
            ),
            grads["xla"],
            grads[impl],
        )


def test_remat_identical_outputs():
    """tpu.remat (jax.checkpoint over the conv stack) must not change values."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    X = np.random.default_rng(4).normal(size=(3, 208, 48)).astype(np.float32)
    sidx = np.zeros(3, np.int32)
    outs = {}
    for remat in (False, True):
        enc = BrainEncoder(
            num_subjects=2, loc=loc, D1=16, D2=24, F=32, K=4, remat=remat
        )
        v = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            X, sidx, train=False,
        )
        outs[remat] = np.asarray(enc.apply(v, X, sidx, train=False))
    np.testing.assert_allclose(outs[False], outs[True], rtol=1e-6, atol=1e-6)


def test_bf16_compute_close_to_f32():
    """bfloat16 compute tracks the f32 forward within bf16 noise."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    X = np.random.default_rng(5).normal(size=(3, 208, 48)).astype(np.float32)
    sidx = np.zeros(3, np.int32)
    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        enc = BrainEncoder(
            num_subjects=2, loc=loc, D1=16, D2=24, F=32, K=4, compute_dtype=dt
        )
        v = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            X, sidx, train=False,
        )
        outs[dt] = np.asarray(enc.apply(v, X, sidx, train=False), np.float32)
    denom = np.abs(outs[jnp.float32]).mean() + 1e-6
    rel = np.abs(outs[jnp.float32] - outs[jnp.bfloat16]).mean() / denom
    assert rel < 0.15, rel  # bf16 mantissa noise through 13 conv layers


def test_channels_last_io_equivalence():
    """channels_last_io=True on transposed inputs == default on (B, C, T)."""
    loc = ch_locations_2d("Gwilliams2022", cache=False)
    X = np.random.default_rng(6).normal(size=(3, 208, 48)).astype(np.float32)
    sidx = np.zeros(3, np.int32)
    enc = BrainEncoder(num_subjects=2, loc=loc, D1=16, D2=24, F=32, K=4)
    v = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        X, sidx, train=False,
    )
    Z = np.asarray(enc.apply(v, X, sidx, train=False))  # (B, F, T)

    enc_cl = BrainEncoder(
        num_subjects=2, loc=loc, D1=16, D2=24, F=32, K=4, channels_last_io=True
    )
    Z_cl = np.asarray(
        enc_cl.apply(v, X.transpose(0, 2, 1), sidx, train=False)
    )  # (B, T, F)
    np.testing.assert_allclose(Z_cl.transpose(0, 2, 1), Z, rtol=1e-5, atol=1e-6)
