"""Pallas kernel equivalence tests (interpret mode on the CPU backend):
naive/XLA twin vs kernel — the reference's equivalence-twin testing pattern
[ref: tests/test_modules/__init__.py:1-6] applied to kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_decoding_tpu.models.classifier import retrieval_metrics
from speech_decoding_tpu.ops.pallas.retrieval import (
    retrieval_metrics_pallas,
    retrieval_ranks_pallas,
)
from speech_decoding_tpu.ops.pallas.subject_conv import subject_matmul


class TestRetrievalKernel:
    @pytest.mark.parametrize("B,shape", [(64, (8, 6)), (130, (16, 12)), (256, (4, 100))])
    def test_matches_dense(self, rng, B, shape):
        Z = rng.normal(size=(B, *shape)).astype(np.float32)
        Y = (0.5 * Z + 0.8 * rng.normal(size=Z.shape)).astype(np.float32)
        d1, d10 = retrieval_metrics(jnp.asarray(Z), jnp.asarray(Y), ks=(1, 10))
        p1, p10 = retrieval_metrics_pallas(
            jnp.asarray(Z), jnp.asarray(Y), ks=(1, 10), interpret=True
        )
        assert float(d1) == float(p1)
        assert float(d10) == float(p10)

    def test_ranks_against_numpy(self, rng):
        B = 96
        Z = rng.normal(size=(B, 32)).astype(np.float32)
        Y = rng.normal(size=(B, 32)).astype(np.float32)
        ranks = np.asarray(retrieval_ranks_pallas(jnp.asarray(Z), jnp.asarray(Y), interpret=True))
        zn = Z / np.linalg.norm(Z, axis=-1, keepdims=True)
        yn = Y / np.linalg.norm(Y, axis=-1, keepdims=True)
        sim = yn @ zn.T
        expected = (sim > np.diag(sim)[:, None]).sum(-1)
        np.testing.assert_array_equal(ranks, expected)


class TestSubjectMatmulKernel:
    def test_forward_matches_gather_einsum(self, rng):
        B, T, D, S = 6, 16, 32, 4
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        w = rng.normal(size=(S, D, D)).astype(np.float32)
        sidx = jnp.asarray(rng.integers(0, S, B), jnp.int32)
        ours = subject_matmul(jnp.asarray(x), jnp.asarray(w), sidx, True)
        ref = jnp.einsum("bti,bio->bto", x, jnp.asarray(w)[sidx])
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_gradients_match_xla(self, rng):
        B, T, D, S = 4, 8, 16, 3
        x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(S, D, D)).astype(np.float32))
        sidx = jnp.asarray(rng.integers(0, S, B), jnp.int32)

        def loss_pallas(x, w):
            return jnp.sum(jnp.sin(subject_matmul(x, w, sidx, True)))

        def loss_xla(x, w):
            return jnp.sum(jnp.sin(jnp.einsum("bti,bio->bto", x, w[sidx])))

        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
        gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), rtol=1e-4, atol=1e-5)


class TestFusedConvBlock:
    def test_stack_matches_flax_eval(self, rng):
        from speech_decoding_tpu.data.layout import ch_locations_2d
        from speech_decoding_tpu.models.brain_encoder import ConvBlock, SubjectBlock
        from speech_decoding_tpu.ops.pallas.conv_block import (
            apply_fused_stack,
            prepare_fused_stack,
        )
        from speech_decoding_tpu.models import BrainEncoder

        loc = ch_locations_2d("Gwilliams2022", cache=False)
        enc = BrainEncoder(
            num_subjects=2, loc=loc, D1=16, D2=24, F=32, K=4, channels_last_io=True
        )
        X = rng.normal(size=(5, 48, 208)).astype(np.float32)
        sidx = np.zeros(5, np.int32)
        v = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            X, sidx, train=False,
        )
        params, stats = v["params"], v["batch_stats"]
        sb = SubjectBlock(2, 16, 4, 0.1, loc)
        h = sb.apply({"params": params["subject_block"]}, jnp.asarray(X), sidx, True)

        fused = apply_fused_stack(prepare_fused_stack(params, stats), h,
                                  interpret=True)
        hx = h
        for k in range(5):
            hx = ConvBlock(k, 24).apply(
                {"params": params[f"conv{k}"], "batch_stats": stats[f"conv{k}"]},
                hx, True,
            )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(hx), rtol=1e-5, atol=1e-6
        )

