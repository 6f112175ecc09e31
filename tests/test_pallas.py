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



class TestTapConv:
    """Fused 3-tap dilated conv kernel (ops/pallas/tap_conv.py) vs the
    'gemm' tap-GEMM formulation it accelerates [ref: models.py:128-150]."""

    @pytest.mark.parametrize("dilation", [1, 2, 4, 8])
    def test_forward_matches_gemm_taps(self, rng, dilation):
        from speech_decoding_tpu.models.brain_encoder import _gemm_conv_taps
        from speech_decoding_tpu.ops.pallas.tap_conv import tap_conv

        B, T, Cin, Cout = 4, 24, 12, 10
        x = jnp.asarray(rng.normal(size=(B, T, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, Cin, Cout)).astype(np.float32) * 0.2)
        ref = _gemm_conv_taps(x, w, dilation)
        got = tap_conv(x, w, dilation, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_forward_odd_batch_blocking(self, rng):
        from speech_decoding_tpu.models.brain_encoder import _gemm_conv_taps
        from speech_decoding_tpu.ops.pallas.tap_conv import tap_conv

        x = jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 8, 6)).astype(np.float32))
        ref = _gemm_conv_taps(x, w, 2)
        got = tap_conv(x, w, 2, interpret=True)  # B=3 falls back to bb=1
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("dilation", [1, 4])
    def test_grads_match_gemm_conv(self, rng, dilation):
        """vjp of the fused kernel (pallas dx + fused-dW reduction) vs the
        custom-VJP tap-GEMM conv's autodiff."""
        from speech_decoding_tpu.models.brain_encoder import _gemm_conv
        from speech_decoding_tpu.ops.pallas.tap_conv import pallas_tap_conv

        B, T, Cin, Cout = 4, 24, 12, 10
        x = jnp.asarray(rng.normal(size=(B, T, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, Cin, Cout)).astype(np.float32) * 0.2)
        gy = jnp.asarray(rng.normal(size=(B, T, Cout)).astype(np.float32))

        _, vjp_ref = jax.vjp(lambda x, w: _gemm_conv(x, w, dilation), x, w)
        dx_ref, dw_ref = vjp_ref(gy)
        _, vjp_got = jax.vjp(
            lambda x, w: pallas_tap_conv(x, w, dilation, True), x, w
        )
        dx_got, dw_got = vjp_got(gy)
        np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref), rtol=1e-5, atol=1e-5)

    def test_encoder_conv_impl_pallas_taps(self, rng):
        """BrainEncoder(conv_impl='pallas_taps') forward+grads match the
        'gemm' impl on the same params (interpret mode off-TPU)."""
        from speech_decoding_tpu.data.layout import ch_locations_2d
        from speech_decoding_tpu.models import BrainEncoder, clip_loss

        loc = ch_locations_2d("Gwilliams2022", cache=False)
        kw = dict(num_subjects=2, loc=loc, D1=16, D2=24, F=32, K=4,
                  channels_last_io=True)
        enc_g = BrainEncoder(conv_impl="gemm", **kw)
        enc_p = BrainEncoder(conv_impl="pallas_taps", **kw)
        X = rng.normal(size=(4, 48, 208)).astype(np.float32)
        sidx = np.zeros(4, np.int32)
        v = enc_g.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            X, sidx, train=False,
        )
        Y = rng.normal(size=(4, 48, 32)).astype(np.float32)

        def loss_of(enc):
            def f(params):
                Z, _ = enc.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    X, sidx, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(2)},
                )
                return clip_loss(jnp.asarray(Y), Z, jnp.float32(1.0))
            return jax.value_and_grad(f)(v["params"])

        lg, gg = loss_of(enc_g)
        lp, gp = loss_of(enc_p)
        assert abs(float(lg) - float(lp)) < 1e-5
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(gg)[0], jax.tree.leaves(gp)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_gemm_pdw_plumbing_matches_gemm(self, rng):
        """conv_impl='gemm_pdw' (fused Pallas dW on TPU; einsum fallback
        elsewhere) produces the same grads as 'gemm' — off-TPU this pins the
        plumbing; the TPU-path numeric parity is covered by the kernel tests
        above plus the on-chip A/B (tools/ab_conv_impl.py)."""
        from speech_decoding_tpu.models.brain_encoder import _gemm_conv

        x = jnp.asarray(rng.normal(size=(4, 24, 12)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 12, 10)).astype(np.float32) * 0.2)
        gy = jnp.asarray(rng.normal(size=(4, 24, 10)).astype(np.float32))
        _, v0 = jax.vjp(lambda x, w: _gemm_conv(x, w, 2, False), x, w)
        _, v1 = jax.vjp(lambda x, w: _gemm_conv(x, w, 2, True), x, w)
        # off-TPU the pdw branch falls back to the identical einsum path
        # (exact); on a real TPU backend it runs the Mosaic kernel, whose
        # f32 accumulation order differs -> fp-level tolerance
        rtol = 1e-6 if jax.default_backend() != "tpu" else 1e-4
        for a, b in zip(v0(gy), v1(gy)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=rtol, atol=1e-5)
