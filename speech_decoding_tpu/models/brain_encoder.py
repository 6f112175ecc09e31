"""Brain encoder: Fourier-parameterized spatial attention + per-subject 1x1
convs + dilated-GLU conv stack.

Re-implements the architecture of the reference's speech_decoding/models.py
(SpatialAttention models.py:14-65, SpatialDropout models.py:68-86,
SubjectBlock models.py:89-117, ConvBlock models.py:120-166, BrainEncoder
models.py:169-196) TPU-first:

  * Internal layout is (batch, time, channels) — the feature dim maps to TPU
    lanes and all 1x1 convs become MXU matmuls. The public ``__call__`` takes
    the reference layout (batch, channels, time) and returns the same.
  * The per-subject layer is one gathered (S, D1, D1) einsum instead of a
    Python loop of B tiny convs [ref: models.py:114-116]; the reference's own
    test twin proves equivalence [ref: tests/test_modules/models.py:21-42].
  * cos/sin Fourier bases are precomputed from static sensor positions at
    trace time and folded into the compiled graph [ref: models.py:36-40].
  * All initializers match torch defaults (Conv1d: kaiming_uniform(a=sqrt(5))
    == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias; complex z:
    U(0,1) per real/imag part [ref: models.py:33]) so training dynamics track
    the reference.
  * GELU is exact (erf) like torch F.gelu [ref: models.py:158].
  * BatchNorm matches torch.nn.BatchNorm1d semantics exactly, including the
    unbiased running-variance update (see ``TorchBatchNorm``).

Compute dtype: modules accept ``compute_dtype`` (default float32; use bfloat16
on TPU). Parameters stay float32; normalization statistics accumulate in
float32.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# torch-compatible initializers
# ---------------------------------------------------------------------------


def torch_conv_uniform(fan_in: int):
    """torch Conv1d/Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    kaiming_uniform_(a=sqrt(5)) over a conv weight reduces to exactly this
    bound; torch uses the same bound for the bias.
    """
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def uniform01(key, shape, dtype=jnp.float32):
    """U(0, 1) — torch.rand, used for the complex z parameter [ref: models.py:33]."""
    return jax.random.uniform(key, shape, dtype)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


class TorchBatchNorm(nn.Module):
    """BatchNorm over (batch, time) per channel with torch.nn.BatchNorm1d
    semantics [ref: models.py:135,143].

    Differences from flax.linen.BatchNorm that matter for parity:
      * the running variance is updated with the *unbiased* batch variance
        (n/(n-1)) while normalization uses the biased one;
      * momentum convention: new = (1 - m) * old + m * batch, m = 0.1.

    Stats live in the ``batch_stats`` collection. Under jit with a sharded
    batch, the mean/var reductions are global (XLA inserts the collectives),
    which is equivalent to synchronized cross-replica BN.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool) -> Array:
        # x: (B, T, C)
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # statistics accumulate in f32 regardless of compute dtype
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1))
            var = jnp.mean(jnp.square(xf), axis=(0, 1)) - jnp.square(mean)
            n = x.shape[0] * x.shape[1]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.eps) * scale
        # normalize in the compute dtype (halves HBM traffic under bf16;
        # exact f32 when compute_dtype is f32 — the parity-test path)
        dt = self.compute_dtype
        y = (x.astype(dt) - mean.astype(dt)) * inv.astype(dt) + bias.astype(dt)
        return y


def _flat_matmul(x3: Array, w: Array) -> Array:
    """(B, T, Cin) @ (Cin, Cout) as an explicitly 2-D (B·T, Cin) GEMM.

    The flattening is load-bearing on TPU, not cosmetic: a 3-D dot whose
    leading dim equals the 128-lane width tempts XLA's conv/dot emitter into
    batch-in-lanes operand layouts (EmitInputBatchInLanes), and layout
    assignment then propagates batch-minor {0,2,1} layouts through the whole
    step — at B=128 the flagship program grew 3,786 batch-minor ops, ~35 ms
    windowed-transpose fusions and 70 ms layout-conversion copies. A 2-D GEMM
    has no batch dim to mislay. (Measured: this + the custom-VJP backward
    lift B=64 from 76 to 80 steps/s / 41% MFU; the B=128 collapse on the
    tunneled harness persists regardless — its compiler footprint is 2.37 GB
    on a 16 GB chip with sublinear temps, B=96 at 2.03 GB scales cleanly, so
    that cliff is the harness's restricted HBM grant, not this layout issue —
    BENCH train_batch_curve.)"""
    B, T, Cin = x3.shape
    y = jnp.einsum(
        "nc,cf->nf", x3.reshape(B * T, Cin), w, preferred_element_type=x3.dtype
    )
    return y.reshape(B, T, w.shape[-1])


def _gemm_conv_taps(x: Array, kernel: Array, dilation: int) -> Array:
    """y[t] = Σ_j x[t + (j-c)·d] @ W_j — k shifted full-width MXU GEMMs
    ('SAME' zero padding, odd k). x: (B, T, Cin); kernel: (k, Cin, Cout)."""
    k = kernel.shape[0]
    p = (k // 2) * dilation
    T = x.shape[-2]
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    y = None
    for j in range(k):
        xj = jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, axis=-2)
        yj = _flat_matmul(xj, kernel[j])
        y = yj if y is None else y + yj
    return y


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gemm_conv(x: Array, kernel: Array, dilation: int, pallas_dw: bool = False) -> Array:
    return _gemm_conv_taps(x, kernel, dilation)


def _gemm_conv_fwd(x, kernel, dilation, pallas_dw):
    return _gemm_conv_taps(x, kernel, dilation), (x, kernel)


def _gemm_conv_bwd(dilation, pallas_dw, res, g):
    """Hand-written transpose of the tap-GEMM conv, as tap GEMMs.

    XLA's autodiff transpose of the forward pattern-matches into an actual
    convolution HLO, and at some batch sizes the TPU conv emitter picks a
    catastrophic strategy for it: at B=128 each of the 10 backward convs of
    the flagship ConvBlock stack compiled to a 52.7M-cycle kernel
    (EmitAllBatchInSublanes, ~35 ms EACH) — 75x the costliest op of the
    whole B=64 step. The same math written explicitly stays on the
    dense-GEMM path at every batch size:
      dW_j = x_j^T g            (one (Cin, B·T)x(B·T, Cout) GEMM per tap)
      dx   = Σ_j shift_{-j}(g @ W_j^T)   (the mirrored shifted-slice sum)
    Grad dtype matches the autodiff path: GEMMs in the primal dtype.
    Measured effect (v5e, BENCH r4): B=64 76 -> 80 steps/s (MFU 38.8 ->
    41.0%); the B=128 cliff on the tunneled harness is NOT cured — that one
    is the harness's restricted HBM grant (see _flat_matmul docstring)."""
    x, kernel = res
    k, Cin, Cout = kernel.shape
    p = (k // 2) * dilation
    B, T = x.shape[0], x.shape[-2]
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    gf = g.reshape(B * T, Cout)
    dk_taps = []
    dx = None
    # dW via the fused Pallas reduction when requested (impl='gemm_pdw'): all
    # three taps computed while x and g are VMEM-resident — x/g read ONCE
    # instead of once per tap. The tall-contraction dW GEMMs are the one
    # place tap fusion wins (measured v5e, (64,360,320)->320 d=2: 147.6 us
    # for 3 einsum taps vs 102.7 us fused = 1.44x); fwd/dx stay XLA GEMMs so
    # the surrounding bias/BN/GELU elementwise keeps fusing into them (a
    # full pallas_taps conv measured 2% SLOWER end-to-end for exactly that
    # reason — the pallas_call boundary blocks operand/epilogue fusion).
    use_pdw = pallas_dw and k == 3 and jax.default_backend() == "tpu"
    if use_pdw:
        from speech_decoding_tpu.ops.pallas.tap_conv import tap_conv_dw

        dk = tap_conv_dw(x, g, dilation).astype(g.dtype)
    for j in range(k):
        if not use_pdw:
            xj = jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, axis=-2)
            dk_taps.append(
                jnp.einsum(
                    "nc,nf->cf", xj.reshape(B * T, Cin), gf,
                    preferred_element_type=g.dtype,
                )
            )
        hj = jnp.einsum(
            "nf,cf->nc", gf, kernel[j], preferred_element_type=g.dtype
        ).reshape(B, T, Cin)
        hjp = jnp.pad(hj, ((0, 0), (p, p), (0, 0)))
        dxj = jax.lax.dynamic_slice_in_dim(
            hjp, 2 * p - j * dilation, T, axis=-2
        )
        dx = dxj if dx is None else dx + dxj
    return dx, (dk if use_pdw else jnp.stack(dk_taps))


_gemm_conv.defvjp(_gemm_conv_fwd, _gemm_conv_bwd)


class Conv1d(nn.Module):
    """1-D conv in (B, T, C) layout with torch-default init and 'SAME' padding.

    kernel_size=1 lowers to a pure MXU matmul. For kernel_size>1 two
    equivalent implementations are available:
      * impl='xla': lax.conv_general_dilated (rhs_dilation);
      * impl='gemm': k shifted full-width matmuls — y[t] = Σ_j x[t+(j-c)·d] Wj
        with zero padding at the edges. Identical math ('SAME', odd k), but
        expressed as dense (B·T, Cin)x(Cin, Cout) GEMMs the MXU tiles
        perfectly; often faster than the generic conv lowering for tiny k.
    """

    features: int
    kernel_size: int = 1
    dilation: int = 1
    use_bias: bool = True
    compute_dtype: Any = jnp.float32
    impl: str = "xla"  # or "gemm"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size
        kernel = self.param(
            "kernel",
            torch_conv_uniform(fan_in),
            (self.kernel_size, in_features, self.features),
            jnp.float32,
        )
        dt = self.compute_dtype
        x = x.astype(dt)
        k = self.kernel_size
        if self.impl in ("gemm", "gemm_pdw") and k > 1:
            assert k % 2 == 1, "gemm impl assumes odd kernels ('SAME' centering)"
            # custom VJP: keeps the BACKWARD pass on the dense-GEMM path too
            # (XLA's transpose re-forms a convolution and its TPU emitter
            # collapses at some batch sizes — see _gemm_conv_bwd).
            # 'gemm_pdw' additionally routes dW through the fused Pallas
            # 3-tap reduction (x/g read once; measured 1.44x on v5e).
            y = _gemm_conv(
                x, kernel.astype(dt), self.dilation, self.impl == "gemm_pdw"
            )
        elif self.impl == "pallas_taps" and k > 1:
            # ONE fused Pallas kernel per conv: all 3 taps computed while the
            # x row-block is VMEM-resident (x read once, y written once;
            # fused dW twin in backward) — lifts the per-tap GEMM off the
            # HBM-bandwidth roof (see ops/pallas/tap_conv.py)
            from speech_decoding_tpu.ops.pallas.tap_conv import pallas_tap_conv

            interpret = jax.default_backend() != "tpu"
            y = pallas_tap_conv(x, kernel.astype(dt), self.dilation, interpret)
        elif self.impl == "gemm_wide" and k > 1:
            # ONE (B·T, Cin)x(Cin, k·Cout) GEMM for all k taps, then k
            # shifted-slice adds (fused elementwise). Lane economics on the
            # MXU: Cout=320 occupies 2.5 128-lane tiles (~17% padding waste
            # per tap-GEMM); k·Cout=960 occupies 7.5->8 tiles (~6%), and the
            # GLU conv's k·2·Cout=1920 is exact. Same math as 'gemm':
            # y[t] = Σ_j z_j[t+(j-c)·d] with z_j = x @ W_j.
            assert k % 2 == 1, "gemm_wide assumes odd kernels ('SAME' centering)"
            d = self.dilation
            pad = (k // 2) * d
            T = x.shape[-2]
            kcat = kernel.transpose(1, 0, 2).reshape(in_features, k * self.features)
            zcat = jnp.einsum(
                "btc,cf->btf", x, kcat.astype(dt), preferred_element_type=dt
            )
            z = zcat.reshape(*zcat.shape[:-1], k, self.features)
            zp = jnp.pad(z, ((0, 0), (pad, pad), (0, 0), (0, 0)))
            y = None
            for j in range(k):
                yj = jax.lax.dynamic_slice_in_dim(zp[..., j, :], j * d, T, axis=-2)
                y = yj if y is None else y + yj
        elif k == 1 and self.impl in ("gemm", "gemm_pdw", "gemm_wide", "pallas_taps"):
            # 1x1 convs lower to one flattened 2-D GEMM (see _flat_matmul:
            # conv_general_dilated at B=128 picks batch-in-lanes layouts and
            # poisons the whole program); autodiff of a 2-D dot is 2-D dots,
            # so no custom VJP is needed here
            y = _flat_matmul(x, kernel[0].astype(dt))
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel.astype(dt),
                window_strides=(1,),
                padding="SAME",
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=dt,
            )
        if self.use_bias:
            bias = self.param(
                "bias", torch_conv_uniform(fan_in), (self.features,), jnp.float32
            )
            y = y + bias.astype(dt)
        return y


def spatial_dropout_mask(
    key: Array, loc: Array, d_drop: float, dtype: Any = jnp.float32
) -> Array:
    """Train-time spatial dropout mask: pick one random sensor as the drop
    center and zero every channel within Euclidean distance ``d_drop`` of it;
    the same center is used for the whole batch [ref: models.py:77-84].

    Returns a (C,) mask of zeros/ones.
    """
    num_channels = loc.shape[0]
    center_idx = jax.random.randint(key, (), 0, num_channels)
    center = jax.lax.dynamic_index_in_dim(loc, center_idx, axis=0, keepdims=False)
    distances = jnp.linalg.norm(loc - center, axis=-1)
    return jnp.where(distances < d_drop, 0.0, 1.0).astype(dtype)


class SpatialAttention(nn.Module):
    """Fourier-parameterized spatial re-mixing of sensor channels
    [ref: models.py:14-65].

    Attention logits over input channels: a = Re(z)·cos(phi) + Im(z)·sin(phi)
    with phi[kl, c] = 2*pi*(k*x_c + l*y_c) over a K×K grid of (k, l)
    frequencies and normalized 2-D sensor positions (x, y). Softmax over
    channels, then a channel mix. The cos/sin bases depend only on the static
    sensor layout and are precomputed host-side [ref: models.py:36-40].

    ``loc`` is a static (C, 2) numpy array of sensor positions in [0.1, 0.9]
    (see speech_decoding_tpu.data.layout).
    """

    D1: int
    K: int
    d_drop: float
    loc: Any  # static numpy (C, 2)
    compute_dtype: Any = jnp.float32

    def _bases(self) -> Tuple[np.ndarray, np.ndarray]:
        K = self.K
        loc = np.asarray(self.loc, np.float32)
        k = np.arange(K, dtype=np.float32).repeat(K)  # kl-major grid [ref: models.py:21-26]
        l = np.tile(np.arange(K, dtype=np.float32), K)
        phi = 2 * np.pi * (np.outer(k, loc[:, 0]) + np.outer(l, loc[:, 1]))  # (K^2, C)
        return np.cos(phi), np.sin(phi)

    @nn.compact
    def __call__(self, X: Array, deterministic: bool = True) -> Array:
        # X: (B, T, C)
        z_re = self.param("z_re", uniform01, (self.D1, self.K**2), jnp.float32)
        z_im = self.param("z_im", uniform01, (self.D1, self.K**2), jnp.float32)
        cos_b, sin_b = self._bases()
        cos_b = jnp.asarray(cos_b)
        sin_b = jnp.asarray(sin_b)

        # (D1, C) attention logits; softmax over channels [ref: models.py:49-58]
        a = z_re @ cos_b + z_im @ sin_b
        wts = jax.nn.softmax(a, axis=-1).astype(self.compute_dtype)

        if not deterministic:
            key = self.make_rng("dropout")
            mask = spatial_dropout_mask(
                key, jnp.asarray(self.loc, jnp.float32), self.d_drop, self.compute_dtype
            )
            # observable via mutable=["intermediates"] (no-op otherwise):
            # parity tests probe the exact mask a train step will draw
            self.sow("intermediates", "drop_mask", mask)
            X = X * mask[None, None, :]

        # channel mix: (B, T, C) @ (C, D1) -> (B, T, D1) [ref: models.py:65]
        return jnp.einsum(
            "btc,oc->bto", X.astype(self.compute_dtype), wts,
            preferred_element_type=self.compute_dtype,
        )


class SubjectBlock(nn.Module):
    """SpatialAttention -> shared 1x1 conv -> per-subject bias-free 1x1 conv
    [ref: models.py:89-117].

    The per-subject layer holds one (S, D1, D1) tensor and applies it with a
    gathered batched matmul — numerically identical to the reference's
    ModuleList loop (its test file proves the equivalence,
    tests/test_modules/models.py:33-35) and MXU-friendly.
    """

    num_subjects: int
    D1: int
    K: int
    d_drop: float
    loc: Any
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, X: Array, subject_idxs: Array, deterministic: bool = True) -> Array:
        X = SpatialAttention(
            self.D1, self.K, self.d_drop, self.loc, self.compute_dtype, name="spatial_attention"
        )(X, deterministic)
        X = Conv1d(self.D1, 1, compute_dtype=self.compute_dtype, name="conv")(X)
        # (S, D1_in, D1_out); torch conv weight (out, in, 1) transposed
        W = self.param(
            "subject_kernel",
            torch_conv_uniform(self.D1),
            (self.num_subjects, self.D1, self.D1),
            jnp.float32,
        ).astype(self.compute_dtype)
        if self.use_pallas:
            # scalar-prefetch kernel: no (B, D1, D1) gathered weights in HBM
            from speech_decoding_tpu.ops.pallas.subject_conv import subject_matmul

            interpret = jax.default_backend() != "tpu"
            return subject_matmul(X, W, subject_idxs, interpret)
        return jnp.einsum(
            "bti,bio->bto", X, W[subject_idxs], preferred_element_type=self.compute_dtype
        )


class ConvBlock(nn.Module):
    """Dilated conv block with residual skips, BN+GELU, and a GLU output
    [ref: models.py:120-166].

    dilations: conv0 = 2^((2k) % 5), conv1 = 2^((2k+1) % 5), conv2 = 2
    (the reference hard-codes 2 per the paper's figure [ref: models.py:149]).
    """

    k: int
    D2: int
    compute_dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, X: Array, use_running_average: bool = True) -> Array:
        d0 = 2 ** ((2 * self.k) % 5)
        d1 = 2 ** ((2 * self.k + 1) % 5)
        dt = self.compute_dtype
        impl = self.conv_impl

        Y = Conv1d(self.D2, 3, d0, compute_dtype=dt, impl=impl, name="conv0")(X)
        if self.k > 0:
            Y = Y + X  # skip [ref: models.py:156]
        Y = nn.gelu(
            TorchBatchNorm(self.D2, compute_dtype=dt, name="batchnorm0")(
                Y, use_running_average
            ),
            approximate=False,
        )
        Y = Conv1d(self.D2, 3, d1, compute_dtype=dt, impl=impl, name="conv1")(Y) + Y
        Y = nn.gelu(
            TorchBatchNorm(self.D2, compute_dtype=dt, name="batchnorm1")(
                Y, use_running_average
            ),
            approximate=False,
        )
        Y = Conv1d(2 * self.D2, 3, 2, compute_dtype=dt, impl=impl, name="conv2")(Y)
        a, b = jnp.split(Y, 2, axis=-1)  # GLU over channels [ref: models.py:164]
        return a * jax.nn.sigmoid(b)


class BrainEncoder(nn.Module):
    """SubjectBlock -> 5 ConvBlocks -> two 1x1 heads with GELU
    [ref: models.py:169-196].

    Public layout matches the reference: X (B, C, T) -> Z (B, F, T).
    ``F`` must already account for the last4layers override (the reference
    forces F=1024 when preprocs.last4layers [ref: models.py:176]); use
    ``BrainEncoder.from_config`` to apply that rule.
    """

    num_subjects: int
    loc: Any  # static numpy (C, 2) sensor positions
    D1: int = 270
    D2: int = 320
    F: int = 1024
    K: int = 32
    d_drop: float = 0.1
    compute_dtype: Any = jnp.float32
    remat: bool = False
    use_pallas: bool = False
    conv_impl: str = "xla"
    # channels_last_io: accept (B, T, C) and return (B, T, F) — the internal
    # layout — skipping the boundary transposes entirely (profiling shows the
    # (B,C,T)<->(B,T,C) swaps cost ~10-15% of a train step). Parameters and
    # math are identical; CLIP/retrieval flattens are permutation-invariant.
    channels_last_io: bool = False

    @classmethod
    def from_config(cls, args, loc, num_subjects: int) -> "BrainEncoder":
        F = 1024 if args.preprocs["last4layers"] else args.F  # [ref: models.py:176]
        dtype = jnp.dtype(args.select("tpu.compute_dtype", "float32"))
        use_pallas = args.select("tpu.use_pallas", None)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        return cls(
            num_subjects=num_subjects,
            loc=loc,
            D1=args.D1,
            D2=args.D2,
            F=F,
            K=args.K,
            d_drop=args.d_drop,
            compute_dtype=dtype,
            remat=bool(args.select("tpu.remat", False)),
            use_pallas=bool(use_pallas),
            conv_impl=str(args.select("tpu.conv_impl", "xla")),
            channels_last_io=bool(args.select("tpu.channels_last_io", False)),
        )

    @nn.compact
    def __call__(
        self,
        X: Array,
        subject_idxs: Array,
        train: bool = False,
        subject_only: bool = False,
    ) -> Array:
        """``subject_only=True`` stops after the SubjectBlock and returns the
        (B, T, D1) internal features — used by the fused train path
        (models/fused_train.py) so its spatial-dropout RNG stream (flax folds
        the module path into make_rng) is bit-identical to the full flax
        forward."""
        # reference layout in: (B, C, T) -> internal (B, T, C)
        if not self.channels_last_io:
            X = jnp.swapaxes(X, -1, -2)
        X = X.astype(self.compute_dtype)

        X = SubjectBlock(
            self.num_subjects,
            self.D1,
            self.K,
            self.d_drop,
            self.loc,
            self.compute_dtype,
            self.use_pallas,
            name="subject_block",
        )(X, subject_idxs, deterministic=not train)
        if subject_only:
            return X

        block_cls = ConvBlock
        if self.remat:
            block_cls = nn.remat(ConvBlock, static_argnums=(2,))
        for k in range(5):
            X = block_cls(
                k, self.D2, self.compute_dtype, self.conv_impl, name=f"conv{k}"
            )(X, not train)

        X = nn.gelu(
            Conv1d(2 * self.D2, 1, compute_dtype=self.compute_dtype, name="conv_final1")(X),
            approximate=False,
        )
        X = nn.gelu(
            Conv1d(self.F, 1, compute_dtype=self.compute_dtype, name="conv_final2")(X),
            approximate=False,
        )
        if self.channels_last_io:
            return X  # (B, T, F)
        return jnp.swapaxes(X, -1, -2)  # back to (B, F, T)
