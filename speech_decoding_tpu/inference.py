"""Inference / serving API.

The reference has no inference path at all (training script only; save-only
checkpoints [ref: train.py:259]). For deployment this module provides:

  * ``SpeechDecoder.from_checkpoint`` — restore a trained encoder (+ the
    frozen segment bank of candidate speech embeddings);
  * ``encode`` — jitted batched brain -> embedding encoding (eval mode);
  * ``retrieve`` — top-k candidate speech segments for each brain segment
    against the bank (the Classifier's similarity, as a serving op; Pallas
    streaming kernel on TPU for large banks);
  * ``decode`` — encode + retrieve in one call;
  * ``bank_from_audio`` — build the candidate bank directly from raw audio
    clips with the flax wav2vec2 (the training audio pipeline's embed chain
    [ref: dataclass/gwilliams2022.py:327-387] as a serving op);
  * ``SpeechDecoder.decode_stream`` — sliding-window decoding of a
    continuous recording.

All compute is jitted once and reused across requests; the bank is
device-resident.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speech_decoding_tpu.models.brain_encoder import BrainEncoder

Array = jax.Array


def retrieve_topk(Z: Array, bank_norm: Array, k: int = 10) -> Tuple[Array, Array]:
    """Top-k candidates per brain embedding: cosine similarity of flattened
    embeddings against L2-normalized bank rows, reference orientation
    [ref: models.py:226-243]. ``bank_norm`` is (N, F*T) row-normalized (see
    ``SpeechDecoder.set_bank``); returns (scores, ids) each (B, min(k, N))
    — ``k`` is clamped to the bank size (lax.top_k would otherwise fail with
    a low-level shape error on small candidate sets). Pure — pass
    ``bank_norm`` as a jit argument (large banks must not be closure
    constants)."""
    z = jnp.reshape(Z.astype(jnp.float32), (Z.shape[0], -1))
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    sim = jnp.matmul(z, bank_norm.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(sim, min(int(k), bank_norm.shape[0]))


def quantize_rows_int8(rows: Array) -> Tuple[Array, Array]:
    """Per-row symmetric int8 quantization: returns (q (N, D) int8,
    scale (N,) f32) with q * scale ~= rows. The ONE quantization scheme for
    int8 retrieval banks — ``SpeechDecoder.set_bank`` and bench.py both use
    it, so the benchmark measures exactly the production path."""
    scale = jnp.maximum(jnp.max(jnp.abs(rows), axis=-1), 1e-8) / 127.0
    q = jnp.round(rows / scale[:, None]).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def retrieve_topk_int8(
    Z: Array, bank_q: Array, bank_scale: Array, k: int = 10
) -> Tuple[Array, Array]:
    """``retrieve_topk`` against an int8-quantized bank: the query is
    row-quantized to int8 on the fly and the (B, N) similarity is ONE
    bf16-compute matmul over the int8-STORED operands — 4x less bank HBM
    traffic than f32, for ~1e-2 relative score error (per-row symmetric
    1/127 quantization of unit-norm vectors). bank_q: (N, D) int8;
    bank_scale: (N,) float32.

    Why bf16 compute instead of an int8 x int8 -> int32 dot: int8-ranged
    values (and their products) are exact in bf16/f32 — the MXU multiplies
    bf16 exactly and accumulates in f32, so there is NO int32 overflow at
    any D (a single int32 dot at flagship D = F*T = 369k could reach
    D * 127^2 ~ 5.9e9 > 2^31 for flat-magnitude rows and wrap negative,
    which forced an earlier version of this op into 2^17-term chunks with
    (n, B, N) int32 partials). XLA fuses the int8 -> bf16 convert into the
    dot's operand read, so the bank never materializes wide in HBM —
    measured on v5e (tools/ab_int8_retrieval.py, B=256 flagship rows) the
    unchunked bf16 contraction beats the chunked-int32 path 1.4-1.6x and
    f32 retrieval at EVERY bank size (1.09x at 512 rows, 1.69x at 2,048,
    2.08x at 4,096), with identical top-1 ids. f32 accumulation differs
    from exact integer math by ~1e-7 relative — five orders below the
    quantization error."""
    z = jnp.reshape(Z.astype(jnp.float32), (Z.shape[0], -1))
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    zscale = jnp.maximum(jnp.max(jnp.abs(z), axis=-1, keepdims=True), 1e-8) / 127.0
    zq = jnp.round(z / zscale).astype(jnp.int8)
    sim = jnp.matmul(
        zq.astype(jnp.bfloat16),
        bank_q.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    sim = sim * zscale * bank_scale[None, :]
    return jax.lax.top_k(sim, min(int(k), bank_q.shape[0]))


def bank_from_audio(
    wav2vec,
    waveforms: np.ndarray,
    sample_rate: int,
    segment_len: int,
    brain_rate: float = 120.0,
    audio_rate: int = 16000,
    lowpass_filter_width: int = 6,
    batch_size: int = 16,
    last4layers: bool = True,
) -> np.ndarray:
    """Raw candidate audio clips -> a (N, F, segment_len) retrieval bank.

    Runs the training audio pipeline's embed chain per clip
    [ref: dataclass/gwilliams2022.py:327-387]: windowed-sinc resample to
    ``audio_rate`` -> wav2vec2 last-4-layer mean (or the conv
    feature-extractor path when ``last4layers=False``, mirroring the
    ``preprocs.last4layers`` training flag [ref: brennan2018.py:187-189]) ->
    FFT resample from the model's frame rate to ``brain_rate`` ->
    crop/zero-pad to ``segment_len``. The result is
    ``SpeechDecoder.set_bank``-ready (reference (N, F, T) layout
    [ref: models.py:226]); its feature dim must match the encoder's F.

    ``waveforms`` is (N, L) mono f32, all clips the same length (static
    shapes: one wav2vec compile, reused across ``batch_size`` chunks).

    Note: the training pipeline embeds the CONTINUOUS stimulus and slices
    segments out of the embedding; per-clip embedding (this op) differs
    slightly near clip edges (the conv extractor's receptive field). For a
    bank bit-identical to training targets, slice the dataset's cached Y
    instead; this op is for serving novel candidate audio.
    """
    from speech_decoding_tpu.ops.resample import fft_resample, sinc_resample

    waveforms = np.asarray(waveforms, np.float32)
    assert waveforms.ndim == 2, f"(N, L) mono clips expected, got {waveforms.shape}"
    n = waveforms.shape[0]
    # zero-pad the clip COUNT to a batch_size multiple: every chunk then has
    # the same shape, so the (expensive) wav2vec program compiles once —
    # embedding is per-sample independent, padded rows are discarded below
    if n % batch_size:
        pad_rows = batch_size - n % batch_size
        waveforms = np.concatenate(
            [waveforms, np.zeros((pad_rows, waveforms.shape[1]), np.float32)]
        )
    outs = []
    for i in range(0, waveforms.shape[0], batch_size):
        wav = jnp.asarray(waveforms[i : i + batch_size])
        if sample_rate != audio_rate:
            wav = sinc_resample(
                wav, sample_rate, audio_rate,
                lowpass_filter_width=lowpass_filter_width,
            )
        emb = wav2vec.last4_mean(wav) if last4layers else wav2vec.features(wav)
        # (b, T_emb, F)
        emb = jnp.swapaxes(emb, -1, -2)  # (b, F, T_emb)
        # frame rate of the embedding, from realized lengths (the conv
        # extractor's stride product is not exactly 320 at every length)
        rate_after = audio_rate * emb.shape[-1] / wav.shape[-1]
        emb = fft_resample(emb, up=float(brain_rate) / rate_after)
        t = emb.shape[-1]
        if t >= segment_len:
            emb = emb[..., :segment_len]
        else:
            emb = jnp.pad(emb, ((0, 0), (0, 0), (0, segment_len - t)))
        outs.append(np.asarray(emb, np.float32))
    return np.concatenate(outs, axis=0)[:n]


def _gelu_dense(h: Array, conv_params, dtype) -> Array:
    """1x1 conv head (kernel (1, Cin, Cout)) + exact GELU in (B, T, C)."""
    w = jnp.asarray(conv_params["kernel"], dtype)[0]
    b = jnp.asarray(conv_params["bias"], dtype)
    return jax.nn.gelu(
        jnp.dot(h.astype(dtype), w, preferred_element_type=dtype) + b,
        approximate=False,
    )


class SpeechDecoder:
    """Serving wrapper around a trained BrainEncoder and a speech-segment
    bank Y_bank (N, F, T)."""

    def __init__(
        self,
        encoder: BrainEncoder,
        params,
        batch_stats,
        bank: Optional[Array] = None,
        use_fused_blocks: Optional[bool] = None,
    ):
        self.encoder = encoder
        self._variables = {"params": params, "batch_stats": batch_stats}
        if use_fused_blocks is None:
            use_fused_blocks = jax.default_backend() == "tpu"
        if use_fused_blocks:
            # serving path: subject block -> fused Pallas ConvBlocks (whole
            # block VMEM-resident, eval BN folded; ~13% faster than the XLA
            # stack on v5e) -> 1x1 heads
            from speech_decoding_tpu.models.brain_encoder import SubjectBlock
            from speech_decoding_tpu.ops.pallas.conv_block import (
                apply_fused_stack,
                prepare_fused_stack,
            )

            staged = prepare_fused_stack(
                params, batch_stats, dtype=encoder.compute_dtype
            )
            sb = SubjectBlock(
                encoder.num_subjects, encoder.D1, encoder.K, encoder.d_drop,
                encoder.loc, encoder.compute_dtype,
            )
            interpret = jax.default_backend() != "tpu"
            cl = encoder.channels_last_io

            def encode_fn(X, sidx):
                if not cl:
                    X = jnp.swapaxes(X, -1, -2)
                h = sb.apply(
                    {"params": params["subject_block"]}, X, sidx, True
                )
                h = apply_fused_stack(staged, h, interpret=interpret)
                h = _gelu_dense(h, params["conv_final1"], encoder.compute_dtype)
                h = _gelu_dense(h, params["conv_final2"], encoder.compute_dtype)
                return h if cl else jnp.swapaxes(h, -1, -2)

            self.encode_fn = jax.jit(encode_fn)
        else:
            self.encode_fn = jax.jit(
                lambda X, sidx: encoder.apply(self._variables, X, sidx, train=False)
            )
        self._bank_norm = None
        self._bank_q = self._bank_scale = None
        self._retrieve_jit = None
        if bank is not None:
            self.set_bank(bank)

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_dir: str,
        encoder: BrainEncoder,
        sample_X: np.ndarray,
        bank: Optional[np.ndarray] = None,
        epoch: Optional[int] = None,
        best: bool = False,
    ) -> "SpeechDecoder":
        """Restore encoder params/BN stats from an orbax checkpoint written by
        training.checkpoint.CheckpointManager. ``best=True`` serves the
        tracked best-metric checkpoint instead of the latest."""
        from speech_decoding_tpu.training.checkpoint import CheckpointManager
        from speech_decoding_tpu.training.state import create_train_state

        state = create_train_state(
            encoder,
            jax.random.PRNGKey(0),
            jnp.asarray(sample_X),
            jnp.zeros((sample_X.shape[0],), jnp.int32),
        )
        mgr = CheckpointManager(
            checkpoint_dir, track_metric="testTop10acc" if best else None
        )
        # params/stats only: serving never needs the optimizer state, whose
        # pytree shape depends on training wiring (MultiSteps for Brennan)
        state, _ = mgr.restore_for_eval(state, epoch, best=best)
        return cls(
            encoder,
            state.params["encoder"],
            state.batch_stats,
            None if bank is None else jnp.asarray(bank),
        )

    # -- serving ops ----------------------------------------------------------

    def set_bank(self, bank: Array, mesh=None, store_dtype: str = "float32") -> None:
        """Install the candidate speech-embedding bank, reference layout
        (N, F, T) [ref: models.py:226]; rows are L2-normalized once,
        device-resident. With ``mesh`` (a jax Mesh with a "data" axis), the
        normalized bank is sharded over that axis — for banks too large for
        one chip's HBM (flagship segments are F·T = 369k floats each), GSPMD
        partitions the (B, N) similarity matmul per shard and gathers only
        the (B, k) winners across ICI.

        The flatten order must match ``encode``'s output layout: a
        channels-last encoder emits (B, T, F), so the bank is transposed to
        (N, T, F) before flattening — otherwise the cosine similarity would
        compare differently-permuted vectors. A channels-last ``encode``
        output passed here directly (the self-bank idiom) is therefore
        (N, T, F), the WRONG layout — that mix-up is detected by the
        feature-axis check below and raises instead of silently mis-ranking
        (swap the last two axes first).

        Only the normalized (and optionally quantized) flat rows are kept:
        a host (numpy) bank is reshaped host-side and transferred straight
        into its final (sharded) layout, so a bank larger than one chip's
        HBM never materializes f32 on a single device."""
        nf = self.encoder.F
        if bank.ndim != 3 or bank.shape[1] != nf:
            hint = (
                " — an (N, T, F) array (e.g. a channels-last encode() "
                "output): jnp.swapaxes(bank, -1, -2) first"
                if bank.ndim == 3 and bank.shape[2] == nf
                else " — the bank's feature dim must equal the encoder's F"
            )
            raise ValueError(
                f"bank must be reference layout (N, F={nf}, T), got "
                f"{tuple(bank.shape)}{hint}"
            )
        # a new bank may switch f32 <-> int8: rebuild the jitted retrieval
        self._retrieve_jit = None
        self._bank_norm = None
        self._bank_q = self._bank_scale = None
        rows = scale_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rows = NamedSharding(mesh, PartitionSpec("data", None))
            scale_sh = NamedSharding(mesh, PartitionSpec("data"))
        if isinstance(bank, np.ndarray):
            # host path: transpose/flatten in numpy, transfer once into the
            # final row layout (sharded when a mesh is given)
            arr = np.asarray(bank, np.float32)
            if self.encoder.channels_last_io:
                arr = np.swapaxes(arr, -1, -2)
            flat_host = np.ascontiguousarray(arr.reshape(arr.shape[0], -1))
            flat = (
                jax.device_put(flat_host, rows)
                if rows is not None
                else jnp.asarray(flat_host)
            )
        else:
            flat = jnp.asarray(bank, jnp.float32)
            if self.encoder.channels_last_io:
                flat = jnp.swapaxes(flat, -1, -2)
            flat = jnp.reshape(flat, (flat.shape[0], -1))
            if rows is not None:
                flat = jax.device_put(flat, rows)
        # row-wise normalize (and quantize) AFTER placement: elementwise /
        # per-row ops run shard-local under GSPMD, so nothing gathers
        norm = jnp.linalg.norm(flat, axis=-1, keepdims=True)
        bank_norm = flat / jnp.maximum(norm, 1e-8)
        self._bank_q = self._bank_scale = self._bank_norm = None
        if store_dtype == "int8":
            # per-row symmetric quantization of the unit-norm rows: 4x less
            # HBM for the bank; retrieval contracts the int8-stored rows in
            # bf16 (see retrieve_topk_int8 — ~1e-2 relative score error)
            self._bank_q, self._bank_scale = quantize_rows_int8(bank_norm)
            if rows is not None:
                self._bank_q = jax.device_put(self._bank_q, rows)
                self._bank_scale = jax.device_put(self._bank_scale, scale_sh)
        elif store_dtype == "float32":
            self._bank_norm = bank_norm
        else:
            raise ValueError(f"store_dtype must be float32 or int8, got {store_dtype}")

    def encode(self, X: np.ndarray, subject_idxs: np.ndarray) -> Array:
        """Brain segments (B, C, T) -> embeddings (B, F, T), eval mode."""
        return self.encode_fn(jnp.asarray(X), jnp.asarray(subject_idxs, jnp.int32))

    def retrieve(self, Z: Array, k: int = 10) -> Tuple[Array, Array]:
        """Top-k bank candidates per brain embedding: returns (scores, ids)
        each (B, k). Cosine similarity, reference orientation
        [ref: models.py:226-243]. Jitted once per k (decode_stream calls this
        per window batch; eager dispatch would re-trace the quantize +
        contraction + top_k chain on every call)."""
        if self._retrieve_jit is None:
            self._retrieve_jit = jax.jit(
                retrieve_topk_int8
                if self._bank_q is not None
                else retrieve_topk,
                static_argnames=("k",),
            )
        if self._bank_q is not None:
            return self._retrieve_jit(Z, self._bank_q, self._bank_scale, k=k)
        assert self._bank_norm is not None, "call set_bank() first"
        return self._retrieve_jit(Z, self._bank_norm, k=k)

    def decode(
        self, X: np.ndarray, subject_idxs: np.ndarray, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        scores, ids = self.retrieve(self.encode(X, subject_idxs), k)
        return np.asarray(scores), np.asarray(ids)

    def decode_stream(
        self,
        X: np.ndarray,
        subject_idx: int,
        segment_len: int,
        hop: Optional[int] = None,
        k: int = 10,
        batch_size: int = 64,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Sliding-window decoding of one CONTINUOUS recording.

        ``X`` is the preprocessed recording — (C, T_total), or (T_total, C)
        when the encoder is channels-last — windowed into segments of
        ``segment_len`` samples every ``hop`` samples (default: segment_len,
        non-overlapping), batch-decoded against the bank. Returns
        (scores (W, k), ids (W, k), onsets (W,) in samples). The final
        partial batch is zero-padded to ``batch_size`` so the whole stream
        reuses ONE compiled program (XLA recompiles per shape), then trimmed.
        """
        assert (
            self._bank_norm is not None or self._bank_q is not None
        ), "call set_bank() first"
        X = np.asarray(X, np.float32)
        assert X.ndim == 2, f"one continuous recording expected, got {X.shape}"
        time_axis = 0 if self.encoder.channels_last_io else 1
        total = X.shape[time_axis]
        hop = segment_len if hop is None else int(hop)
        assert hop >= 1 and total >= segment_len, (total, segment_len, hop)
        onsets = np.arange(0, total - segment_len + 1, hop)

        def window(o):  # plain slice, no copy until np.stack
            return (
                X[o : o + segment_len] if time_axis == 0 else X[:, o : o + segment_len]
            )

        scores, ids = [], []
        sidx = np.full((batch_size,), subject_idx, np.int32)
        # windows are materialized ONE BATCH at a time: stacking all W
        # windows up front would copy W × C × segment_len floats (~130 GB
        # for an hour-long recording at hop=1) when only batch_size are
        # ever in flight
        for i in range(0, len(onsets), batch_size):
            chunk = onsets[i : i + batch_size]
            w = np.stack([window(o) for o in chunk])
            pad = batch_size - w.shape[0]
            if pad:
                w = np.concatenate([w, np.zeros((pad,) + w.shape[1:], w.dtype)])
            s, t = self.retrieve(self.encode(w, sidx), k)
            scores.append(np.asarray(s)[: batch_size - pad])
            ids.append(np.asarray(t)[: batch_size - pad])
        return np.concatenate(scores), np.concatenate(ids), onsets
