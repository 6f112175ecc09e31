"""Device-resident Gwilliams data path: train with ZERO per-step host
transfers.

The host path assembles every batch from host arrays and ships ~115 MB/step
to the device (X 19 MB + Y 94 MB + stats at B=64); on hosts with slow or busy
links that dwarfs the 15 ms step. Here the preprocessed recordings, the
unsegmented task embeddings, and the per-word scale stats live ON DEVICE as
padded stacks; each step ships only a few hundred bytes of int32 indices and
one jitted gather builds the batch in HBM:

  * X: (R, C, T_max) stack over session-task recordings; windows via
    vmap(dynamic_slice) at onset indices (the reference's lazy onset slicing
    [ref: gwilliams2022.py:137-138], now in-graph);
  * Y: (n_tasks, F, T_ymax) unsegmented task embeddings; word windows gathered
    the same way [ref: gwilliams2022.py:153-161];
  * per-word robust-scale stats packed (R, W_max, C, 2).

Random-session sampling semantics match sample_batch exactly (same RNG draw
sequence), so the host and device paths produce identical batches.

Memory: the full MEG-MASC train set is ~6 GB of recordings + ~3 GB of task
embeddings in f32 (halve with store_dtype=bfloat16) — sized for a full v5e
HBM; use the host path (Prefetcher-overlapped) when it doesn't fit.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _quantize_i16(stack: np.ndarray, channel_axis: int):
    """Per-(array, channel) symmetric int16 quantization over the time axis:
    returns (q int16, scale f32 (N, C)). /32766 with round-half-up keeps the
    rounded values inside int16 with no clip pass (the _ship_raw convention,
    ops/brain_preproc.py); ~90 dB SNR on raw M/EEG dynamic range.

    CONSUMES ``stack`` (quantizes in place): the full MEG-MASC stack is ~6 GB
    f32, and an out-of-place divide would transiently hold a second 6 GB copy
    on a path whose whole point is fitting big data."""
    time_axis = 1 if channel_axis == 2 else 2
    scale = np.abs(stack).max(axis=time_axis) / 32766.0  # (N, C)
    scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
    denom = scale[:, None, :] if channel_axis == 2 else scale[:, :, None]
    np.divide(stack, denom, out=stack)
    stack += np.float32(0.5)
    np.floor(stack, out=stack)
    return stack.astype(np.int16), scale


class DeviceResidentGwilliams:
    """Wraps a built Gwilliams2022 dataset; provides make_index_batch (host,
    cheap) + gather (jitted device batch assembly)."""

    def __init__(self, dataset, store_dtype=jnp.float32, channels_last: bool = False):
        """channels_last: store stacks time-major and emit (B, T, C)/(B, T, F)
        batches for a channels_last_io encoder — eliminates every layout
        transpose in the train step (~10-15% of step time).

        store_dtype: float32, bfloat16 (half HBM, ~0.2% error), or int16
        (half HBM with per-(array, channel) symmetric scales — ~90 dB SNR,
        strictly more accurate than bfloat16 at the same size; dequantized
        inside the jitted gather, fusing into the collate)."""
        self.ds = dataset
        self.channels_last = channels_last
        self.quantized = jnp.dtype(store_dtype) == jnp.int16
        L = dataset.seq_len_samp
        self.seq_len = L

        # ---- X stack ----
        keys = list(dataset.X.keys())
        self.keys = keys
        rec_index: Dict[Tuple[str, str], int] = {}
        recs = []
        for key in keys:
            for task, X in dataset.X[key].items():
                rec_index[(key, task)] = len(recs)
                recs.append(np.asarray(X, np.float32))
        T_max = max(r.shape[-1] for r in recs) + L  # slack so onset+L is in range
        C = recs[0].shape[0]
        if channels_last:
            X_stack = np.zeros((len(recs), T_max, C), np.float32)
            for i, r in enumerate(recs):
                X_stack[i, : r.shape[-1]] = r.T
        else:
            X_stack = np.zeros((len(recs), C, T_max), np.float32)
            for i, r in enumerate(recs):
                X_stack[i, :, : r.shape[-1]] = r
        if self.quantized:
            X_stack, x_scale = _quantize_i16(X_stack, channel_axis=2 if channels_last else 1)
            self.x_scale = jnp.asarray(x_scale)  # (R, C)
        self.X_stack = jnp.asarray(X_stack, store_dtype)
        self.rec_index = rec_index

        # ---- Y task stack (unsegmented; gathered by word onset) ----
        y_dict = np.load(
            os.path.join(dataset.preproc_dir, "y_dict.npy"), allow_pickle=True
        ).item()
        tasks = sorted(y_dict.keys(), key=lambda s: int(s[-1]))
        F = next(iter(y_dict.values())).shape[0]
        Ty_max = max(y.shape[-1] for y in y_dict.values()) + L
        if channels_last:
            Y_stack = np.zeros((len(tasks), Ty_max, F), np.float32)
            for i, t in enumerate(tasks):
                Y_stack[i, : y_dict[t].shape[-1]] = y_dict[t].T
        else:
            Y_stack = np.zeros((len(tasks), F, Ty_max), np.float32)
            for i, t in enumerate(tasks):
                Y_stack[i, :, : y_dict[t].shape[-1]] = y_dict[t]
        if self.quantized:
            Y_stack, y_scale = _quantize_i16(Y_stack, channel_axis=2 if channels_last else 1)
            self.y_scale = jnp.asarray(y_scale)  # (n_tasks, F)
        self.Y_stack = jnp.asarray(Y_stack, store_dtype)

        # ---- per-word scale stats packed (R, W_max, C, 2) ----
        W_max = max(
            len(dataset.meg_onsets[key][task]) for key in keys for task in dataset.X[key]
        )
        stats = np.zeros((len(recs), W_max, C, 2), np.float32)
        stats[..., 1] = 1.0
        onsets = np.zeros((len(recs), W_max), np.int32)
        for (key, task), r in rec_index.items():
            s = dataset.scale_stats[key][task]
            stats[r, : len(s)] = s
            o = dataset.meg_onsets[key][task]
            onsets[r, : len(o)] = o
        self.stats_stack = jnp.asarray(stats)
        self.onsets_stack = jnp.asarray(onsets)

        self.subject_of_rec = jnp.asarray(
            [
                int(np.where(dataset.valid_subjects == key.split("_")[0])[0][0])
                for (key, task), _ in sorted(rec_index.items(), key=lambda kv: kv[1])
            ],
            jnp.int32,
        )
        self.seg_task_ids = np.asarray(dataset.segment_task_ids)
        self.seg_y_onsets = np.asarray(dataset.segment_y_onsets)

        if not self.quantized:
            self.x_scale = self.y_scale = None
        self._gather = jax.jit(partial(_gather_batch, L, channels_last))

    def make_index_batch(
        self,
        rng: np.random.Generator,
        segment_ids: np.ndarray,
        choices: np.ndarray = None,
    ) -> Dict[str, np.ndarray]:
        """Host-side index selection — the SAME rng draw sequence as
        Gwilliams2022DatasetBase.sample_batch (one integers(len(keys)) draw
        per segment; key order matches, so ``choices`` from
        ``dataset.draw_choices`` selects identical sessions)."""
        if choices is None:
            choices = self.ds.draw_choices(rng, len(segment_ids))
        rec_idx, word_idx = [], []
        for i, choice in zip(segment_ids, choices):
            i_in_task, task = self.ds.segment_to_task(int(i))
            key = self.keys[int(choice)]
            rec_idx.append(self.rec_index[(key, task)])
            word_idx.append(i_in_task)
        return {
            "rec_idx": np.asarray(rec_idx, np.int32),
            "word_idx": np.asarray(word_idx, np.int32),
            "task_idx": self.seg_task_ids[segment_ids],
            "y_onset": self.seg_y_onsets[segment_ids],
        }

    def gather(self, idx: Dict[str, np.ndarray]) -> Dict[str, Array]:
        """Jitted device batch assembly from int32 indices (~bytes shipped)."""
        return self._gather(
            self.X_stack,
            self.Y_stack,
            self.stats_stack,
            self.onsets_stack,
            self.subject_of_rec,
            self.x_scale,
            self.y_scale,
            {k: jnp.asarray(v) for k, v in idx.items()},
        )


def _gather_batch(L, channels_last, X_stack, Y_stack, stats_stack, onsets_stack,
                  subject_of_rec, x_scale, y_scale, idx):
    def one(rec, word, task, y_on):
        onset = onsets_stack[rec, word]
        if channels_last:
            x = jax.lax.dynamic_slice(
                X_stack[rec], (onset, 0), (L, X_stack.shape[2])
            )
            y = jax.lax.dynamic_slice(
                Y_stack[task], (y_on, 0), (L, Y_stack.shape[2])
            )
        else:
            x = jax.lax.dynamic_slice(
                X_stack[rec], (0, onset), (X_stack.shape[1], L)
            )
            y = jax.lax.dynamic_slice(
                Y_stack[task], (0, y_on), (Y_stack.shape[1], L)
            )
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
        if x_scale is not None:  # int16 storage: per-(array, channel) dequant
            sx = x_scale[rec]
            sy = y_scale[task]
            if channels_last:
                x = x * sx[None, :]
                y = y * sy[None, :]
            else:
                x = x * sx[:, None]
                y = y * sy[:, None]
        return x, y, stats_stack[rec, word], subject_of_rec[rec]

    X, Y, stats, sidx = jax.vmap(one)(
        idx["rec_idx"], idx["word_idx"], idx["task_idx"], idx["y_onset"]
    )
    return {
        "X": X.astype(jnp.float32),
        "Y": Y.astype(jnp.float32),
        "scale_stats": stats,
        "subject_idxs": sidx,
    }
