"""speech_decoding_tpu — a TPU-native (JAX/XLA/Pallas) speech-decoding framework.

A from-scratch rebuild of the capabilities of SeanNobel/speech-decoding
(a PyTorch implementation of Défossez et al. 2022, arXiv 2208.12266):
training a convolutional brain encoder that maps M/EEG sensor time-series into
the embedding space of a frozen wav2vec 2.0 model with a CLIP-style contrastive
loss, evaluated by segment retrieval.

Design notes (TPU-first, not a port):
  * All compute-path code is JAX (jit/pjit over a device mesh); hot ops have
    Pallas TPU kernels with XLA fallbacks.
  * M/EEG preprocessing (band-pass FIR, resampling, robust scaling, baseline
    correction) is implemented as batched XLA ops instead of the reference's
    20-process CPU pool [ref: speech_decoding/dataclass/gwilliams2022.py:298].
  * The B×B CLIP similarity and retrieval eval are sharded over the mesh
    [ref: speech_decoding/utils/loss.py:68, speech_decoding/models.py:226].
  * Model internals use (batch, time, channels) layout so the feature dim maps
    to TPU lanes; the public API accepts the reference's (batch, channels,
    time) layout.
"""

__version__ = "0.1.0"

from speech_decoding_tpu.config import Config, load_config, default_config

# Subpackage map (imported lazily by users to keep `import speech_decoding_tpu`
# light): models (BrainEncoder, CLIPLoss, wav2vec2), ops (DSP + pallas
# kernels), data (datasets, layouts, device-resident batcher, synthetic
# generators), parallel (mesh, sharded loss/retrieval, multihost), training
# (steps, Trainer, checkpoints), inference (SpeechDecoder), utils.

__all__ = ["Config", "load_config", "default_config", "__version__"]
