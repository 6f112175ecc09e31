"""Test fixtures — thin re-export of the package's synthetic data generators."""

from speech_decoding_tpu.data.synthetic import (  # noqa: F401
    make_brennan_tree,
    make_config,
    make_gwilliams_tree,
    tiny_wav2vec,
)
