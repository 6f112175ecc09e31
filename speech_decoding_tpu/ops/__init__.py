from speech_decoding_tpu.ops.scaling import (
    baseline_correct,
    clamp,
    gwilliams_collate,
    robust_scale,
)

__all__ = ["baseline_correct", "clamp", "gwilliams_collate", "robust_scale"]
