from speech_decoding_tpu.models.brain_encoder import (
    BrainEncoder,
    ConvBlock,
    SpatialAttention,
    SubjectBlock,
    spatial_dropout_mask,
)
from speech_decoding_tpu.models.classifier import Classifier, retrieval_metrics
from speech_decoding_tpu.models.loss import CLIPLoss, clip_loss, mse_loss

__all__ = [
    "BrainEncoder",
    "ConvBlock",
    "SpatialAttention",
    "SubjectBlock",
    "spatial_dropout_mask",
    "Classifier",
    "retrieval_metrics",
    "CLIPLoss",
    "clip_loss",
    "mse_loss",
]
