from speech_decoding_tpu.parallel.mesh import make_mesh, shard_batch
from speech_decoding_tpu.parallel.clip_sharded import (
    clip_loss_sharded,
    retrieval_metrics_sharded,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "clip_loss_sharded",
    "retrieval_metrics_sharded",
]
