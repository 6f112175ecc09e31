from speech_decoding_tpu.ops.pallas.retrieval import retrieval_ranks_pallas

__all__ = ["retrieval_ranks_pallas"]
