from speech_decoding_tpu.data.layout import ch_locations_2d

__all__ = ["ch_locations_2d"]
