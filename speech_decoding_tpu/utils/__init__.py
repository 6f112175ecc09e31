from speech_decoding_tpu.utils.logging import cprint, get_logger
from speech_decoding_tpu.utils.reproducibility import seed_everything

__all__ = ["cprint", "get_logger", "seed_everything"]
