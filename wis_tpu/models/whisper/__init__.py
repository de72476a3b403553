from wis_tpu.models.whisper.config import WHISPER_CONFIGS, WhisperConfig
from wis_tpu.models.whisper.model import (
    decode_step,
    encode,
    prefill,
)
from wis_tpu.models.whisper.weights import load_or_init_params

__all__ = [
    "WhisperConfig",
    "WHISPER_CONFIGS",
    "encode",
    "prefill",
    "decode_step",
    "load_or_init_params",
]
