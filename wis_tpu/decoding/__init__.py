from wis_tpu.decoding.beam import GenerateResult, build_generate
from wis_tpu.decoding.detect import build_detect_language

__all__ = ["build_generate", "build_detect_language", "GenerateResult"]
