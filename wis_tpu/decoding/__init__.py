from wis_tpu.decoding.beam import (
    GenerateResult,
    build_encode,
    build_generate,
    build_generate_xa,
    trim_tokens,
)
from wis_tpu.decoding.detect import (
    build_detect_language,
    build_detect_language_xa,
    lang_index_to_code,
)

__all__ = [
    "build_encode",
    "build_generate",
    "build_generate_xa",
    "build_detect_language",
    "build_detect_language_xa",
    "lang_index_to_code",
    "GenerateResult",
    "trim_tokens",
]
