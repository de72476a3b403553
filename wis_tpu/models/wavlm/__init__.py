from wis_tpu.models.wavlm.model import (
    WavLMConfig,
    default_embedder,
    load_or_init_wavlm,
    xvector_embed,
)

__all__ = [
    "WavLMConfig",
    "xvector_embed",
    "load_or_init_wavlm",
    "default_embedder",
]
