from wis_tpu.runtime.residency import LoadedModel, ModelRegistry
from wis_tpu.runtime.engine import TranscriptionResult, WhisperEngine

__all__ = ["ModelRegistry", "LoadedModel", "WhisperEngine", "TranscriptionResult"]
