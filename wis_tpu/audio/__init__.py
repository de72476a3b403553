from wis_tpu.audio.mel import (
    CHUNK_LENGTH,
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_MELS,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)
from wis_tpu.audio.chunking import chunk_iter, find_longest_common_sequence

__all__ = [
    "SAMPLE_RATE",
    "N_FFT",
    "N_MELS",
    "HOP_LENGTH",
    "CHUNK_LENGTH",
    "N_SAMPLES",
    "N_FRAMES",
    "pad_or_trim",
    "mel_filterbank",
    "log_mel_spectrogram",
    "chunk_iter",
    "find_longest_common_sequence",
]
