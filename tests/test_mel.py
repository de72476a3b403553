"""DSP frontend parity tests.

The reference mel pipeline (reference wis/audio.py:72-103) is exactly
reproducible math: torch STFT (center=True, periodic Hann) → magnitude² →
slaney mel filterbank → log10 → max-8 floor → (x+4)/4. These tests check
our matmul-based JAX implementation against an independently-written torch
implementation and against the reference's shipped filterbank artifact.
"""

import numpy as np
import pytest

from wis_tpu.audio import (
    N_FRAMES,
    N_MELS,
    N_SAMPLES,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)


def _torch_log_mel(audio: np.ndarray, filters: np.ndarray) -> np.ndarray:
    """Independent torch reference of the Whisper mel recipe."""
    import torch

    x = torch.from_numpy(audio)
    window = torch.hann_window(400)
    stft = torch.stft(x, 400, 160, window=window, return_complex=True)
    mag = stft[..., :-1].abs() ** 2
    mel = torch.from_numpy(filters) @ mag
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy()


def test_filterbank_matches_reference_artifact(reference_dir):
    ref = np.load(reference_dir / "wis" / "assets" / "mel_filters.npz")["mel_80"]
    ours = mel_filterbank()
    assert ours.shape == ref.shape == (80, 201)
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_log_mel_matches_torch_stft():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(N_SAMPLES).astype(np.float32) * 0.1
    expected = _torch_log_mel(audio, mel_filterbank())
    got = log_mel_spectrogram(audio)
    assert got.shape == (N_MELS, N_FRAMES)
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_log_mel_short_audio():
    rng = np.random.default_rng(1)
    audio = pad_or_trim(rng.standard_normal(16000).astype(np.float32) * 0.05)
    expected = _torch_log_mel(audio, mel_filterbank())
    got = log_mel_spectrogram(audio)
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_log_mel_batched():
    rng = np.random.default_rng(2)
    batch = rng.standard_normal((3, N_SAMPLES)).astype(np.float32) * 0.1
    got = log_mel_spectrogram(batch)
    assert got.shape == (3, N_MELS, N_FRAMES)
    for i in range(3):
        np.testing.assert_allclose(
            got[i], log_mel_spectrogram(batch[i]), atol=1e-5
        )


def test_pad_or_trim():
    x = np.ones(10, dtype=np.float32)
    assert pad_or_trim(x).shape == (N_SAMPLES,)
    long = np.ones(N_SAMPLES + 5, dtype=np.float32)
    assert pad_or_trim(long).shape == (N_SAMPLES,)
    batched = np.ones((2, 7), dtype=np.float32)
    assert pad_or_trim(batched).shape == (2, N_SAMPLES)


def test_log_mel_on_real_fixture(flac_fixture_3s):
    """Mel parity on real speech (the 3.84 s fixture), not just noise."""
    from wis_tpu.audio.ingest import load_audio

    audio = load_audio(flac_fixture_3s.read_bytes())
    padded = pad_or_trim(audio)
    expected = _torch_log_mel(padded, mel_filterbank())
    got = log_mel_spectrogram(padded)
    np.testing.assert_allclose(got, expected, atol=2e-4)
    # the max-8 dB floor bounds the dynamic range to 8/4 = 2.0
    assert got.max() - got.min() <= 2.0 + 1e-5
    assert np.isfinite(got).all()
