"""Whisper log-mel frontend, TPU-first.

Re-implements the math of the reference DSP frontend (reference
wis/audio.py:17-103) as a JAX program whose hot path is three MXU matmuls
instead of a torch STFT:

    frames[T,400] @ DFT_cos[400,201]  →  real part
    frames[T,400] @ DFT_sin[400,201]  →  imag part
    (real² + imag²)[T,201] @ mel.T[201,80]  →  mel power

The framing/windowing matches ``torch.stft(center=True)`` exactly
(reflect-pad n_fft//2 on both sides, periodic Hann window, last frame
dropped per reference wis/audio.py:97), and the filterbank is computed from
the librosa slaney-mel formula rather than loaded from the reference's
``mel_filters.npz`` — tests assert elementwise equality with that artifact.

Numerics: the STFT is computed in float32 (mel power spans ~9 orders of
magnitude — bf16 would destroy the log floor); the (80, T) output is cast
to the model dtype by the caller.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# Hard-coded Whisper audio hyperparameters (reference wis/audio.py:17-25).
SAMPLE_RATE = 16000
N_FFT = 400
N_MELS = 80
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000 samples / 30 s window
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames


def pad_or_trim(array: np.ndarray, length: int = N_SAMPLES, *, axis: int = -1):
    """Zero-pad or trim audio to the model's 30 s window (reference
    wis/audio.py:28-51). Host-side numpy; shapes entering jit are static."""
    n = array.shape[axis]
    if n > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        return array[tuple(sl)]
    if n < length:
        widths = [(0, 0)] * array.ndim
        widths[axis] = (0, length - n)
        return np.pad(array, widths)
    return array


# --------------------------------------------------------------------------- #
# Mel filterbank — librosa slaney formula (public standard DSP math).
# Replaces the reference's bundled npz artifact (wis/audio.py:55-69).
# --------------------------------------------------------------------------- #
def _hz_to_mel(freqs: np.ndarray) -> np.ndarray:
    freqs = np.asarray(freqs, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freqs / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freqs >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freqs, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@lru_cache(maxsize=None)
def mel_filterbank(
    sr: int = SAMPLE_RATE, n_fft: int = N_FFT, n_mels: int = N_MELS
) -> np.ndarray:
    """(n_mels, n_fft//2+1) slaney-normalized triangular filterbank,
    bit-equal (float32) to librosa.filters.mel(sr=16000, n_fft=400,
    n_mels=80) — the matrix the reference ships as mel_filters.npz."""
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@lru_cache(maxsize=None)
def _stft_basis(n_fft: int = N_FFT) -> tuple:
    """Windowed real-DFT basis matrices: (cos, -sin) of shape
    (n_fft, n_fft//2+1), with the periodic Hann window folded in so the
    whole windowed STFT is a single matmul per component."""
    n = np.arange(n_fft)
    k = np.arange(n_fft // 2 + 1)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)  # periodic Hann
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def _frame_indices(n_samples: int, n_fft: int, hop: int) -> jnp.ndarray:
    """Frame gather indices for a center-padded signal of n_samples.
    Built from iota inside the trace (a materialized (3001, 400) index
    constant would bloat the HLO by ~5 MB and slow compiles)."""
    padded = n_samples + n_fft  # reflect pad n_fft//2 each side
    n_frames_full = 1 + (padded - n_fft) // hop
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_frames_full, n_fft), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_frames_full, n_fft), 1)
    return rows * hop + cols


@partial(jax.jit, static_argnames=("n_mels",))
def _log_mel_jax(audio: jnp.ndarray, n_mels: int = N_MELS) -> jnp.ndarray:
    """audio (..., n_samples) float32 → log-mel (..., n_mels, n_frames).

    The windowed real-DFT runs as ONE strided convolution (402 output
    channels = 201 cos + 201 sin bases): XLA lowers it to an implicit
    im2col matmul on the MXU, ~free next to the explicit (T+1, 400)
    frame gather + matmuls it replaced (4.6 ms → <1 ms per request on
    v5e — BENCH.md). Precision stays HIGHEST: default bf16 accumulation
    destroys the log-mel floor (max|Δ| 0.4 vs 2e-5 on the scaled
    output); spectrogram FLOPs are negligible either way."""
    lead = audio.shape[:-1]
    n_samples = audio.shape[-1]
    x = audio.reshape((-1, n_samples))
    pad = N_FFT // 2
    x = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    cos_b, sin_b = _stft_basis(N_FFT)
    filt = np.concatenate([cos_b, sin_b], axis=1).T[:, None, :]  # (402,1,400)
    y = jax.lax.conv_general_dilated(
        x[:, None, :], jnp.asarray(filt),
        window_strides=(HOP_LENGTH,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (B, 402, T+1)
    nb = N_FFT // 2 + 1
    re, im = y[:, :nb], y[:, nb:]
    # drop the last frame, as the reference does (wis/audio.py:97)
    power = (re * re + im * im)[..., :-1]  # (B, n_fft//2+1, T)
    mel = jnp.einsum(
        "bft,mf->bmt", power,
        jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, n_mels)),
        precision=jax.lax.Precision.HIGHEST,
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # dynamic-range floor: max - 8, then scale to roughly [-1, 1]
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.reshape(lead + log_spec.shape[1:])  # (..., n_mels, T)


def log_mel_spectrogram(audio, n_mels: int = N_MELS) -> np.ndarray:
    """Compute the Whisper log-mel spectrogram (reference
    wis/audio.py:72-103). Accepts a 1-D or batched float array; returns
    numpy (..., 80, n_frames) float32."""
    x = jnp.asarray(np.asarray(audio, dtype=np.float32))
    return np.asarray(_log_mel_jax(x, n_mels=n_mels))
