"""Mel-spectrogram precision/speed sweep on the real TPU.

The log-mel floor (peak − 8 decades) is the precision constraint: DFT
cancellation error in low bins can lift them above the floor. Measures
max |Δ| of the SCALED output ((log+4)/4) for each matmul-precision combo
against a float64 numpy reference, plus per-call time.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from wis_tpu.audio.mel import (
    HOP_LENGTH,
    N_FFT,
    SAMPLE_RATE,
    _frame_indices,
    _stft_basis,
    mel_filterbank,
)


def np_ref(audio64):
    pad = N_FFT // 2
    x = np.pad(audio64, [(0, 0), (pad, pad)], mode="reflect")
    idx = np.asarray(_frame_indices(audio64.shape[-1], N_FFT, HOP_LENGTH))
    frames = x[:, idx]
    cos_b, sin_b = _stft_basis(N_FFT)
    re = frames @ cos_b.astype(np.float64)
    im = frames @ sin_b.astype(np.float64)
    power = (re * re + im * im)[:, :-1, :]
    mel = power @ mel_filterbank(SAMPLE_RATE, N_FFT, 80).T.astype(np.float64)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    peak = log_spec.max(axis=(-2, -1), keepdims=True)
    log_spec = np.maximum(log_spec, peak - 8.0)
    return ((log_spec + 4.0) / 4.0).swapaxes(-1, -2)


def make(p_dft, p_mel):
    @jax.jit
    def mel_fn(audio):
        pad = N_FFT // 2
        x = jnp.pad(audio, [(0, 0), (pad, pad)], mode="reflect")
        idx = _frame_indices(audio.shape[-1], N_FFT, HOP_LENGTH)
        frames = jnp.take(x, idx, axis=-1)
        cos_b, sin_b = _stft_basis(N_FFT)
        re = jnp.matmul(frames, jnp.asarray(cos_b), precision=p_dft)
        im = jnp.matmul(frames, jnp.asarray(sin_b), precision=p_dft)
        power = (re * re + im * im)[..., :-1, :]
        mel = jnp.matmul(
            power,
            jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, 80)).T,
            precision=p_mel,
        )
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - 8.0)
        return jnp.swapaxes((log_spec + 4.0) / 4.0, -1, -2)

    return mel_fn


def main():
    rng = np.random.default_rng(0)
    # speech-like: tones + noise floor, wide dynamic range
    t = np.arange(480000) / SAMPLE_RATE
    audio = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * np.sin(2 * np.pi * 1330 * t)
        + 1e-4 * rng.standard_normal(480000)
    ).astype(np.float32)[None]
    ref = np_ref(audio.astype(np.float64))

    P = jax.lax.Precision
    for name, p_dft, p_mel in [
        ("HIGHEST/HIGHEST", P.HIGHEST, P.HIGHEST),
        ("HIGH/DEFAULT", P.HIGH, P.DEFAULT),
        ("HIGH/HIGH", P.HIGH, P.HIGH),
        ("DEFAULT/DEFAULT", P.DEFAULT, P.DEFAULT),
    ]:
        fn = make(p_dft, p_mel)
        a = jnp.asarray(audio)
        out = np.asarray(fn(a))
        err = np.abs(out - ref).max()
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fn(a)[0, 0, :4])
            times.append((time.perf_counter() - t0) * 1000)
        med = statistics.median(times)
        print(f"{name}: max|Δ| {err:.2e}  {med:.1f} ms (−26 ≈ "
              f"{med-26:.1f} on-dev)", flush=True)


if __name__ == "__main__":
    main()
