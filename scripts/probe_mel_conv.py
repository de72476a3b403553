"""Mel via strided conv (implicit im2col on MXU) vs gather+matmul."""

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
    _log_mel_jax,
    _stft_basis,
    mel_filterbank,
)


def make_conv(precision):
    cos_b, sin_b = _stft_basis(N_FFT)
    basis = np.concatenate([cos_b, sin_b], axis=1)  # (400, 402)
    filt = basis.T[:, None, :]  # (402, 1, 400) OIW

    @jax.jit
    def mel_fn(audio):  # (B, N)
        pad = N_FFT // 2
        x = jnp.pad(audio, [(0, 0), (pad, pad)], mode="reflect")
        y = jax.lax.conv_general_dilated(
            x[:, None, :], jnp.asarray(filt),
            window_strides=(HOP_LENGTH,), padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (B, 402, T+1)
        nb = N_FFT // 2 + 1
        re, im = y[:, :nb], y[:, nb:]
        power = (re * re + im * im)[..., :-1]  # (B, 201, T)
        mel = jnp.einsum(
            "bft,mf->bmt", power,
            jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, 80)),
            precision=jax.lax.Precision.HIGH,
        )
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, peak - 8.0)
        return (log_spec + 4.0) / 4.0  # (B, 80, T)

    return mel_fn


def main():
    rng = np.random.default_rng(0)
    t = np.arange(480000) / SAMPLE_RATE
    audio = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * np.sin(2 * np.pi * 1330 * t)
        + 1e-4 * rng.standard_normal(480000)
    ).astype(np.float32)[None]
    a = jnp.asarray(audio)
    ref = np.asarray(_log_mel_jax(a))

    P = jax.lax.Precision
    for name, prec in [("conv-HIGHEST", P.HIGHEST), ("conv-HIGH", P.HIGH)]:
        fn = make_conv(prec)
        out = np.asarray(fn(a))
        err = np.abs(out - ref).max()
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fn(a)[0, 0, :4])
            times.append((time.perf_counter() - t0) * 1000)
        med = statistics.median(times)
        print(f"{name}: max|Δ| vs production {err:.2e}  {med:.1f} ms "
              f"(−26 ≈ {med-26:.1f} on-dev)", flush=True)

    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(_log_mel_jax(a)[0, 0, :4])
        times.append((time.perf_counter() - t0) * 1000)
    print(f"production gather+matmul: {statistics.median(times):.1f} ms")


if __name__ == "__main__":
    main()
