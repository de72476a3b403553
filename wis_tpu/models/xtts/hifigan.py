"""HiFi-GAN vocoder in JAX — XTTS decoder variant.

Replaces the CUDA HiFi-GAN inside Coqui XTTS (reference xtts/main.py:
149-156, decoder ∈ {ne_hifigan, hifigan} at 243-325): GPT latents
(B, T, 1024) → 24 kHz waveform, conditioned on the 512-dim speaker
embedding injected at every upsampling stage (XTTS's
`cond_in_each_up_layer`). Upsample rates (8, 8, 2, 2) — 256 samples per
latent frame — with multi-receptive-field fusion resblocks (kernels
3/7/11, dilations 1/3/5).

The forward includes Coqui HifiDecoder's two latent-timeline pre-stages
(both half-pixel linear interpolation, torch F.interpolate
align_corners=False): GPT emits ONE latent per 1024-sample code stride
at 22 050 Hz, the generator hops 256 — so latents stretch ×(1024/256)
and then ×(24000/22050) onto the output-rate timeline before conv_pre.
One audio token ≈ 1024·24000/22050 ≈ 1114.6 output samples (46.4 ms).
Without these stages a real checkpoint would speak 4.35× too fast.

All convs run as `lax.conv_general_dilated` in NHC layout; the whole
vocoder is one jit program per (batch, frame-count) shape — streaming
chunks reuse a fixed frame-count program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class HiFiGANConfig:
    in_dim: int = 1024
    cond_dim: int = 512
    upsample_initial: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernels: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    sample_rate: int = 24000
    #: GPT code stride: one audio token covers this many samples at
    #: input_sample_rate (Coqui ar_mel_length_compression)
    gpt_code_stride: int = 1024
    #: the GPT latent timeline's native rate (Coqui input_sample_rate);
    #: latents are linearly resampled to sample_rate before the generator
    input_sample_rate: int = 22050

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out

    def vocoded_length(self, n_tokens: int) -> int:
        """Output samples produced for n_tokens latent frames (after the
        two interpolation stages; mirrors torch floor semantics)."""
        t4 = n_tokens * self.gpt_code_stride // self.total_upsample
        t_out = t4 * self.sample_rate // self.input_sample_rate
        return t_out * self.total_upsample

    @property
    def samples_per_token(self) -> float:
        """Ideal output samples per audio token: code-stride seconds of
        speech at the output rate (1024·24000/22050 ≈ 1114.56)."""
        return self.gpt_code_stride * self.sample_rate / self.input_sample_rate


def _conv1d(x, w, b, stride=1, dilation=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


def _conv_transpose1d(x, w, b, stride):
    """w (K, C_out, C_in) torch-style transposed conv. SAME padding gives
    output length = input length * stride — matching torch's
    ConvTranspose1d(padding=(k-stride)//2) for the even k-stride HiFi-GAN
    configs."""
    y = jax.lax.conv_transpose(
        x,
        w,
        strides=(stride,),
        padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
        transpose_kernel=True,
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


def _resblock(x, blk, kernel: int, dilations):
    for i, d in enumerate(dilations):
        h = jax.nn.leaky_relu(x, 0.1)
        h = _conv1d(h, blk["w1"][i], blk["b1"][i], dilation=d)
        h = jax.nn.leaky_relu(h, 0.1)
        h = _conv1d(h, blk["w2"][i], blk["b2"][i], dilation=1)
        x = x + h
    return x


def _linear_interp(x: jnp.ndarray, out_len: int, scale: float) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on the
    time axis of (B, T, C). torch maps output i to source (i+0.5)/scale
    - 0.5 using the USER scale_factor (not out/in — they differ for
    fractional scales, which is why jax.image.resize can't be used),
    edge-clamped, then lerps the two neighbours."""
    t = x.shape[1]
    src = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) / scale - 0.5
    src = jnp.clip(src, 0.0, t - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (src - lo.astype(jnp.float32))[None, :, None]
    xf = x.astype(jnp.float32)
    return jnp.take(xf, lo, axis=1) * (1.0 - w) + jnp.take(xf, hi, axis=1) * w


def latent_timeline(latents: jnp.ndarray, cfg: HiFiGANConfig) -> jnp.ndarray:
    """Coqui HifiDecoder.forward's pre-stages: stretch the GPT latent
    sequence onto the generator's output-rate hop grid. Two half-pixel
    linear interpolations: ×(code_stride/hop) then
    ×(sample_rate/input_sample_rate), lengths floored like torch."""
    t = latents.shape[1]
    assert cfg.gpt_code_stride % cfg.total_upsample == 0, (
        "gpt_code_stride must be a multiple of the generator upsample "
        f"({cfg.gpt_code_stride} vs {cfg.total_upsample})"
    )
    z = latents
    t4 = t * cfg.gpt_code_stride // cfg.total_upsample
    if t4 != t:
        z = _linear_interp(z, t4, cfg.gpt_code_stride / cfg.total_upsample)
    if cfg.sample_rate != cfg.input_sample_rate:
        t_out = t4 * cfg.sample_rate // cfg.input_sample_rate
        z = _linear_interp(z, t_out, cfg.sample_rate / cfg.input_sample_rate)
    return z.astype(latents.dtype)


def hifigan_forward(
    params: Dict, latents: jnp.ndarray, speaker: jnp.ndarray, cfg: HiFiGANConfig
) -> jnp.ndarray:
    """latents (B, T, in_dim), speaker (B, cond_dim) →
    wav (B, cfg.vocoded_length(T))."""
    latents = latent_timeline(latents, cfg)
    x = _conv1d(latents, params["pre_w"], params["pre_b"])
    x = x + (speaker @ params["cond_w"] + params["cond_b"])[:, None, :].astype(x.dtype)
    for i, (rate, _k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        up = params["ups"][i]
        x = jax.nn.leaky_relu(x, 0.1)
        x = _conv_transpose1d(x, up["w"], up["b"], rate)
        # speaker conditioning at each upsample stage (cond_in_each_up_layer)
        x = x + (speaker @ up["cond_w"] + up["cond_b"])[:, None, :].astype(x.dtype)
        acc = None
        for j in range(len(cfg.resblock_kernels)):
            r = _resblock(
                x,
                params["resblocks"][i][j],
                cfg.resblock_kernels[j],
                cfg.resblock_dilations[j],
            )
            acc = r if acc is None else acc + r
        x = acc / len(cfg.resblock_kernels)
    # the original HiFi-GAN (and Coqui's copy) calls F.leaky_relu(o) with
    # the DEFAULT slope before conv_post — 0.01, not the 0.1 used
    # everywhere else (upstream quirk, kept for checkpoint parity)
    x = jax.nn.leaky_relu(x, 0.01)
    x = _conv1d(x, params["post_w"], params["post_b"])
    return jnp.tanh(x[..., 0])


def random_hifigan(cfg: HiFiGANConfig, seed: int = 0, dtype=jnp.bfloat16) -> Dict:
    rng = np.random.default_rng(seed)

    def dense(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale, dtype)

    ch = cfg.upsample_initial
    params = {
        "pre_w": dense(7, cfg.in_dim, ch),
        "pre_b": jnp.zeros(ch, dtype),
        "cond_w": dense(cfg.cond_dim, ch),
        "cond_b": jnp.zeros(ch, dtype),
        "ups": [],
        "resblocks": [],
    }
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        out_ch = ch // 2
        params["ups"].append(
            {
                "w": dense(k, out_ch, ch),  # (K, C_out, C_in) transposed
                "b": jnp.zeros(out_ch, dtype),
                "cond_w": dense(cfg.cond_dim, out_ch),
                "cond_b": jnp.zeros(out_ch, dtype),
            }
        )
        stage = []
        for kernel, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            stage.append(
                {
                    "w1": [dense(kernel, out_ch, out_ch) for _ in dils],
                    "b1": [jnp.zeros(out_ch, dtype) for _ in dils],
                    "w2": [dense(kernel, out_ch, out_ch) for _ in dils],
                    "b2": [jnp.zeros(out_ch, dtype) for _ in dils],
                }
            )
        params["resblocks"].append(stage)
        ch = out_ch
    params["post_w"] = dense(7, ch, 1)
    params["post_b"] = jnp.zeros(1, dtype)
    return params
