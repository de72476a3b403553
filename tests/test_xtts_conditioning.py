"""XTTS conditioning encoder: architecture parity + converter coverage.

The JAX forward (wis_tpu/models/xtts/conditioning.py) claims to mirror
Coqui XTTS v2's ConditioningEncoder (tortoise AttentionBlocks) +
PerceiverResampler so real `model.pth` weights drop in via
convert.conditioning_from_coqui. No checkpoint exists in this
environment, so the claim is pinned two ways:

1. a from-scratch torch implementation of the public architecture
   (GroupNorm32 + QKVAttentionLegacy head-interleaved qkv; RMSNorm
   perceiver with queries prepended to the kv context) runs the same
   synthetic state dict and must match the JAX forward numerically;
2. the converter must consume EVERY `gpt.conditioning_*` key of that
   state dict (params["_unmapped"] empty) — with a real checkpoint any
   naming drift surfaces as a logged unmapped list, not silence.
"""

import math

import numpy as np
import pytest
import torch

from wis_tpu.models.xtts.conditioning import (
    ConditioningConfig,
    conditioning_forward,
)
from wis_tpu.models.xtts.convert import conditioning_from_coqui

CFG = ConditioningConfig(
    n_mels=20,
    d_model=64,
    n_heads=2,
    n_blocks=2,
    n_latents=4,
    n_groups=8,
    perceiver_heads=2,
    perceiver_dim_head=16,
    perceiver_depth=2,
    ff_mult=2,
)


def _synthetic_sd(cfg: ConditioningConfig, seed=0):
    rng = np.random.default_rng(seed)
    D, M = cfg.d_model, cfg.n_mels
    inner = cfg.perceiver_heads * cfg.perceiver_dim_head
    F = cfg.ff_mult * D
    sd = {
        "gpt.conditioning_encoder.init.weight": rng.standard_normal((D, M, 1)) * 0.2,
        "gpt.conditioning_encoder.init.bias": rng.standard_normal(D) * 0.02,
    }
    for i in range(cfg.n_blocks):
        p = f"gpt.conditioning_encoder.attn.{i}."
        sd[p + "norm.weight"] = 1 + rng.standard_normal(D) * 0.05
        sd[p + "norm.bias"] = rng.standard_normal(D) * 0.02
        sd[p + "qkv.weight"] = rng.standard_normal((3 * D, D, 1)) * 0.1
        sd[p + "qkv.bias"] = rng.standard_normal(3 * D) * 0.02
        sd[p + "proj_out.weight"] = rng.standard_normal((D, D, 1)) * 0.1
        sd[p + "proj_out.bias"] = rng.standard_normal(D) * 0.02
    q = "gpt.conditioning_perceiver."
    sd[q + "latents"] = rng.standard_normal((cfg.n_latents, D)) * 0.2
    for i in range(cfg.perceiver_depth):
        a = q + f"layers.{i}.0."
        f = q + f"layers.{i}.1."
        sd[a + "norm.gamma"] = 1 + rng.standard_normal(D) * 0.05
        sd[a + "to_q.weight"] = rng.standard_normal((inner, D)) * 0.1
        sd[a + "to_kv.weight"] = rng.standard_normal((2 * inner, D)) * 0.1
        sd[a + "to_out.weight"] = rng.standard_normal((D, inner)) * 0.1
        sd[f + "0.gamma"] = 1 + rng.standard_normal(D) * 0.05
        sd[f + "1.weight"] = rng.standard_normal((F, D)) * 0.1
        sd[f + "1.bias"] = rng.standard_normal(F) * 0.02
        sd[f + "3.weight"] = rng.standard_normal((D, F)) * 0.1
        sd[f + "3.bias"] = rng.standard_normal(D) * 0.02
    sd[q + "norm.gamma"] = 1 + rng.standard_normal(D) * 0.05
    return {k: v.astype(np.float32) for k, v in sd.items()}


# ----------------------------------------------------------------------- #
# From-scratch torch mirror of the public XTTS v2 architecture
# ----------------------------------------------------------------------- #
def _qkv_attention_legacy(qkv: torch.Tensor, n_heads: int) -> torch.Tensor:
    bs, width, length = qkv.shape
    ch = width // (3 * n_heads)
    q, k, v = qkv.reshape(bs * n_heads, ch * 3, length).split(ch, dim=1)
    scale = 1 / math.sqrt(math.sqrt(ch))
    weight = torch.einsum("bct,bcs->bts", q * scale, k * scale)
    weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
    a = torch.einsum("bts,bcs->bct", weight, v)
    return a.reshape(bs, -1, length)


def _rms(x: torch.Tensor, gamma: torch.Tensor) -> torch.Tensor:
    return torch.nn.functional.normalize(x, dim=-1) * (x.shape[-1] ** 0.5) * gamma


def _torch_forward(sd, mel: np.ndarray, cfg: ConditioningConfig) -> np.ndarray:
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.nn.functional.conv1d(
        torch.from_numpy(mel),
        t["gpt.conditioning_encoder.init.weight"],
        t["gpt.conditioning_encoder.init.bias"],
    )
    for i in range(cfg.n_blocks):
        p = f"gpt.conditioning_encoder.attn.{i}."
        h = torch.nn.functional.group_norm(
            x, cfg.n_groups, t[p + "norm.weight"], t[p + "norm.bias"]
        )
        qkv = torch.nn.functional.conv1d(
            h, t[p + "qkv.weight"], t[p + "qkv.bias"]
        )
        a = _qkv_attention_legacy(qkv, cfg.n_heads)
        x = x + torch.nn.functional.conv1d(
            a, t[p + "proj_out.weight"], t[p + "proj_out.bias"]
        )

    q = "gpt.conditioning_perceiver."
    ctx = x.transpose(1, 2)  # (B, T, D)
    lat = t[q + "latents"][None].expand(ctx.shape[0], -1, -1)
    ph, pdh = cfg.perceiver_heads, cfg.perceiver_dim_head
    for i in range(cfg.perceiver_depth):
        a = q + f"layers.{i}.0."
        f = q + f"layers.{i}.1."
        h = _rms(lat, t[a + "norm.gamma"])
        kv_in = torch.cat([h, ctx], dim=1)
        qh = (h @ t[a + "to_q.weight"].T).reshape(
            h.shape[0], -1, ph, pdh
        ).transpose(1, 2)
        kv = kv_in @ t[a + "to_kv.weight"].T
        k, v = kv.chunk(2, dim=-1)
        kh = k.reshape(k.shape[0], -1, ph, pdh).transpose(1, 2)
        vh = v.reshape(v.shape[0], -1, ph, pdh).transpose(1, 2)
        w = torch.softmax(
            (qh @ kh.transpose(-1, -2)).float() * pdh**-0.5, dim=-1
        ).type(vh.dtype)
        o = (w @ vh).transpose(1, 2).reshape(lat.shape[0], lat.shape[1], ph * pdh)
        lat = lat + o @ t[a + "to_out.weight"].T
        h = _rms(lat, t[f + "0.gamma"])
        h = torch.nn.functional.gelu(h @ t[f + "1.weight"].T + t[f + "1.bias"])
        lat = lat + h @ t[f + "3.weight"].T + t[f + "3.bias"]
    return _rms(lat, t[q + "norm.gamma"]).numpy()


def test_conditioning_matches_torch_mirror():
    sd = _synthetic_sd(CFG)
    rng = np.random.default_rng(1)
    mel = (rng.standard_normal((2, CFG.n_mels, 50)) * 0.5).astype(np.float32)
    params = conditioning_from_coqui(sd, CFG, dtype=np.float32)
    assert params.pop("_unmapped") == []
    with torch.no_grad():
        want = _torch_forward(sd, mel, CFG)
    import jax.numpy as jnp

    got = np.asarray(conditioning_forward(params, jnp.asarray(mel), CFG))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_converter_consumes_all_conditioning_keys():
    sd = _synthetic_sd(CFG, seed=3)
    sd["gpt.conditioning_perceiver.extra.weight"] = np.zeros(3, np.float32)
    params = conditioning_from_coqui(sd, CFG, dtype=np.float32)
    assert params["_unmapped"] == ["gpt.conditioning_perceiver.extra.weight"]


def test_rmsnorm_alias_g():
    """Checkpoints that name the RMSNorm parameter `g` instead of
    `gamma` still convert."""
    sd = _synthetic_sd(CFG, seed=4)
    renamed = {}
    for k, v in sd.items():
        renamed[k.replace("norm.gamma", "norm.g").replace(".0.gamma", ".0.g")] = v
    params = conditioning_from_coqui(renamed, CFG, dtype=np.float32)
    assert params["_unmapped"] == []


def test_clone_speaker_shapes():
    """End-to-end clone path: latents + WavLM x-vector embedding."""
    from wis_tpu.models.xtts.model import XTTSConfig, XTTSModel
    from wis_tpu.models.xtts.gpt import GPTConfig
    from wis_tpu.models.xtts.hifigan import HiFiGANConfig

    cfg = XTTSConfig(
        gpt=GPTConfig(n_layer=2, n_head=2, d_model=64),
        vocoder=HiFiGANConfig(
            in_dim=64, cond_dim=32, upsample_initial=32,
            upsample_rates=(4, 4), upsample_kernels=(8, 8),
        ),
        cond_len=4,
    )
    model = XTTSModel(cfg=cfg)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    voice = model.clone_speaker(audio)
    lat = np.asarray(voice["gpt_cond_latent"], np.float32)
    emb = np.asarray(voice["speaker_embedding"], np.float32)
    assert lat.shape == (4, 64)
    assert emb.shape == (32,)
    assert np.isfinite(lat).all() and np.isfinite(emb).all()
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-2
