"""XTTS conditioning encoder: reference audio → GPT speaker latents.

Coqui XTTS v2 derives `gpt_cond_latent` (reference xtts/main.py:62-74
calls `get_conditioning_latents`) with two modules whose checkpoint keys
live under `gpt.conditioning_encoder.*` / `gpt.conditioning_perceiver.*`:

1. **ConditioningEncoder** (tortoise lineage): 1×1 conv mel→d_model,
   then N AttentionBlocks of ``x + proj(attn(qkv(groupnorm32(x))))``.
   GroupNorm(32) normalizes over (channels/32, time) per group — NOT a
   layer norm — and the qkv conv's channel layout is heads-major with
   (q, k, v) interleaved *within* each head (QKVAttentionLegacy's
   ``view(B*H, 3*ch, T).split(ch)``), which this forward reproduces so
   real checkpoint weights drop in unchanged.
2. **PerceiverResampler** (depth 2, 8 heads × 64, 32 latents): learned
   latent queries cross-attend [latents ‖ sequence] with RMSNorm
   pre-norms, bias-free q/kv/out projections, RMSNorm-led feedforwards
   and a final RMSNorm.

The JAX forward mirrors that architecture exactly (numerics pinned
against a from-scratch torch mirror in tests/test_xtts_conditioning.py);
`wis_tpu.models.xtts.convert.conditioning_from_coqui` maps the
checkpoint keys. The vocoder-path speaker embedding comes from the
in-repo WavLM x-vector (model.py clone_speaker) — the TPU-native
replacement for Coqui's bundled ResNet speaker encoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ConditioningConfig:
    n_mels: int = 80
    d_model: int = 1024
    n_heads: int = 16  # ConditioningEncoder attention heads (= GPT heads)
    n_blocks: int = 6
    n_latents: int = 32
    n_groups: int = 32  # GroupNorm groups
    perceiver_heads: int = 8
    perceiver_dim_head: int = 64
    perceiver_depth: int = 2
    ff_mult: int = 4


def _group_norm(x_bdt: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, groups: int):
    """GroupNorm over (channels/groups, T) per group; x (B, D, T)."""
    bsz, d, t = x_bdt.shape
    xg = x_bdt.astype(jnp.float32).reshape(bsz, groups, d // groups, t)
    mu = xg.mean(axis=(2, 3), keepdims=True)
    var = xg.var(axis=(2, 3), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + 1e-5)
    out = xg.reshape(bsz, d, t) * g[None, :, None] + b[None, :, None]
    return out.astype(x_bdt.dtype)


def _rms_norm(x: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """lucidrains RMSNorm: normalize(x) * sqrt(dim) * gamma."""
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + 1e-12)
    return (x32 * inv * (x.shape[-1] ** 0.5) * gamma).astype(x.dtype)


def conditioning_forward(
    params: Dict, mel: jnp.ndarray, cfg: ConditioningConfig
) -> jnp.ndarray:
    """mel (B, n_mels, T) → gpt_cond_latent (B, n_latents, d_model)."""
    H = cfg.n_heads
    dh = cfg.d_model // H
    # init: 1x1 conv (stored (M, D)) — keep (B, D, T) for the GroupNorms
    x = jnp.einsum("bmt,md->bdt", mel.astype(params["init_w"].dtype), params["init_w"])
    x = x + params["init_b"][None, :, None]

    for blk in params["blocks"]:
        h = _group_norm(x, blk["norm_g"], blk["norm_b"], cfg.n_groups)
        qkv = (
            jnp.einsum("bdt,dc->bct", h, blk["qkv_w"])
            + blk["qkv_b"][None, :, None]
        )  # (B, 3D, T)
        bsz, _, t = qkv.shape
        # QKVAttentionLegacy layout: heads-major, (q, k, v) within head
        qkv = qkv.reshape(bsz, H, 3, dh, t)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, H, dh, T)
        scale = 1.0 / np.sqrt(np.sqrt(dh))
        scores = jnp.einsum(
            "bhdq,bhdk->bhqk", (q * scale).astype(jnp.float32),
            (k * scale).astype(jnp.float32),
        )
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        a = jnp.einsum("bhqk,bhdk->bhdq", w, v).reshape(bsz, cfg.d_model, t)
        proj = (
            jnp.einsum("bdt,dc->bct", a, blk["proj_w"])
            + blk["proj_b"][None, :, None]
        )
        x = x + proj

    # perceiver resampler over the (B, T, D) sequence
    ctx = x.swapaxes(-1, -2)  # (B, T, D)
    lat = jnp.broadcast_to(
        params["latents"][None], (ctx.shape[0],) + params["latents"].shape
    ).astype(ctx.dtype)
    ph, pdh = cfg.perceiver_heads, cfg.perceiver_dim_head

    def heads(a, n):  # (B, T, n*dh) → (B, n, T, dh)
        return a.reshape(a.shape[0], a.shape[1], n, -1).transpose(0, 2, 1, 3)

    for blk in params["perceiver"]:
        h = _rms_norm(lat, blk["attn_norm_g"])
        # cross_attn_include_queries: keys/values over [queries ‖ context]
        kv_in = jnp.concatenate([h, ctx], axis=1)
        q = heads(h @ blk["q_w"], ph)
        k = heads(kv_in @ blk["k_w"], ph)
        v = heads(kv_in @ blk["v_w"], ph)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (pdh ** -0.5)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        o = o.transpose(0, 2, 1, 3).reshape(lat.shape[0], lat.shape[1], ph * pdh)
        lat = lat + o @ blk["o_w"]
        h = _rms_norm(lat, blk["ff_norm_g"])
        h = jax.nn.gelu(h @ blk["ff1_w"] + blk["ff1_b"], approximate=False)
        lat = lat + (h @ blk["ff2_w"] + blk["ff2_b"])
    return _rms_norm(lat, params["out_norm_g"])


def random_conditioning(cfg: ConditioningConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)
    D = cfg.d_model
    inner = cfg.perceiver_heads * cfg.perceiver_dim_head
    F = cfg.ff_mult * D

    def dense(*shape, scale=None):
        scale = scale or 1.0 / np.sqrt(shape[0])
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale, dtype)

    blocks = [
        {
            "norm_g": jnp.ones(D, jnp.float32),
            "norm_b": jnp.zeros(D, jnp.float32),
            "qkv_w": dense(D, 3 * D),
            "qkv_b": jnp.zeros(3 * D, dtype),
            "proj_w": dense(D, D, scale=0.02),
            "proj_b": jnp.zeros(D, dtype),
        }
        for _ in range(cfg.n_blocks)
    ]
    perceiver = [
        {
            "attn_norm_g": jnp.ones(D, jnp.float32),
            "q_w": dense(D, inner),
            "k_w": dense(D, inner),
            "v_w": dense(D, inner),
            "o_w": dense(inner, D),
            "ff_norm_g": jnp.ones(D, jnp.float32),
            "ff1_w": dense(D, F),
            "ff1_b": jnp.zeros(F, dtype),
            "ff2_w": dense(F, D),
            "ff2_b": jnp.zeros(D, dtype),
        }
        for _ in range(cfg.perceiver_depth)
    ]
    return {
        "init_w": dense(cfg.n_mels, D),
        "init_b": jnp.zeros(D, dtype),
        "blocks": blocks,
        "latents": dense(cfg.n_latents, D, scale=0.02),
        "perceiver": perceiver,
        "out_norm_g": jnp.ones(D, jnp.float32),
    }


def build_clone_program(cfg: ConditioningConfig):
    """Jitted (params, mel (1, n_mels, T)) → (n_latents, d_model)."""

    @partial(jax.jit, static_argnames=())
    def clone(params, mel):
        return conditioning_forward(params, mel, cfg)[0]

    return clone
