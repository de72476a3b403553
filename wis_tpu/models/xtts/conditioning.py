"""XTTS conditioning encoder: reference audio → GPT speaker latents.

Coqui XTTS v2 derives `gpt_cond_latent` by passing the reference mel
through a conditioning encoder (conv projection + self-attention stack)
and a perceiver resampler that distills the sequence into a fixed number
of latent vectors (reference xtts/main.py:62-74 calls
`get_conditioning_latents`). Same architecture here in JAX:

    mel (80, T) → 1×1 conv to d_model → N self-attention blocks
      → perceiver: learned latent queries cross-attend the sequence
      → (n_latents, d_model) gpt_cond_latent

The speaker embedding for the vocoder path comes from the configured
speaker encoder (WavLM x-vector by default, mel statistics offline).
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
    n_heads: int = 16
    n_blocks: int = 6
    n_latents: int = 32
    perceiver_heads: int = 8
    perceiver_depth: int = 2


def _ln(x, g, b):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + 1e-5)) * g + b).astype(x.dtype)


def _mha(q, k, v, n_heads):
    b, tq, d = q.shape
    tk = k.shape[1]
    dh = d // n_heads
    rs = lambda a, t: a.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)  # noqa: E731
    qh, kh, vh = rs(q, tq), rs(k, tk), rs(v, tk)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    w = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return ctx.transpose(0, 2, 1, 3).reshape(b, tq, d)


def conditioning_forward(
    params: Dict, mel: jnp.ndarray, cfg: ConditioningConfig
) -> jnp.ndarray:
    """mel (B, n_mels, T) → gpt_cond_latent (B, n_latents, d_model)."""
    x = mel.swapaxes(-1, -2) @ params["in_w"] + params["in_b"]  # (B, T, D)
    x = x.astype(params["in_w"].dtype)

    for blk in params["blocks"]:
        h = _ln(x, blk["ln1_g"], blk["ln1_b"])
        qkv = h @ blk["qkv_w"] + blk["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + _mha(q, k, v, cfg.n_heads) @ blk["proj_w"] + blk["proj_b"]
        h = _ln(x, blk["ln2_g"], blk["ln2_b"])
        x = x + jax.nn.gelu(h @ blk["ff1_w"] + blk["ff1_b"]) @ blk["ff2_w"] + blk["ff2_b"]

    # perceiver resampler: learned latent queries attend the sequence
    lat = jnp.broadcast_to(
        params["latents"][None], (x.shape[0],) + params["latents"].shape
    ).astype(x.dtype)
    for blk in params["perceiver"]:
        q = _ln(lat, blk["lnq_g"], blk["lnq_b"]) @ blk["q_w"]
        kv_in = _ln(x, blk["lnkv_g"], blk["lnkv_b"])
        k = kv_in @ blk["k_w"]
        v = kv_in @ blk["v_w"]
        lat = lat + _mha(q, k, v, cfg.perceiver_heads) @ blk["o_w"]
        h = _ln(lat, blk["lnf_g"], blk["lnf_b"])
        lat = lat + jax.nn.gelu(h @ blk["ff1_w"]) @ blk["ff2_w"]
    return _ln(lat, params["out_ln_g"], params["out_ln_b"])


def random_conditioning(cfg: ConditioningConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)
    D, F = cfg.d_model, 4 * cfg.d_model

    def dense(*shape, scale=None):
        scale = scale or 1.0 / np.sqrt(shape[0])
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale, dtype)

    def ones(n):
        return jnp.ones(n, jnp.float32)

    def zeros(n):
        return jnp.zeros(n, jnp.float32)

    blocks = []
    for _ in range(cfg.n_blocks):
        blocks.append(
            {
                "ln1_g": ones(D), "ln1_b": zeros(D),
                "qkv_w": dense(D, 3 * D), "qkv_b": jnp.zeros(3 * D, dtype),
                "proj_w": dense(D, D), "proj_b": jnp.zeros(D, dtype),
                "ln2_g": ones(D), "ln2_b": zeros(D),
                "ff1_w": dense(D, F), "ff1_b": jnp.zeros(F, dtype),
                "ff2_w": dense(F, D), "ff2_b": jnp.zeros(D, dtype),
            }
        )
    perceiver = []
    for _ in range(cfg.perceiver_depth):
        perceiver.append(
            {
                "lnq_g": ones(D), "lnq_b": zeros(D),
                "lnkv_g": ones(D), "lnkv_b": zeros(D),
                "q_w": dense(D, D), "k_w": dense(D, D), "v_w": dense(D, D),
                "o_w": dense(D, D),
                "lnf_g": ones(D), "lnf_b": zeros(D),
                "ff1_w": dense(D, F), "ff2_w": dense(F, D),
            }
        )
    return {
        "in_w": dense(cfg.n_mels, D),
        "in_b": jnp.zeros(D, dtype),
        "blocks": blocks,
        "latents": dense(cfg.n_latents, D, scale=0.02),
        "perceiver": perceiver,
        "out_ln_g": ones(D),
        "out_ln_b": zeros(D),
    }


def build_clone_program(cfg: ConditioningConfig):
    """Jitted (params, mel (1, n_mels, T)) → (n_latents, d_model)."""

    @partial(jax.jit, static_argnames=())
    def clone(params, mel):
        return conditioning_forward(params, mel, cfg)[0]

    return clone
