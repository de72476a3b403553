"""Whisper parameter construction: HF conversion or seeded random init.

The reference obtains weights as CTranslate2 conversions git-cloned from
HF (`tovera/wis-whisper-*`, reference utils.sh:99-108) and memory-maps
them at load (main.py:341-443). Here:

- if ``<model_dir>/<size>`` contains an HF checkpoint
  (``model.safetensors`` + config), it is converted to the stacked-layer
  pytree (leading layer axis, see model.py docstring) at load;
- otherwise parameters are **seeded random** with the exact architecture
  shapes — the framework stays fully exercisable (and benchmarkable:
  latency is weight-independent) in offline environments.

All parameters are stored in bf16 except layer norms (f32).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from wis_tpu.models.whisper.config import WhisperConfig

logger = logging.getLogger("wis_tpu")


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """Standard transformer sinusoidal embedding (whisper encoder)."""
    assert channels % 2 == 0
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


# --------------------------------------------------------------------------- #
# Random init — generated ON DEVICE via jax.random (a host-side numpy init
# of large-v2 would build ~6 GB on CPU and ship ~3 GB over PCIe; device
# generation makes offline/random-weight startup take seconds)
# --------------------------------------------------------------------------- #
class _Init:
    def __init__(self, seed: int, dtype):
        import jax

        self.key = jax.random.PRNGKey(seed)
        self.counter = 0
        self.dtype = dtype

    def dense(self, *shape) -> jnp.ndarray:
        import jax

        self.counter += 1
        sub = jax.random.fold_in(self.key, self.counter)
        scale = 1.0 / np.sqrt(shape[-2] if len(shape) >= 2 else shape[-1])
        return (jax.random.normal(sub, shape, self.dtype) * scale).astype(self.dtype)

    def zeros(self, *shape, dtype=None) -> jnp.ndarray:
        return jnp.zeros(shape, dtype=dtype or self.dtype)

    def ones(self, *shape) -> jnp.ndarray:
        return jnp.ones(shape, jnp.float32)


def _init_blocks(init: _Init, n_layers: int, d: int, cross: bool) -> Dict:
    L, F = n_layers, 4 * d
    blocks = {
        "attn_ln": {"g": init.ones(L, d), "b": init.zeros(L, d, dtype=jnp.float32)},
        "attn": {
            "q_w": init.dense(L, d, d),
            "q_b": init.zeros(L, d),
            "k_w": init.dense(L, d, d),
            "v_w": init.dense(L, d, d),
            "v_b": init.zeros(L, d),
            "o_w": init.dense(L, d, d),
            "o_b": init.zeros(L, d),
        },
        "mlp_ln": {"g": init.ones(L, d), "b": init.zeros(L, d, dtype=jnp.float32)},
        "mlp": {
            "w1": init.dense(L, d, F),
            "b1": init.zeros(L, F),
            "w2": init.dense(L, F, d),
            "b2": init.zeros(L, d),
        },
    }
    if cross:
        blocks["cross_ln"] = {
            "g": init.ones(L, d),
            "b": init.zeros(L, d, dtype=jnp.float32),
        }
        blocks["cross"] = {
            "q_w": init.dense(L, d, d),
            "q_b": init.zeros(L, d),
            "k_w": init.dense(L, d, d),
            "v_w": init.dense(L, d, d),
            "v_b": init.zeros(L, d),
            "o_w": init.dense(L, d, d),
            "o_b": init.zeros(L, d),
        }
    return blocks


def random_params(cfg: WhisperConfig, seed: int = 0, dtype=jnp.bfloat16) -> Dict:
    init = _Init(seed, dtype)
    d = cfg.n_audio_state
    params = {
        "encoder": {
            "conv1": {"w": init.dense(3, cfg.n_mels, d), "b": init.zeros(d)},
            "conv2": {"w": init.dense(3, d, d), "b": init.zeros(d)},
            "pos": jnp.asarray(sinusoid_positions(cfg.n_audio_ctx, d)),
            "blocks": _init_blocks(init, cfg.n_audio_layer, d, cross=False),
            "ln_post": {"g": init.ones(d), "b": init.zeros(d, dtype=jnp.float32)},
        },
        "decoder": {
            "tok_emb": init.dense(cfg.n_vocab, cfg.n_text_state),
            "pos": init.dense(cfg.n_text_ctx, cfg.n_text_state),
            "blocks": _init_blocks(init, cfg.n_text_layer, cfg.n_text_state, cross=True),
            "ln": {
                "g": init.ones(cfg.n_text_state),
                "b": init.zeros(cfg.n_text_state, dtype=jnp.float32),
            },
        },
    }
    return params


# --------------------------------------------------------------------------- #
# HF safetensors conversion
# --------------------------------------------------------------------------- #
def _hf_tensors(model_dir: str) -> Optional[Dict[str, np.ndarray]]:
    """Load all tensors from HF safetensors shard(s) in model_dir."""
    try:
        from safetensors import safe_open
    except ImportError:
        return None
    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not files:
        return None
    tensors: Dict[str, np.ndarray] = {}
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def _stack(tensors, fmt, n_layers, transpose=False, dtype=jnp.bfloat16):
    arrs = []
    for i in range(n_layers):
        a = tensors[fmt.format(i)]
        if transpose:
            a = a.T
        arrs.append(a)
    return jnp.asarray(np.stack(arrs), dtype=dtype)


def params_from_hf(
    tensors: Dict[str, np.ndarray], cfg: WhisperConfig, dtype=jnp.bfloat16
) -> Dict:
    """Convert HF `WhisperForConditionalGeneration` tensors (torch Linear
    layout: weight (out, in)) into the stacked-layer pytree."""
    t = {k.removeprefix("model."): v for k, v in tensors.items()}
    f32 = jnp.float32

    def blocks(prefix, n_layers, cross):
        def s(sub, transpose=False, dt=dtype):
            return _stack(t, prefix + ".layers.{}." + sub, n_layers, transpose, dt)

        out = {
            "attn_ln": {
                "g": s("self_attn_layer_norm.weight", dt=f32),
                "b": s("self_attn_layer_norm.bias", dt=f32),
            },
            "attn": {
                "q_w": s("self_attn.q_proj.weight", transpose=True),
                "q_b": s("self_attn.q_proj.bias"),
                "k_w": s("self_attn.k_proj.weight", transpose=True),
                "v_w": s("self_attn.v_proj.weight", transpose=True),
                "v_b": s("self_attn.v_proj.bias"),
                "o_w": s("self_attn.out_proj.weight", transpose=True),
                "o_b": s("self_attn.out_proj.bias"),
            },
            "mlp_ln": {
                "g": s("final_layer_norm.weight", dt=f32),
                "b": s("final_layer_norm.bias", dt=f32),
            },
            "mlp": {
                "w1": s("fc1.weight", transpose=True),
                "b1": s("fc1.bias"),
                "w2": s("fc2.weight", transpose=True),
                "b2": s("fc2.bias"),
            },
        }
        if cross:
            out["cross_ln"] = {
                "g": s("encoder_attn_layer_norm.weight", dt=f32),
                "b": s("encoder_attn_layer_norm.bias", dt=f32),
            }
            out["cross"] = {
                "q_w": s("encoder_attn.q_proj.weight", transpose=True),
                "q_b": s("encoder_attn.q_proj.bias"),
                "k_w": s("encoder_attn.k_proj.weight", transpose=True),
                "v_w": s("encoder_attn.v_proj.weight", transpose=True),
                "v_b": s("encoder_attn.v_proj.bias"),
                "o_w": s("encoder_attn.out_proj.weight", transpose=True),
                "o_b": s("encoder_attn.out_proj.bias"),
            }
        return out

    return {
        "encoder": {
            # torch conv1d weight (out, in, k) → (k, in, out)
            "conv1": {
                "w": jnp.asarray(
                    t["encoder.conv1.weight"].transpose(2, 1, 0), dtype
                ),
                "b": jnp.asarray(t["encoder.conv1.bias"], dtype),
            },
            "conv2": {
                "w": jnp.asarray(
                    t["encoder.conv2.weight"].transpose(2, 1, 0), dtype
                ),
                "b": jnp.asarray(t["encoder.conv2.bias"], dtype),
            },
            "pos": jnp.asarray(t["encoder.embed_positions.weight"], jnp.float32),
            "blocks": blocks("encoder", cfg.n_audio_layer, cross=False),
            "ln_post": {
                "g": jnp.asarray(t["encoder.layer_norm.weight"], f32),
                "b": jnp.asarray(t["encoder.layer_norm.bias"], f32),
            },
        },
        "decoder": {
            "tok_emb": jnp.asarray(t["decoder.embed_tokens.weight"], dtype),
            "pos": jnp.asarray(t["decoder.embed_positions.weight"], dtype),
            "blocks": blocks("decoder", cfg.n_text_layer, cross=True),
            "ln": {
                "g": jnp.asarray(t["decoder.layer_norm.weight"], f32),
                "b": jnp.asarray(t["decoder.layer_norm.bias"], f32),
            },
        },
    }


def load_or_init_params(
    cfg: WhisperConfig,
    model_dir: Optional[str] = None,
    seed: int = 0,
    dtype=jnp.bfloat16,
) -> Dict:
    """Load converted HF weights from ``model_dir`` if present (with an
    Orbax cache of the converted pytree for fast restarts), else seeded
    random init with the exact architecture shapes."""
    if model_dir and os.path.isdir(model_dir):
        from wis_tpu.models.whisper.checkpoint import (
            converted_path,
            load_params,
            save_params,
        )

        cached = load_params(converted_path(model_dir))
        if cached is not None:
            return cached
        tensors = _hf_tensors(model_dir)
        if tensors:
            logger.info("WHISPER: loading HF weights from %s", model_dir)
            params = params_from_hf(tensors, cfg, dtype)
            save_params(params, converted_path(model_dir))
            return params
    logger.warning(
        "WHISPER: no weights found for %s (dir=%s) — using seeded random "
        "init; transcripts will be meaningless but shapes/latency are exact",
        cfg.name,
        model_dir,
    )
    return random_params(cfg, seed=seed, dtype=dtype)
