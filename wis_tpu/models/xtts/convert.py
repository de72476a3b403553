"""Coqui XTTS v2 checkpoint → JAX pytree conversion.

The reference loads `model.pth` through Coqui TTS's ModelManager
(reference xtts/main.py:35-49). This module converts that torch state
dict directly into the wis_tpu XTTS pytrees:

- GPT: HF-GPT2-style blocks under `gpt.gpt.h.{i}` with Conv1D weights
  (stored (in, out) — NOT transposed like nn.Linear), token/positional
  embeddings `gpt.text_embedding`, `gpt.mel_embedding`,
  `gpt.text_pos_embedding.emb`, `gpt.mel_pos_embedding.emb`, final
  layer norm `gpt.final_norm`, and the audio-code head `gpt.mel_head`.
- HiFi-GAN: `hifigan_decoder.waveform_decoder.*` (conv_pre, ups.N,
  resblocks.{i}.convs1/convs2, conv_post, cond layers), weight-norm
  parametrized (weight_g/weight_v or parametrizations.*).

Offline environments have no checkpoint to validate against, so tests
exercise the converter with synthetically-shaped state dicts; with a real
`model.pth` the same mapping yields the production voices.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from wis_tpu.models.xtts.gpt import GPTConfig
from wis_tpu.models.xtts.hifigan import HiFiGANConfig

logger = logging.getLogger("wis_tpu")


def _wn(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Resolve a (possibly weight-normed) conv weight."""
    for g_key, v_key in (
        (prefix + ".parametrizations.weight.original0",
         prefix + ".parametrizations.weight.original1"),
        (prefix + ".weight_g", prefix + ".weight_v"),
    ):
        if g_key in sd:
            g, v = sd[g_key], sd[v_key]
            norm = np.linalg.norm(
                v.reshape(v.shape[0], -1), axis=1
            ).reshape(-1, *([1] * (v.ndim - 1)))
            return g.reshape(norm.shape) * v / np.maximum(norm, 1e-12)
    return sd[prefix + ".weight"]


def gpt_from_coqui(
    sd: Dict[str, np.ndarray], cfg: GPTConfig, dtype=jnp.bfloat16
) -> Dict:
    """Convert `gpt.*` keys. GPT2 Conv1D weights are already (in, out)."""
    L = cfg.n_layer
    p = "gpt.gpt.h.{}."

    def stack(sub, n=L):
        return jnp.asarray(
            np.stack([sd[p.format(i) + sub] for i in range(n)]), dtype
        )

    def stack_f32(sub):
        return jnp.asarray(
            np.stack([sd[p.format(i) + sub] for i in range(L)]), jnp.float32
        )

    def stack_qkv(sub, part, axis):
        """GPT2 packs q‖k‖v in c_attn; split into separate leaves so
        tensor-parallel column-sharding slices whole heads
        (parallel/mesh.py xtts_gpt_param_specs)."""
        return jnp.asarray(
            np.stack(
                [
                    np.split(sd[p.format(i) + sub], 3, axis=axis)[part]
                    for i in range(L)
                ]
            ),
            dtype,
        )

    return {
        "text_emb": jnp.asarray(sd["gpt.text_embedding.weight"], dtype),
        "text_pos": jnp.asarray(sd["gpt.text_pos_embedding.emb.weight"], dtype),
        "audio_emb": jnp.asarray(sd["gpt.mel_embedding.weight"], dtype),
        "audio_pos": jnp.asarray(sd["gpt.mel_pos_embedding.emb.weight"], dtype),
        "blocks": {
            "ln1_g": stack_f32("ln_1.weight"),
            "ln1_b": stack_f32("ln_1.bias"),
            "q_w": stack_qkv("attn.c_attn.weight", 0, axis=-1),
            "q_b": stack_qkv("attn.c_attn.bias", 0, axis=-1),
            "k_w": stack_qkv("attn.c_attn.weight", 1, axis=-1),
            "k_b": stack_qkv("attn.c_attn.bias", 1, axis=-1),
            "v_w": stack_qkv("attn.c_attn.weight", 2, axis=-1),
            "v_b": stack_qkv("attn.c_attn.bias", 2, axis=-1),
            "proj_w": stack("attn.c_proj.weight"),
            "proj_b": stack("attn.c_proj.bias"),
            "ln2_g": stack_f32("ln_2.weight"),
            "ln2_b": stack_f32("ln_2.bias"),
            "mlp_w1": stack("mlp.c_fc.weight"),
            "mlp_b1": stack("mlp.c_fc.bias"),
            "mlp_w2": stack("mlp.c_proj.weight"),
            "mlp_b2": stack("mlp.c_proj.bias"),
        },
        # GPT2Model's internal ln_f runs first (inside last_hidden_state),
        # then the model-level final_norm (coqui xtts/gpt.py)
        "gpt_lnf_g": jnp.asarray(sd["gpt.gpt.ln_f.weight"], jnp.float32),
        "gpt_lnf_b": jnp.asarray(sd["gpt.gpt.ln_f.bias"], jnp.float32),
        "lnf_g": jnp.asarray(sd["gpt.final_norm.weight"], jnp.float32),
        "lnf_b": jnp.asarray(sd["gpt.final_norm.bias"], jnp.float32),
        # mel_head is nn.Linear (out, in) → transpose
        "head_w": jnp.asarray(sd["gpt.mel_head.weight"].T, dtype),
        "head_b": jnp.asarray(sd["gpt.mel_head.bias"], dtype),
    }


def hifigan_from_coqui(
    sd: Dict[str, np.ndarray], cfg: HiFiGANConfig, dtype=jnp.bfloat16
) -> Dict:
    """Convert `hifigan_decoder.waveform_decoder.*` keys."""
    p = "hifigan_decoder.waveform_decoder."
    n_up = len(cfg.upsample_rates)
    n_rk = len(cfg.resblock_kernels)

    def conv(prefix):
        # torch conv1d (out, in, k) → (k, in, out)
        return jnp.asarray(_wn(sd, prefix).transpose(2, 1, 0), dtype)

    def bias(prefix):
        return jnp.asarray(sd[prefix + ".bias"], dtype)

    params = {
        "pre_w": conv(p + "conv_pre"),
        "pre_b": bias(p + "conv_pre"),
        # global speaker conditioning: cond_layer (Linear or 1x1 conv)
        "cond_w": jnp.asarray(
            np.squeeze(_wn(sd, p + "cond_layer")).T
            if (p + "cond_layer.weight" in sd or p + "cond_layer.weight_v" in sd)
            else np.zeros((cfg.cond_dim, cfg.upsample_initial), np.float32),
            dtype,
        ),
        "cond_b": jnp.asarray(
            sd.get(p + "cond_layer.bias", np.zeros(cfg.upsample_initial, np.float32)),
            dtype,
        ),
        "ups": [],
        "resblocks": [],
    }
    ch = cfg.upsample_initial
    for i in range(n_up):
        out_ch = ch // 2
        # transposed conv torch weight (in, out, k) → (k, out, in)
        w = _wn(sd, p + f"ups.{i}")
        params["ups"].append(
            {
                "w": jnp.asarray(w.transpose(2, 1, 0), dtype),
                "b": bias(p + f"ups.{i}"),
                "cond_w": jnp.asarray(
                    np.squeeze(
                        _wn(sd, p + f"conds.{i}")
                    ).T
                    if any(
                        k.startswith(p + f"conds.{i}") for k in sd
                    )
                    else np.zeros((cfg.cond_dim, out_ch), np.float32),
                    dtype,
                ),
                "cond_b": jnp.asarray(
                    sd.get(p + f"conds.{i}.bias", np.zeros(out_ch, np.float32)),
                    dtype,
                ),
            }
        )
        stage = []
        for j in range(n_rk):
            ridx = i * n_rk + j
            dils = cfg.resblock_dilations[j]
            stage.append(
                {
                    "w1": [conv(p + f"resblocks.{ridx}.convs1.{d}") for d in range(len(dils))],
                    "b1": [bias(p + f"resblocks.{ridx}.convs1.{d}") for d in range(len(dils))],
                    "w2": [conv(p + f"resblocks.{ridx}.convs2.{d}") for d in range(len(dils))],
                    "b2": [bias(p + f"resblocks.{ridx}.convs2.{d}") for d in range(len(dils))],
                }
            )
        params["resblocks"].append(stage)
        ch = out_ch
    params["post_w"] = conv(p + "conv_post")
    params["post_b"] = bias(p + "conv_post")
    return params


def conditioning_from_coqui(sd: Dict[str, np.ndarray], cfg, dtype=jnp.float32) -> Dict:
    """Convert `gpt.conditioning_encoder.*` + `gpt.conditioning_perceiver.*`
    (XTTS v2 layout: tortoise ConditioningEncoder = init 1×1 conv +
    AttentionBlocks[norm/qkv/proj_out]; PerceiverResampler = latents +
    layers.{i}.[0=Attention(norm,to_q,to_kv,to_out) | 1=FeedForward
    (0=RMSNorm, 1=Linear, 3=Linear)] + final norm).

    RMSNorm gamma keys are looked up under both `gamma` and `g`;
    anything under the two prefixes that is left unconsumed is returned
    via params["_unmapped"] and logged by the caller so a real
    checkpoint surfaces naming drift instead of silently degrading."""
    consumed = set()

    def take(key, *alts, default=None):
        for k in (key,) + alts:
            if k in sd:
                consumed.add(k)
                return sd[k]
        if default is not None:
            return default
        raise KeyError(key)

    p = "gpt.conditioning_encoder."
    D = cfg.d_model
    init_w = take(p + "init.weight")  # (D, n_mels, 1)
    params = {
        "init_w": jnp.asarray(np.squeeze(init_w, -1).T, dtype),  # (M, D)
        "init_b": jnp.asarray(take(p + "init.bias"), dtype),
        "blocks": [],
        "perceiver": [],
    }
    for i in range(cfg.n_blocks):
        b = p + f"attn.{i}."
        params["blocks"].append(
            {
                "norm_g": jnp.asarray(take(b + "norm.weight"), jnp.float32),
                "norm_b": jnp.asarray(take(b + "norm.bias"), jnp.float32),
                # conv1d (3D, D, 1) → (D, 3D)
                "qkv_w": jnp.asarray(
                    np.squeeze(take(b + "qkv.weight"), -1).T, dtype
                ),
                "qkv_b": jnp.asarray(take(b + "qkv.bias"), dtype),
                "proj_w": jnp.asarray(
                    np.squeeze(take(b + "proj_out.weight"), -1).T, dtype
                ),
                "proj_b": jnp.asarray(take(b + "proj_out.bias"), dtype),
            }
        )

    q = "gpt.conditioning_perceiver."
    ones_d = np.ones(D, np.float32)
    params["latents"] = jnp.asarray(take(q + "latents"), dtype)
    for i in range(cfg.perceiver_depth):
        a = q + f"layers.{i}.0."
        f = q + f"layers.{i}.1."
        kv = take(a + "to_kv.weight")  # (2*inner, D)
        inner = kv.shape[0] // 2
        params["perceiver"].append(
            {
                "attn_norm_g": jnp.asarray(
                    take(a + "norm.gamma", a + "norm.g", default=ones_d),
                    jnp.float32,
                ),
                "q_w": jnp.asarray(take(a + "to_q.weight").T, dtype),
                "k_w": jnp.asarray(kv[:inner].T, dtype),
                "v_w": jnp.asarray(kv[inner:].T, dtype),
                "o_w": jnp.asarray(take(a + "to_out.weight").T, dtype),
                "ff_norm_g": jnp.asarray(
                    take(f + "0.gamma", f + "0.g", default=ones_d), jnp.float32
                ),
                "ff1_w": jnp.asarray(take(f + "1.weight").T, dtype),
                "ff1_b": jnp.asarray(
                    take(f + "1.bias", default=np.zeros(0, np.float32)), dtype
                ),
                "ff2_w": jnp.asarray(take(f + "3.weight").T, dtype),
                "ff2_b": jnp.asarray(
                    take(f + "3.bias", default=np.zeros(0, np.float32)), dtype
                ),
            }
        )
        # bias-free checkpoint linears → zero biases at the right width
        for wk, bk_ in (("ff1_w", "ff1_b"), ("ff2_w", "ff2_b")):
            blk = params["perceiver"][-1]
            if blk[bk_].shape[0] != blk[wk].shape[1]:
                blk[bk_] = jnp.zeros(blk[wk].shape[1], dtype)
    params["out_norm_g"] = jnp.asarray(
        take(q + "norm.gamma", q + "norm.g", default=ones_d), jnp.float32
    )

    unmapped = sorted(
        k for k in sd
        if (k.startswith(p) or k.startswith(q)) and k not in consumed
    )
    if unmapped:
        logger.warning(
            "XTTS: %d conditioning keys not mapped (naming drift?): %s",
            len(unmapped), unmapped[:8],
        )
    params["_unmapped"] = unmapped
    return params


def load_coqui_checkpoint(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Load a Coqui model.pth into numpy tensors (torch CPU)."""
    try:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "model" in sd:
            sd = sd["model"]
        return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    except Exception as e:  # noqa: BLE001
        logger.warning("XTTS: checkpoint load failed: %s", e)
        return None
