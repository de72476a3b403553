"""Full-dims converter self-tests (offline checkpoint-path validation).

The HF-parity suites validate converter *math* token-exactly at micro
dims; this module validates the converters at the REAL dims of each
production checkpoint without needing the checkpoint itself (this build
environment has zero egress — BENCH.md real-weight status):

- :func:`whisper_selftest` instantiates an actual HF
  ``WhisperForConditionalGeneration`` at the target size's architecture
  (transformers is the source of truth for the key layout — the same
  layout `wisctl download-models` fetches, reference utils.sh:99-108),
  zero-fills it (values are irrelevant; shapes/keys/memory are the
  test), converts through :func:`weights.params_from_hf`, shape-checks
  the pytree against :func:`weights.random_params` via ``eval_shape``,
  and optionally runs one full-dims encoder pass + cross-KV projection.
- :func:`xtts_selftest` synthesizes the published XTTS-v2 ``model.pth``
  key list at production dims (D=1024, 30 layers — the layout
  tests/test_xtts_convert.py pins at micro dims), converts through
  `gpt_from_coqui` / `hifigan_from_coqui` / `conditioning_from_coqui`,
  and optionally runs one GPT decode step + one vocoder chunk.

Exposed as ``wisctl convert-model --selftest <size|xtts>`` (reference
analog: the model load path, main.py:341-443). Uses whatever JAX
backend is active — callers wanting CPU set JAX_PLATFORMS=cpu first.
"""

from __future__ import annotations

import logging
import time
from typing import Dict

import numpy as np

logger = logging.getLogger("wis_tpu")


def _tree_spec(tree) -> Dict:
    import jax

    return jax.tree_util.tree_map(
        lambda x: (tuple(x.shape), str(x.dtype)), tree
    )


def _param_bytes(tree) -> int:
    import jax

    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
    )


# --------------------------------------------------------------------------- #
# Whisper
# --------------------------------------------------------------------------- #
def synthetic_hf_whisper(cfg) -> Dict[str, np.ndarray]:
    """A zero-filled HF Whisper state dict at cfg's REAL dims, with the
    exact key layout transformers serializes (the converter's input
    contract)."""
    import torch
    import transformers
    from transformers.modeling_utils import no_init_weights

    hf_cfg = transformers.WhisperConfig(
        vocab_size=cfg.n_vocab,
        num_mel_bins=cfg.n_mels,
        d_model=cfg.n_audio_state,
        encoder_layers=cfg.n_audio_layer,
        encoder_attention_heads=cfg.n_audio_head,
        decoder_layers=cfg.n_text_layer,
        decoder_attention_heads=cfg.n_text_head,
        encoder_ffn_dim=4 * cfg.n_audio_state,
        decoder_ffn_dim=4 * cfg.n_text_state,
        max_source_positions=cfg.n_audio_ctx,
        max_target_positions=cfg.n_text_ctx,
    )
    with torch.no_grad(), no_init_weights():
        model = transformers.WhisperForConditionalGeneration(hf_cfg)
        for p in model.parameters():
            p.data.zero_()
    # .numpy() shares storage — no extra copy of the ~GBs involved
    return {k: v.numpy() for k, v in model.state_dict().items()}


def whisper_selftest(size: str, forward: bool = True) -> Dict:
    """Convert a synthetic full-dims HF checkpoint and validate the
    resulting pytree (and optionally one forward). Returns a report
    dict; raises on any mismatch."""
    import jax
    import jax.numpy as jnp

    from wis_tpu.models.whisper.config import (
        WHISPER_CONFIGS,
        resolve_model_name,
    )
    from wis_tpu.models.whisper.weights import params_from_hf, random_params

    cfg = WHISPER_CONFIGS[resolve_model_name(size)]
    t0 = time.perf_counter()
    tensors = synthetic_hf_whisper(cfg)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    params = params_from_hf(tensors, cfg)
    t_convert = time.perf_counter() - t0

    # the converted tree must match the architecture tree exactly —
    # eval_shape avoids materializing a second full-dims parameter set
    expect = _tree_spec(
        jax.eval_shape(lambda: random_params(cfg, dtype=jnp.bfloat16))
    )
    got = _tree_spec(params)
    if got != expect:
        import jax.tree_util as jtu

        diffs = [
            f"{jtu.keystr(k)}: got {g} want {e}"
            for (k, g), (_, e) in zip(
                jtu.tree_leaves_with_path(got), jtu.tree_leaves_with_path(expect)
            )
            if g != e
        ]
        raise AssertionError(
            f"converted pytree diverges from architecture at {len(diffs)} "
            f"leaves: {diffs[:5]}"
        )

    report = {
        "model": cfg.name,
        "params": int(
            sum(x.size for x in jax.tree_util.tree_leaves(params))
        ),
        "param_bytes": _param_bytes(params),
        "build_s": round(t_build, 1),
        "convert_s": round(t_convert, 1),
    }

    if forward:
        from wis_tpu.models.whisper.model import cross_kv, encode

        t0 = time.perf_counter()
        mel = jnp.zeros((1, cfg.n_mels, 2 * cfg.n_audio_ctx), jnp.float32)
        xa = encode(params, mel, cfg)
        kv = cross_kv(params, xa, cfg)
        ok = bool(
            np.isfinite(np.asarray(xa, np.float32)).all()
            and all(
                np.isfinite(np.asarray(leaf, np.float32)).all()
                for leaf in jax.tree_util.tree_leaves(kv)
            )
        )
        report["forward_s"] = round(time.perf_counter() - t0, 1)
        report["encoder_out"] = tuple(xa.shape)
        if not ok:
            raise AssertionError("non-finite encoder output at full dims")
    return report


# --------------------------------------------------------------------------- #
# XTTS
# --------------------------------------------------------------------------- #
def synthetic_coqui_sd(gpt_cfg, voc_cfg, cond_cfg) -> Dict[str, np.ndarray]:
    """The published XTTS-v2 model.pth key list at the given dims
    (zero-filled; the published checkpoint's pos tables carry +2/+3
    start/stop rows over the config maxima)."""
    D, L = gpt_cfg.d_model, gpt_cfg.n_layer
    z = lambda *s: np.zeros(s, np.float32)  # noqa: E731
    text_pos = gpt_cfg.max_text_tokens + 2
    mel_pos = gpt_cfg.max_audio_tokens + 3
    sd = {
        "mel_stats": np.ones(cond_cfg.n_mels, np.float32),
        "gpt.text_embedding.weight": z(gpt_cfg.n_text_vocab, D),
        "gpt.text_pos_embedding.emb.weight": z(text_pos, D),
        "gpt.mel_embedding.weight": z(gpt_cfg.n_audio_vocab, D),
        "gpt.mel_pos_embedding.emb.weight": z(mel_pos, D),
        "gpt.gpt.ln_f.weight": z(D),
        "gpt.gpt.ln_f.bias": z(D),
        "gpt.final_norm.weight": z(D),
        "gpt.final_norm.bias": z(D),
        "gpt.text_head.weight": z(gpt_cfg.n_text_vocab, D),
        "gpt.text_head.bias": z(gpt_cfg.n_text_vocab),
        "gpt.mel_head.weight": z(gpt_cfg.n_audio_vocab, D),
        "gpt.mel_head.bias": z(gpt_cfg.n_audio_vocab),
        "gpt.conditioning_encoder.init.weight": z(D, cond_cfg.n_mels, 1),
        "gpt.conditioning_encoder.init.bias": z(D),
        "gpt.conditioning_perceiver.latents": z(cond_cfg.n_latents, D),
        "gpt.conditioning_perceiver.norm.gamma": z(D),
    }
    for i in range(L):
        p = f"gpt.gpt.h.{i}."
        sd[p + "ln_1.weight"] = z(D)
        sd[p + "ln_1.bias"] = z(D)
        sd[p + "attn.bias"] = np.ones((1, 1, mel_pos, mel_pos), np.float32)
        sd[p + "attn.masked_bias"] = np.asarray(-1e4, np.float32)
        sd[p + "attn.c_attn.weight"] = z(D, 3 * D)
        sd[p + "attn.c_attn.bias"] = z(3 * D)
        sd[p + "attn.c_proj.weight"] = z(D, D)
        sd[p + "attn.c_proj.bias"] = z(D)
        sd[p + "ln_2.weight"] = z(D)
        sd[p + "ln_2.bias"] = z(D)
        sd[p + "mlp.c_fc.weight"] = z(D, 4 * D)
        sd[p + "mlp.c_fc.bias"] = z(4 * D)
        sd[p + "mlp.c_proj.weight"] = z(4 * D, D)
        sd[p + "mlp.c_proj.bias"] = z(D)
    for i in range(cond_cfg.n_blocks):
        b = f"gpt.conditioning_encoder.attn.{i}."
        sd[b + "norm.weight"] = z(D)
        sd[b + "norm.bias"] = z(D)
        sd[b + "qkv.weight"] = z(3 * D, D, 1)
        sd[b + "qkv.bias"] = z(3 * D)
        sd[b + "proj_out.weight"] = z(D, D, 1)
        sd[b + "proj_out.bias"] = z(D)
    inner = cond_cfg.perceiver_heads * cond_cfg.perceiver_dim_head
    for i in range(cond_cfg.perceiver_depth):
        a = f"gpt.conditioning_perceiver.layers.{i}.0."
        f = f"gpt.conditioning_perceiver.layers.{i}.1."
        sd[a + "norm.gamma"] = z(D)
        sd[a + "to_q.weight"] = z(inner, D)
        sd[a + "to_kv.weight"] = z(2 * inner, D)
        sd[a + "to_out.weight"] = z(D, inner)
        sd[f + "0.gamma"] = z(D)
        sd[f + "1.weight"] = z(cond_cfg.ff_mult * D, D)
        sd[f + "1.bias"] = z(cond_cfg.ff_mult * D)
        sd[f + "3.weight"] = z(D, cond_cfg.ff_mult * D)
        sd[f + "3.bias"] = z(D)
    h = "hifigan_decoder.waveform_decoder."

    def wn(prefix, *shape):
        sd[prefix + ".weight_v"] = z(*shape)
        sd[prefix + ".weight_g"] = np.ones(
            (shape[0],) + (1,) * (len(shape) - 1), np.float32
        )

    ch = voc_cfg.upsample_initial
    wn(h + "conv_pre", ch, voc_cfg.in_dim, 7)
    sd[h + "conv_pre.bias"] = z(ch)
    sd[h + "cond_layer.weight"] = z(ch, voc_cfg.cond_dim, 1)
    sd[h + "cond_layer.bias"] = z(ch)
    for i, (r, k) in enumerate(
        zip(voc_cfg.upsample_rates, voc_cfg.upsample_kernels)
    ):
        out = ch // 2
        wn(h + f"ups.{i}", ch, out, k)
        sd[h + f"ups.{i}.bias"] = z(out)
        for j, rk in enumerate(voc_cfg.resblock_kernels):
            ridx = i * len(voc_cfg.resblock_kernels) + j
            for d in range(len(voc_cfg.resblock_dilations[j])):
                wn(h + f"resblocks.{ridx}.convs1.{d}", out, out, rk)
                sd[h + f"resblocks.{ridx}.convs1.{d}.bias"] = z(out)
                wn(h + f"resblocks.{ridx}.convs2.{d}", out, out, rk)
                sd[h + f"resblocks.{ridx}.convs2.{d}.bias"] = z(out)
        ch = out
    wn(h + "conv_post", 1, ch, 7)
    sd[h + "conv_post.bias"] = z(1)
    return sd


def xtts_selftest(forward: bool = True) -> Dict:
    """Convert a synthetic production-dims XTTS checkpoint and validate;
    optionally one GPT decode step + one vocoder chunk."""
    import jax
    import jax.numpy as jnp

    from wis_tpu.models.xtts.conditioning import ConditioningConfig
    from wis_tpu.models.xtts.convert import (
        conditioning_from_coqui,
        gpt_from_coqui,
        hifigan_from_coqui,
    )
    from wis_tpu.models.xtts.model import XTTSConfig

    cfg = XTTSConfig()
    cond_cfg = ConditioningConfig()
    t0 = time.perf_counter()
    sd = synthetic_coqui_sd(cfg.gpt, cfg.vocoder, cond_cfg)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    gpt_params = gpt_from_coqui(sd, cfg.gpt)
    voc_params = hifigan_from_coqui(sd, cfg.vocoder)
    cond_params = conditioning_from_coqui(sd, cond_cfg)
    t_convert = time.perf_counter() - t0
    assert cond_params.get("_unmapped", []) == [], cond_params["_unmapped"]

    L, D = cfg.gpt.n_layer, cfg.gpt.d_model
    assert gpt_params["blocks"]["q_w"].shape == (L, D, D)
    assert gpt_params["blocks"]["mlp_w1"].shape == (L, D, 4 * D)
    assert gpt_params["text_emb"].shape == (cfg.gpt.n_text_vocab, D)
    assert gpt_params["head_w"].shape == (D, cfg.gpt.n_audio_vocab)
    # transposed-conv weights land as (k, out, in)
    assert voc_params["ups"][0]["w"].shape[1] == cfg.vocoder.upsample_initial // 2
    assert voc_params["ups"][0]["w"].shape[2] == cfg.vocoder.upsample_initial

    report = {
        "model": "xtts-v2",
        "keys": len(sd),
        "param_bytes": (
            _param_bytes(gpt_params)
            + _param_bytes(voc_params)
            + _param_bytes({k: v for k, v in cond_params.items()
                            if k != "_unmapped"})
        ),
        "build_s": round(t_build, 1),
        "convert_s": round(t_convert, 1),
    }

    if forward:
        from wis_tpu.models.xtts.gpt import build_prefill
        from wis_tpu.models.xtts.hifigan import hifigan_forward

        t0 = time.perf_counter()
        latents = jnp.zeros((1, 8, cfg.vocoder.in_dim), jnp.bfloat16)
        speaker = jnp.zeros((1, cfg.vocoder.cond_dim), jnp.bfloat16)
        wav = hifigan_forward(voc_params, latents, speaker, cfg.vocoder)
        if not np.isfinite(np.asarray(wav, np.float32)).all():
            raise AssertionError("non-finite vocoder output at full dims")
        prefill = build_prefill(
            cfg.gpt, batch=1, cond_len=cfg.cond_len, text_len=16, max_len=128
        )
        hidden, _cache = prefill(
            gpt_params,
            jnp.zeros((1, cfg.cond_len, D), jnp.bfloat16),
            jnp.zeros((1, 16), jnp.int32),
        )
        if not np.isfinite(np.asarray(hidden, np.float32)).all():
            raise AssertionError("non-finite GPT prefill at full dims")
        report["forward_s"] = round(time.perf_counter() - t0, 1)
        report["vocoder_out"] = tuple(np.asarray(wav).shape)
    return report
