"""XTTS checkpoint converter tests against synthetically-shaped Coqui
state dicts (no real checkpoint offline; shapes/keys mirror model.pth)."""

import numpy as np
import pytest

from wis_tpu.models.xtts.convert import gpt_from_coqui, hifigan_from_coqui
from wis_tpu.models.xtts.gpt import GPTConfig
from wis_tpu.models.xtts.hifigan import HiFiGANConfig

GPT = GPTConfig(
    n_layer=2, n_head=2, d_model=16, n_text_vocab=50, n_audio_vocab=20,
    max_text_tokens=12, max_audio_tokens=16,
)
VOC = HiFiGANConfig(
    in_dim=16, cond_dim=8, upsample_initial=16,
    upsample_rates=(4, 2), upsample_kernels=(8, 4),
    resblock_kernels=(3,), resblock_dilations=((1, 3),),
)


def _gpt_sd():
    rng = np.random.default_rng(0)
    d = GPT.d_model
    sd = {
        "gpt.text_embedding.weight": rng.standard_normal((GPT.n_text_vocab, d)).astype(np.float32),
        "gpt.text_pos_embedding.emb.weight": rng.standard_normal((GPT.max_text_tokens, d)).astype(np.float32),
        "gpt.mel_embedding.weight": rng.standard_normal((GPT.n_audio_vocab, d)).astype(np.float32),
        "gpt.mel_pos_embedding.emb.weight": rng.standard_normal((GPT.max_audio_tokens, d)).astype(np.float32),
        "gpt.final_norm.weight": np.ones(d, np.float32),
        "gpt.final_norm.bias": np.zeros(d, np.float32),
        "gpt.mel_head.weight": rng.standard_normal((GPT.n_audio_vocab, d)).astype(np.float32),
        "gpt.mel_head.bias": np.zeros(GPT.n_audio_vocab, np.float32),
    }
    for i in range(GPT.n_layer):
        p = f"gpt.gpt.h.{i}."
        sd[p + "ln_1.weight"] = np.ones(d, np.float32)
        sd[p + "ln_1.bias"] = np.zeros(d, np.float32)
        sd[p + "attn.c_attn.weight"] = rng.standard_normal((d, 3 * d)).astype(np.float32)
        sd[p + "attn.c_attn.bias"] = np.zeros(3 * d, np.float32)
        sd[p + "attn.c_proj.weight"] = rng.standard_normal((d, d)).astype(np.float32)
        sd[p + "attn.c_proj.bias"] = np.zeros(d, np.float32)
        sd[p + "ln_2.weight"] = np.ones(d, np.float32)
        sd[p + "ln_2.bias"] = np.zeros(d, np.float32)
        sd[p + "mlp.c_fc.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32)
        sd[p + "mlp.c_fc.bias"] = np.zeros(4 * d, np.float32)
        sd[p + "mlp.c_proj.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32)
        sd[p + "mlp.c_proj.bias"] = np.zeros(d, np.float32)
    return sd


def test_gpt_conversion_shapes_and_forward():
    import jax.numpy as jnp

    params = gpt_from_coqui(_gpt_sd(), GPT, dtype=jnp.float32)
    assert params["blocks"]["attn_w"].shape == (2, 16, 48)
    assert params["head_w"].shape == (16, GPT.n_audio_vocab)
    # converted params drive the decode machinery
    from wis_tpu.models.xtts.gpt import build_decode_chunk, build_prefill

    prefill = build_prefill(GPT, batch=1, cond_len=2, text_len=4, max_len=24)
    cond = jnp.zeros((1, 2, 16), jnp.float32)
    text = jnp.zeros((1, 4), jnp.int32)
    _, cache = prefill(params, cond, text)
    decode = build_decode_chunk(GPT, batch=1, chunk=4, max_len=24)
    import jax

    tokens, latents, *_ = decode(
        params,
        jnp.full((1,), GPT.start_audio_token, jnp.int32),
        cache,
        jnp.zeros((1, GPT.max_audio_tokens), jnp.int32),
        jnp.int32(0),
        jax.random.PRNGKey(0),
        jnp.float32(1.0), jnp.int32(5), jnp.float32(0.9),
        jnp.float32(2.0), jnp.bool_(False),
    )
    assert tokens.shape == (1, 4)
    assert latents.shape == (1, 4, 16)


def _hifigan_sd():
    rng = np.random.default_rng(1)
    p = "hifigan_decoder.waveform_decoder."
    sd = {
        p + "conv_pre.weight": rng.standard_normal((16, 16, 7)).astype(np.float32),
        p + "conv_pre.bias": np.zeros(16, np.float32),
        p + "cond_layer.weight": rng.standard_normal((16, 8, 1)).astype(np.float32),
        p + "cond_layer.bias": np.zeros(16, np.float32),
        p + "conv_post.weight": rng.standard_normal((1, 4, 7)).astype(np.float32),
        p + "conv_post.bias": np.zeros(1, np.float32),
    }
    ch = 16
    for i, k in enumerate((8, 4)):
        out = ch // 2
        sd[p + f"ups.{i}.weight"] = rng.standard_normal((ch, out, k)).astype(np.float32)
        sd[p + f"ups.{i}.bias"] = np.zeros(out, np.float32)
        sd[p + f"conds.{i}.weight"] = rng.standard_normal((out, 8, 1)).astype(np.float32)
        sd[p + f"conds.{i}.bias"] = np.zeros(out, np.float32)
        for d in range(2):  # dilations (1, 3)
            sd[p + f"resblocks.{i}.convs1.{d}.weight"] = rng.standard_normal((out, out, 3)).astype(np.float32)
            sd[p + f"resblocks.{i}.convs1.{d}.bias"] = np.zeros(out, np.float32)
            sd[p + f"resblocks.{i}.convs2.{d}.weight"] = rng.standard_normal((out, out, 3)).astype(np.float32)
            sd[p + f"resblocks.{i}.convs2.{d}.bias"] = np.zeros(out, np.float32)
        ch = out
    return sd


def test_hifigan_conversion_and_forward():
    import jax.numpy as jnp

    params = hifigan_from_coqui(_hifigan_sd(), VOC, dtype=jnp.float32)
    from wis_tpu.models.xtts.hifigan import hifigan_forward

    latents = jnp.zeros((1, 6, 16), jnp.float32)
    speaker = jnp.ones((1, 8), jnp.float32)
    wav = hifigan_forward(params, latents, speaker, VOC)
    assert wav.shape == (1, 6 * VOC.total_upsample)
    assert np.isfinite(np.asarray(wav)).all()


def test_weight_norm_resolution():
    rng = np.random.default_rng(2)
    v = rng.standard_normal((4, 3, 5)).astype(np.float32)
    g = np.linalg.norm(v.reshape(4, -1), axis=1).reshape(4, 1, 1) * 2
    sd = {"x.weight_g": g, "x.weight_v": v}
    from wis_tpu.models.xtts.convert import _wn

    w = _wn(sd, "x")
    # resolved weight has per-output-norm == g
    norms = np.linalg.norm(w.reshape(4, -1), axis=1)
    np.testing.assert_allclose(norms, g.reshape(-1), rtol=1e-5)
