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
    gpt_code_stride=16,  # ×2 latent interp at micro scale
)


def _gpt_sd():
    rng = np.random.default_rng(0)
    d = GPT.d_model
    sd = {
        "gpt.text_embedding.weight": rng.standard_normal((GPT.n_text_vocab, d)).astype(np.float32),
        "gpt.text_pos_embedding.emb.weight": rng.standard_normal((GPT.max_text_tokens, d)).astype(np.float32),
        "gpt.mel_embedding.weight": rng.standard_normal((GPT.n_audio_vocab, d)).astype(np.float32),
        "gpt.mel_pos_embedding.emb.weight": rng.standard_normal((GPT.max_audio_tokens, d)).astype(np.float32),
        "gpt.gpt.ln_f.weight": np.ones(d, np.float32),
        "gpt.gpt.ln_f.bias": np.zeros(d, np.float32),
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
    # packed c_attn is split into per-projection leaves (TP sharding)
    for leaf in ("q_w", "k_w", "v_w"):
        assert params["blocks"][leaf].shape == (2, 16, 16)
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
    assert wav.shape == (1, VOC.vocoded_length(6))
    assert np.isfinite(np.asarray(wav)).all()


def test_latent_timeline_matches_torch_interpolate():
    """The two HifiDecoder pre-stages must reproduce torch
    F.interpolate(mode='linear', align_corners=False) — lengths (floor)
    AND values (half-pixel sampling) — at the production ratios
    (×4 = 1024/256, then ×24000/22050)."""
    import jax.numpy as jnp
    import torch

    from wis_tpu.models.xtts.hifigan import latent_timeline

    cfg = HiFiGANConfig(
        in_dim=4, upsample_rates=(4,), upsample_kernels=(8,),
        gpt_code_stride=16,  # ×4 interp, same ratio as production
    )
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 7, 4)).astype(np.float32)

    z = np.asarray(latent_timeline(jnp.asarray(x), cfg))

    t = torch.nn.functional.interpolate(
        torch.from_numpy(x).transpose(1, 2),
        scale_factor=cfg.gpt_code_stride / cfg.total_upsample,
        mode="linear",
    )
    t = torch.nn.functional.interpolate(
        t, scale_factor=cfg.sample_rate / cfg.input_sample_rate, mode="linear"
    ).transpose(1, 2).numpy()

    assert z.shape == t.shape == (2, 30, 4)
    np.testing.assert_allclose(z, t, rtol=1e-5, atol=1e-6)


def _torch_hifigan_mirror(sd, latents, speaker, cfg):
    """Functional torch mirror of Coqui's HifiDecoder + HifiganGenerator
    forward (TTS/vocoder/models/hifigan_generator.py semantics: explicit
    torch paddings, LRELU_SLOPE=0.1 except the default-slope 0.01
    leaky_relu before conv_post, per-stage speaker conds, MRF average) —
    the external oracle for the lax conv/conv_transpose equivalences in
    wis_tpu/models/xtts/hifigan.py."""
    import torch
    import torch.nn.functional as F

    p = "hifigan_decoder.waveform_decoder."
    w = lambda k: torch.from_numpy(sd[p + k + ".weight"])  # noqa: E731
    b = lambda k: torch.from_numpy(sd[p + k + ".bias"])  # noqa: E731

    x = torch.from_numpy(latents).transpose(1, 2)  # (B, C, T)
    g = torch.from_numpy(speaker)[:, :, None]
    # HifiDecoder latent-timeline pre-stages
    x = F.interpolate(
        x, scale_factor=cfg.gpt_code_stride / cfg.total_upsample, mode="linear"
    )
    if cfg.sample_rate != cfg.input_sample_rate:
        x = F.interpolate(
            x, scale_factor=cfg.sample_rate / cfg.input_sample_rate,
            mode="linear",
        )

    o = F.conv1d(x, w("conv_pre"), b("conv_pre"), padding=3)
    o = o + F.conv1d(g, w("cond_layer"), b("cond_layer"))
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        o = F.leaky_relu(o, 0.1)
        o = F.conv_transpose1d(
            o, w(f"ups.{i}"), b(f"ups.{i}"), stride=r, padding=(k - r) // 2
        )
        o = o + F.conv1d(g, w(f"conds.{i}"), b(f"conds.{i}"))
        acc = None
        for j, rk in enumerate(cfg.resblock_kernels):
            ridx = i * len(cfg.resblock_kernels) + j
            xt = o
            for d_i, d in enumerate(cfg.resblock_dilations[j]):
                h = F.leaky_relu(xt, 0.1)
                h = F.conv1d(
                    h,
                    w(f"resblocks.{ridx}.convs1.{d_i}"),
                    b(f"resblocks.{ridx}.convs1.{d_i}"),
                    dilation=d,
                    padding=(rk - 1) * d // 2,
                )
                h = F.leaky_relu(h, 0.1)
                h = F.conv1d(
                    h,
                    w(f"resblocks.{ridx}.convs2.{d_i}"),
                    b(f"resblocks.{ridx}.convs2.{d_i}"),
                    padding=(rk - 1) // 2,
                )
                xt = xt + h
            acc = xt if acc is None else acc + xt
        o = acc / len(cfg.resblock_kernels)
    o = F.leaky_relu(o)  # upstream quirk: default slope 0.01 here
    o = F.conv1d(o, w("conv_post"), b("conv_post"), padding=3)
    return torch.tanh(o).squeeze(1).numpy()


def test_hifigan_matches_torch_mirror():
    """Full vocoder forward — interpolation pre-stages, SAME-padded convs,
    transposed convs, conditioning injections, MRF resblocks, final
    default-slope relu — must be numerically equal to the torch
    semantics the real checkpoint was trained under."""
    import jax.numpy as jnp

    from wis_tpu.models.xtts.hifigan import hifigan_forward

    rng = np.random.default_rng(7)
    sd = _hifigan_sd()
    params = hifigan_from_coqui(sd, VOC, dtype=jnp.float32)
    latents = rng.standard_normal((2, 6, VOC.in_dim)).astype(np.float32)
    speaker = rng.standard_normal((2, VOC.cond_dim)).astype(np.float32)

    ours = np.asarray(
        hifigan_forward(params, jnp.asarray(latents), jnp.asarray(speaker), VOC)
    )
    theirs = _torch_hifigan_mirror(sd, latents, speaker, VOC)
    assert ours.shape == theirs.shape == (2, VOC.vocoded_length(6))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


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


# --------------------------------------------------------------------------- #
# Production key coverage (VERDICT r2 next-step #9): the converter must
# consume EVERY key of the published XTTS-v2 `model.pth` layout (names
# transcribed from the public Coqui TTS model definitions:
# TTS/tts/layers/xtts/gpt.py [30-layer GPT2 + custom embeddings/heads],
# TTS/tts/layers/xtts/perceiver_encoder.py [PerceiverResampler],
# TTS/tts/layers/tortoise/autoregressive.py [ConditioningEncoder],
# TTS/vocoder/models/hifigan_generator.py [weight-normed HiFi-GAN]) —
# or the key must be on the documented ignore list below. Weights are
# synthetic; key NAMES and structural counts follow the production
# config exactly (30 GPT layers, 6 conditioning blocks, depth-2
# perceiver, 4 upsample stages × resblocks [3,7,11] × dilations
# [1,3,5]); tensor widths are scaled down 16× so the conversion runs in
# seconds — coverage is about names, not bytes.
# --------------------------------------------------------------------------- #

#: keys the converter deliberately does NOT map, and why
IGNORED_PRODUCTION_KEYS = (
    # torch GPT2 attention buffers (causal mask constants, not weights)
    (".attn.bias", "GPT2 causal-mask buffer"),
    (".attn.masked_bias", "GPT2 mask constant buffer"),
    # the text-logits head is never used for speech synthesis (the
    # serving path samples audio codes from mel_head only)
    ("gpt.text_head.", "text head unused in synthesis"),
    # Coqui's bundled ResNet speaker encoder is replaced by the in-repo
    # WavLM x-vector (models/xtts/model.py:_speaker_embedding)
    ("hifigan_decoder.speaker_encoder.", "WavLM x-vector stand-in"),
    # cloning mel normalization stats — the clone frontend currently
    # uses the whisper log-mel (model.py clone_speaker); divergence
    # documented there
    ("mel_stats", "cloning mel frontend divergence (documented)"),
)


class _TrackingDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.consumed.add(k)
        return super().get(k, default)


def _production_sd():
    """The full XTTS-v2 model.pth key list with production shapes."""
    rng = np.random.default_rng(0)
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)  # noqa: E731
    D, L = 64, 30
    sd = {
        "mel_stats": np.ones(80, np.float32),
        "gpt.text_embedding.weight": f32(418, D),
        "gpt.text_pos_embedding.emb.weight": f32(404, D),
        "gpt.mel_embedding.weight": f32(1026, D),
        "gpt.mel_pos_embedding.emb.weight": f32(608, D),
        "gpt.gpt.ln_f.weight": f32(D),
        "gpt.gpt.ln_f.bias": f32(D),
        "gpt.final_norm.weight": f32(D),
        "gpt.final_norm.bias": f32(D),
        "gpt.text_head.weight": f32(418, D),
        "gpt.text_head.bias": f32(418),
        "gpt.mel_head.weight": f32(1026, D),
        "gpt.mel_head.bias": f32(1026),
        # conditioning encoder: 1x1 init conv + 6 attention blocks
        "gpt.conditioning_encoder.init.weight": f32(D, 80, 1),
        "gpt.conditioning_encoder.init.bias": f32(D),
        # perceiver resampler: 32 latents, depth 2
        "gpt.conditioning_perceiver.latents": f32(32, D),
        "gpt.conditioning_perceiver.norm.gamma": f32(D),
    }
    for i in range(L):
        p = f"gpt.gpt.h.{i}."
        sd[p + "ln_1.weight"] = f32(D)
        sd[p + "ln_1.bias"] = f32(D)
        sd[p + "attn.bias"] = np.ones((1, 1, 608, 608), np.float32)
        sd[p + "attn.masked_bias"] = np.asarray(-1e4, np.float32)
        sd[p + "attn.c_attn.weight"] = f32(D, 3 * D)
        sd[p + "attn.c_attn.bias"] = f32(3 * D)
        sd[p + "attn.c_proj.weight"] = f32(D, D)
        sd[p + "attn.c_proj.bias"] = f32(D)
        sd[p + "ln_2.weight"] = f32(D)
        sd[p + "ln_2.bias"] = f32(D)
        sd[p + "mlp.c_fc.weight"] = f32(D, 4 * D)
        sd[p + "mlp.c_fc.bias"] = f32(4 * D)
        sd[p + "mlp.c_proj.weight"] = f32(4 * D, D)
        sd[p + "mlp.c_proj.bias"] = f32(D)
    for i in range(6):
        b = f"gpt.conditioning_encoder.attn.{i}."
        sd[b + "norm.weight"] = f32(D)
        sd[b + "norm.bias"] = f32(D)
        sd[b + "qkv.weight"] = f32(3 * D, D, 1)
        sd[b + "qkv.bias"] = f32(3 * D)
        sd[b + "proj_out.weight"] = f32(D, D, 1)
        sd[b + "proj_out.bias"] = f32(D)
    inner = 8 * 8  # perceiver heads × (scaled) dim_head
    for i in range(2):
        a = f"gpt.conditioning_perceiver.layers.{i}.0."
        f = f"gpt.conditioning_perceiver.layers.{i}.1."
        sd[a + "norm.gamma"] = f32(D)
        sd[a + "to_q.weight"] = f32(inner, D)
        sd[a + "to_kv.weight"] = f32(2 * inner, D)
        sd[a + "to_out.weight"] = f32(D, inner)
        sd[f + "0.gamma"] = f32(D)
        sd[f + "1.weight"] = f32(4 * D, D)
        sd[f + "1.bias"] = f32(4 * D)
        sd[f + "3.weight"] = f32(D, 4 * D)
        sd[f + "3.bias"] = f32(D)
    # HiFi-GAN waveform decoder (weight-normed: weight_g/weight_v pairs)
    h = "hifigan_decoder.waveform_decoder."

    def wn(prefix, *shape):
        sd[prefix + ".weight_v"] = f32(*shape)
        sd[prefix + ".weight_g"] = np.abs(f32(shape[0], *([1] * (len(shape) - 1)))) + 0.1

    wn(h + "conv_pre", 32, D, 7)
    sd[h + "conv_pre.bias"] = f32(32)
    sd[h + "cond_layer.weight"] = f32(32, 32, 1)
    sd[h + "cond_layer.bias"] = f32(32)
    ch = 32
    ups = ((8, 16), (8, 16), (2, 4), (2, 4))
    for i, (r, k) in enumerate(ups):
        out = ch // 2
        wn(h + f"ups.{i}", ch, out, k)
        sd[h + f"ups.{i}.bias"] = f32(out)
        for j, rk in enumerate((3, 7, 11)):
            ridx = i * 3 + j
            for d in range(3):  # dilations (1, 3, 5)
                wn(h + f"resblocks.{ridx}.convs1.{d}", out, out, rk)
                sd[h + f"resblocks.{ridx}.convs1.{d}.bias"] = f32(out)
                wn(h + f"resblocks.{ridx}.convs2.{d}", out, out, rk)
                sd[h + f"resblocks.{ridx}.convs2.{d}.bias"] = f32(out)
        ch = out
    wn(h + "conv_post", 1, 2, 7)
    sd[h + "conv_post.bias"] = f32(1)
    # bundled ResNet speaker encoder (replaced — representative keys)
    sd["hifigan_decoder.speaker_encoder.conv1.weight"] = f32(32, 1, 3, 3)
    sd["hifigan_decoder.speaker_encoder.layer1.0.conv1.weight"] = f32(32, 32, 3, 3)
    sd["hifigan_decoder.speaker_encoder.fc.weight"] = f32(64, 256)
    return sd


def test_production_key_coverage():
    """Every production key is consumed by a converter or on the
    documented ignore list — zero silently-dropped weights."""
    import jax.numpy as jnp

    from wis_tpu.models.xtts.conditioning import ConditioningConfig
    from wis_tpu.models.xtts.convert import conditioning_from_coqui

    sd = _TrackingDict(_production_sd())
    gpt_cfg = GPTConfig(
        n_layer=30, n_head=16, d_model=64, n_text_vocab=418,
        n_audio_vocab=1026, max_text_tokens=404, max_audio_tokens=608,
    )
    voc_cfg = HiFiGANConfig(
        in_dim=64, cond_dim=32, upsample_initial=32,
        upsample_rates=(8, 8, 2, 2), upsample_kernels=(16, 16, 4, 4),
        resblock_kernels=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    )
    gpt_params = gpt_from_coqui(sd, gpt_cfg, dtype=jnp.bfloat16)
    voc_params = hifigan_from_coqui(sd, voc_cfg, dtype=jnp.bfloat16)
    cond_params = conditioning_from_coqui(
        sd,
        ConditioningConfig(
            d_model=64, n_heads=16, perceiver_heads=8, perceiver_dim_head=8,
        ),
    )

    assert cond_params["_unmapped"] == [], cond_params["_unmapped"]
    assert gpt_params["blocks"]["q_w"].shape == (30, 64, 64)
    assert gpt_params["blocks"]["v_w"].shape == (30, 64, 64)
    assert voc_params["ups"][0]["w"].shape == (16, 16, 32)

    leftovers = []
    for key in sd:
        if key in sd.consumed:
            continue
        if any(key.startswith(pfx) or pfx in key
               for pfx, _why in IGNORED_PRODUCTION_KEYS):
            continue
        leftovers.append(key)
    assert leftovers == [], (
        f"{len(leftovers)} production keys silently dropped: "
        f"{leftovers[:10]}"
    )
