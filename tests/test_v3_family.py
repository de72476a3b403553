"""Whisper v3-family support (large-v3 / large-v3-turbo / distil-*).

The reference serves only the five v2-layout sizes (reference
main.py:319-448); this build extends the family to the v3 vocabulary
layout (128 mel bins, <|yue|> as language #100, task/timestamp specials
shifted up by one, vocab 51866) and the distilled decoders. These tests
pin the derived layout against the public OpenAI token ids and run the
layout through the converter, grammar, and engine end-to-end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wis_tpu.models.whisper.config import (
    WHISPER_CONFIGS,
    WhisperConfig,
    resolve_model_name,
)
from wis_tpu.models.whisper.tokenizer import (
    DEFAULT_SUPPRESS_TOKENS,
    EOT,
    SOT,
    V2_LAYOUT,
    V3_LAYOUT,
    WhisperTokenizer,
    build_prompt,
    default_suppress_tokens,
    layout_for_vocab,
    parse_segments,
)
from wis_tpu.models.whisper.weights import random_params

V3_MICRO = WhisperConfig(
    name="micro-v3",
    n_mels=128,
    n_vocab=51866,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=1,  # asymmetric, like turbo/distil decoders
)


# --------------------------------------------------------------------- #
# Layout
# --------------------------------------------------------------------- #
def test_v2_layout_matches_module_constants():
    from wis_tpu.models.whisper import tokenizer as t

    assert V2_LAYOUT.translate == t.TRANSLATE == 50358
    assert V2_LAYOUT.transcribe == t.TRANSCRIBE == 50359
    assert V2_LAYOUT.no_timestamps == t.NO_TIMESTAMPS == 50363
    assert V2_LAYOUT.timestamp_base == t.TIMESTAMP_BASE == 50364
    assert V2_LAYOUT.n_vocab == t.N_VOCAB == 51865


def test_v3_layout_public_ids():
    # public openai/whisper-large-v3 special-token ids
    assert V3_LAYOUT.n_langs == 100
    assert (V3_LAYOUT.eot, V3_LAYOUT.sot) == (50257, 50258)
    assert V3_LAYOUT.lang_token("yue") == 50358
    assert V3_LAYOUT.translate == 50359
    assert V3_LAYOUT.transcribe == 50360
    assert V3_LAYOUT.no_timestamps == 50364
    assert V3_LAYOUT.timestamp_base == 50365
    assert V3_LAYOUT.n_vocab == 51866


def test_layout_for_vocab():
    assert layout_for_vocab(51865) is V2_LAYOUT
    assert layout_for_vocab(51866) is V3_LAYOUT
    with pytest.raises(ValueError):
        layout_for_vocab(50000)


def test_suppress_tokens_shift():
    assert default_suppress_tokens(V2_LAYOUT) == DEFAULT_SUPPRESS_TOKENS
    v3 = default_suppress_tokens(V3_LAYOUT)
    # symbol half unchanged, special tail shifted by one
    assert v3[: len(v3) - 6] == DEFAULT_SUPPRESS_TOKENS[:-6]
    assert v3[-6:] == (50258, 50359, 50360, 50361, 50362, 50363)


def test_build_prompt_v3():
    assert build_prompt("en", "transcribe", layout=V3_LAYOUT) == [
        SOT,
        50259,
        50360,
        50364,
    ]
    assert build_prompt("yue", "translate", notimestamps=False, layout=V3_LAYOUT) == [
        SOT,
        50358,
        50359,
    ]
    # v2 prompts are unchanged by the refactor
    assert build_prompt("en", "transcribe") == [SOT, 50259, 50359, 50363]


def test_parse_segments_v3_tokenizer():
    tok = WhisperTokenizer(layout=V3_LAYOUT)
    ts = V3_LAYOUT.timestamp_base
    ids = [ts, 100, 200, ts + 50, ts + 50, 300, ts + 100, EOT]
    segs = parse_segments(tok, ids)
    assert len(segs) == 2
    assert segs[0]["start"] == 0.0 and segs[0]["end"] == 1.0
    assert segs[1]["start"] == 1.0 and segs[1]["end"] == 2.0
    # v2 tokenizer would mis-bucket these ids (off-by-one layout)
    assert tok.all_special_ids == frozenset(range(EOT, 51866))


def test_v3_default_suppress_in_tokenizer():
    tok = WhisperTokenizer(layout=V3_LAYOUT)
    assert tok.suppress_tokens == default_suppress_tokens(V3_LAYOUT)


# --------------------------------------------------------------------- #
# Configs
# --------------------------------------------------------------------- #
def test_v3_family_configs():
    v3 = WHISPER_CONFIGS["large-v3"]
    assert (v3.n_mels, v3.n_vocab, v3.n_text_layer) == (128, 51866, 32)
    turbo = WHISPER_CONFIGS["large-v3-turbo"]
    assert (turbo.n_mels, turbo.n_vocab) == (128, 51866)
    assert (turbo.n_audio_layer, turbo.n_text_layer) == (32, 4)
    d2 = WHISPER_CONFIGS["distil-large-v2"]
    assert (d2.n_mels, d2.n_vocab, d2.n_text_layer, d2.n_audio_layer) == (
        80,
        51865,
        2,
        32,
    )
    d3 = WHISPER_CONFIGS["distil-large-v3"]
    assert (d3.n_mels, d3.n_vocab, d3.n_text_layer) == (128, 51866, 2)


def test_resolve_aliases():
    assert resolve_model_name("turbo") == "large-v3-turbo"
    assert resolve_model_name("large-v3") == "large-v3"
    assert resolve_model_name("large-v2") == "large"
    with pytest.raises(KeyError):
        resolve_model_name("large-v9")


# --------------------------------------------------------------------- #
# HF converter parity on an asymmetric 128-mel / 51866-vocab config
# --------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def hf_v3_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from wis_tpu.models.whisper.weights import params_from_hf

    cfg = V3_MICRO
    hf_cfg = HFConfig(
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
    torch.manual_seed(3)
    model = WhisperForConditionalGeneration(hf_cfg)
    model.eval()
    tensors = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, params_from_hf(tensors, cfg, dtype=jnp.float32)


def test_v3_encoder_parity(hf_v3_pair):
    import torch

    from wis_tpu.models.whisper.model import encode

    hf_model, params = hf_v3_pair
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 128, 3000)).astype(np.float32)
    with torch.no_grad():
        expected = (
            hf_model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
        )
    got = np.asarray(encode(params, jnp.asarray(mel), V3_MICRO))
    assert got.shape == expected.shape == (1, 1500, 64)
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


def test_v3_decoder_parity(hf_v3_pair):
    import torch

    from wis_tpu.models.whisper.model import (
        DecoderCache,
        cross_kv,
        encode,
        prefill,
    )

    hf_model, params = hf_v3_pair
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 128, 3000)).astype(np.float32)
    prompt = np.asarray([build_prompt("en", "transcribe", layout=V3_LAYOUT)])
    with torch.no_grad():
        expected = (
            hf_model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(prompt),
            )
            .logits.numpy()
        )
    xa = encode(params, jnp.asarray(mel), V3_MICRO)
    xa_kv = cross_kv(params, xa, V3_MICRO)
    cache = DecoderCache.zeros(V3_MICRO, 1, prompt.shape[1], jnp.float32)
    logits, _ = prefill(
        params, jnp.asarray(prompt, jnp.int32), cache, xa_kv, V3_MICRO
    )
    got = np.asarray(logits)
    assert got.shape == expected.shape == (1, prompt.shape[1], 51866)
    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-3)


# --------------------------------------------------------------------- #
# Grammar + engine end-to-end on the v3 layout
# --------------------------------------------------------------------- #
def test_v3_timestamp_grammar_rollout():
    from wis_tpu.decoding.beam import build_generate, trim_tokens

    params = random_params(V3_MICRO, seed=7, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 128, 3000)), jnp.float32)
    prompt = jnp.asarray(
        build_prompt("en", "transcribe", notimestamps=False, layout=V3_LAYOUT),
        jnp.int32,
    )
    gen = build_generate(
        V3_MICRO,
        beam_size=2,
        batch=1,
        max_new_tokens=10,
        prompt_len=3,
        suppress_tokens=(),
        begin_suppress_tokens=(220, EOT),
        with_timestamps=True,
    )
    result = gen(params, mel, prompt, jnp.int32(10))
    k = int(result.best[0])
    toks = trim_tokens(np.asarray(result.tokens[0, k]), int(result.lengths[0, k]))
    assert len(toks) > 0
    # grammar enforced in the *v3* id space
    assert toks[0] >= V3_LAYOUT.timestamp_base
    ts = [t for t in toks if t >= V3_LAYOUT.timestamp_base]
    assert all(a <= b for a, b in zip(ts, ts[1:]))


@pytest.fixture(scope="module")
def v3_engine():
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    WHISPER_CONFIGS["micro-v3"] = V3_MICRO
    try:
        settings = APISettings(
            max_decode_tokens=8,
            batch_buckets=["1"],
            concurrent_gpu_chunks=4,
            warmup_iterations=1,
            whisper_model_default="micro-v3",
        )
        yield WhisperEngine(ModelRegistry(settings), settings)
    finally:
        WHISPER_CONFIGS.pop("micro-v3", None)


def test_engine_v3_transcribe_detect(v3_engine):
    from wis_tpu.languages import check_language

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    res = v3_engine.transcribe(audio, model="micro-v3", detect_language=True)
    assert isinstance(res.text, str)
    # detected index maps through the 100-entry v3 code table
    assert check_language(res.language)


def test_engine_v3_timestamps(v3_engine):
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    res = v3_engine.transcribe(audio, model="micro-v3", timestamps=True)
    assert res.segments is not None
    for seg in res.segments:
        assert 0.0 <= seg["start"] <= seg["end"] <= 30.0


def test_engine_v3_force_yue(v3_engine):
    rng = np.random.default_rng(8)
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    res = v3_engine.transcribe(audio, model="micro-v3", force_language="yue")
    assert res.language == "yue"


def test_engine_v3_coalesced_batch(v3_engine):
    """Concurrent v3-layout requests coalesce into one padded batch with
    per-row prompts built from the v3 special-token layout."""
    from wis_tpu.runtime.batcher import ASRRequest

    rng = np.random.default_rng(9)
    reqs = [
        ASRRequest(
            audio=(rng.standard_normal(16000) * 0.05).astype(np.float32),
            model="micro-v3",
            beam_size=1,
            force_language="yue" if i == 0 else "en",
        )
        for i in range(2)
    ]
    results = v3_engine.transcribe_coalesced(reqs)
    assert results[0].language == "yue"
    assert results[1].language == "en"
    assert all(isinstance(r.text, str) for r in results)
