"""XTTS stack tests: GPT chunked decode, HiFi-GAN vocoder, streaming
orchestration, and the TTS server endpoints (reference xtts/main.py)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from wis_tpu.models.xtts.gpt import GPTConfig
from wis_tpu.models.xtts.hifigan import HiFiGANConfig
from wis_tpu.models.xtts.model import XTTSConfig, XTTSModel
from wis_tpu.server.tts_app import create_tts_app
from wis_tpu.settings import APISettings

MICRO = XTTSConfig(
    gpt=GPTConfig(
        n_layer=2,
        n_head=2,
        d_model=32,
        n_text_vocab=256,
        n_audio_vocab=68,
        max_text_tokens=32,
        max_audio_tokens=40,
        start_audio_token=66,
        stop_audio_token=67,
    ),
    vocoder=HiFiGANConfig(
        in_dim=32,
        cond_dim=16,
        upsample_initial=32,
        upsample_rates=(4, 2),
        upsample_kernels=(8, 4),
        resblock_kernels=(3,),
        resblock_dilations=((1, 3),),
        # micro-scale latent timeline: ×2 interp (16/8) then 22050→24000,
        # same code path as production's ×4 @ 1024/256
        gpt_code_stride=16,
    ),
    text_buckets=(8, 16, 32),
    cond_len=4,
    left_context_frames=2,
)


@pytest.fixture(scope="module")
def model():
    import jax.numpy as jnp

    return XTTSModel(cfg=MICRO, dtype=jnp.float32)


def _voice(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    return model.clone_speaker(audio)


def test_clone_speaker_shapes(model):
    voice = _voice(model)
    lat = np.asarray(voice["gpt_cond_latent"])
    emb = np.asarray(voice["speaker_embedding"])
    assert lat.shape == (MICRO.cond_len, MICRO.gpt.d_model)
    assert emb.shape == (MICRO.vocoder.cond_dim,)
    assert np.isfinite(lat).all() and np.isfinite(emb).all()


def test_inference_stream_yields_audio(model):
    voice = _voice(model)
    chunks = list(
        model.inference_stream(
            "hello world",
            "en",
            np.asarray(voice["gpt_cond_latent"], np.float32),
            np.asarray(voice["speaker_embedding"], np.float32),
            stream_chunk_size=8,
            overlap_wav_len=16,
            do_sample=False,
        )
    )
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert total.shape[0] > 0
    assert np.isfinite(total).all()
    assert np.abs(total).max() <= 1.0  # tanh output


def test_min_audio_tokens_floor(model):
    """min_audio_tokens masks the stop token until the floor is reached:
    the stream must emit at least that many tokens' worth of samples
    (the bench protocol's analog of the ASR rows' token budgets)."""
    voice = _voice(model)
    lat = np.asarray(voice["gpt_cond_latent"], np.float32)
    emb = np.asarray(voice["speaker_embedding"], np.float32)
    voc = MICRO.vocoder
    floor = 24
    kw = dict(stream_chunk_size=8, overlap_wav_len=0, do_sample=False)
    total = model.synthesize(
        "hi", "en", lat, emb, min_audio_tokens=floor, **kw
    )
    # emission is exact-aggregate: n tokens → floor(n·stride·out/in) samples
    floor_samples = floor * voc.gpt_code_stride * voc.sample_rate \
        // voc.input_sample_rate
    assert total.shape[0] >= floor_samples
    # floor 0 is inert: identical call without the floor is a prefix run
    base = model.synthesize("hi", "en", lat, emb, **kw)
    assert base.shape[0] <= total.shape[0]


def test_tokenize_runs_cleaner_pipeline(model):
    """tokenize() feeds the Coqui-contract cleaner output (textnorm) to
    the BPE: a raw sentence and its hand-cleaned form encode identically,
    and the [lang] tag rides in front."""
    a = model.tokenize("Pay $5, Dr. Lee!", "en")
    b = model.tokenize("pay five dollars, doctor lee!", "en")
    assert np.array_equal(a, b)
    assert not np.array_equal(
        model.tokenize("hello", "en"), model.tokenize("hello", "de")
    )


def test_streaming_equals_chunked_emission(model):
    """Greedy decode is deterministic → same total output across runs."""
    voice = _voice(model)
    kw = dict(
        stream_chunk_size=8,
        overlap_wav_len=0,
        do_sample=False,
    )
    lat = np.asarray(voice["gpt_cond_latent"], np.float32)
    emb = np.asarray(voice["speaker_embedding"], np.float32)
    a = model.synthesize("same text", "en", lat, emb, **kw)
    b = model.synthesize("same text", "en", lat, emb, **kw)
    np.testing.assert_allclose(a, b)


def test_sampling_params_change_output(model):
    voice = _voice(model)
    lat = np.asarray(voice["gpt_cond_latent"], np.float32)
    emb = np.asarray(voice["speaker_embedding"], np.float32)
    a = model.synthesize(
        "text", "en", lat, emb, do_sample=True, temperature=1.0, seed=1,
        stream_chunk_size=8, overlap_wav_len=0,
    )
    b = model.synthesize(
        "text", "en", lat, emb, do_sample=True, temperature=1.0, seed=2,
        stream_chunk_size=8, overlap_wav_len=0,
    )
    assert a.shape != b.shape or not np.allclose(a, b)


# --------------------------------------------------------------------------- #
# Server endpoints
# --------------------------------------------------------------------------- #
def _run_tts(model, tmp_path, coro_factory):
    async def runner():
        settings = APISettings(xtts_speaker_dir=str(tmp_path))
        app = create_tts_app(settings=settings, model=model)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await coro_factory(client)
        finally:
            await client.close()

    return asyncio.run(runner())


def _wav_upload_bytes():
    import io
    import wave

    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(16000) * 0.1 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_clone_speaker_endpoint(model, tmp_path):
    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("wav_file", _wav_upload_bytes(), filename="v.wav")
        resp = await client.post("/clone_speaker", data=form)
        assert resp.status == 200
        data = await resp.json()
        assert "gpt_cond_latent" in data and "speaker_embedding" in data

    _run_tts(model, tmp_path, go)


def test_enroll_and_stream_tts(model, tmp_path):
    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("wav_file", _wav_upload_bytes(), filename="v.wav")
        resp = await client.post("/api/tts?speaker=default", data=form)
        assert resp.status == 200

        resp = await client.get("/api/tts/speakers")
        assert (await resp.json())["speakers"] == ["default"]

        resp = await client.get(
            "/api/tts?text=hello&language=en&speaker=default"
            "&stream_chunk_size=8&do_sample=false"
        )
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "audio/wav"
        body = await resp.read()
        assert body[:4] == b"RIFF"
        assert len(body) > 44  # header + audio payload

    _run_tts(model, tmp_path, go)


def test_tts_invalid_language(model, tmp_path):
    async def go(client):
        resp = await client.get("/api/tts?text=hi&language=xx")
        assert resp.status == 400

    _run_tts(model, tmp_path, go)


def test_tts_stream_post_missing_latents(model, tmp_path):
    async def go(client):
        resp = await client.post(
            "/tts_stream", json={"text": "hi", "language": "en"}
        )
        assert resp.status == 400

    _run_tts(model, tmp_path, go)


def test_int8_gpt_decode_streams_audio(model):
    """quant='int8' (the default, mirroring the whisper decoder) streams
    valid audio; quant='none' keeps full-precision weights and the two
    stay deterministic within themselves."""
    import jax.numpy as jnp

    from wis_tpu.ops.quant import is_quantized

    assert is_quantized(model.gpt_params["blocks"]["q_w"])  # default int8
    fp = XTTSModel(cfg=MICRO, dtype=jnp.float32, quant="none")
    assert not is_quantized(fp.gpt_params["blocks"]["q_w"])
    voice = _voice(model)
    lat = np.asarray(voice["gpt_cond_latent"], np.float32)
    emb = np.asarray(voice["speaker_embedding"], np.float32)
    kw = dict(stream_chunk_size=8, overlap_wav_len=0, do_sample=False)
    a = fp.synthesize("hello", "en", lat, emb, **kw)
    assert a.shape[0] > 0 and np.isfinite(a).all()
    b = fp.synthesize("hello", "en", lat, emb, **kw)
    np.testing.assert_allclose(a, b)


def test_decode_to_position_cap_stays_finite(model):
    """Force generation all the way to max_audio_tokens: the final
    token's position index reaches the embedding-table edge, which used
    to hit jnp.take's fill-with-NaN default and poison the last chunk
    (regression: now clip + Coqui's +2 headroom rows)."""
    voice = _voice(model)
    total = model.synthesize(
        "cap", "en",
        np.asarray(voice["gpt_cond_latent"], np.float32),
        np.asarray(voice["speaker_embedding"], np.float32),
        stream_chunk_size=8, overlap_wav_len=0, do_sample=False,
        min_audio_tokens=MICRO.gpt.max_audio_tokens,
    )
    voc = MICRO.vocoder
    cap_samples = MICRO.gpt.max_audio_tokens * voc.gpt_code_stride \
        * voc.sample_rate // voc.input_sample_rate
    assert total.shape[0] == cap_samples
    assert np.isfinite(total).all()


def test_text_splitting(model):
    from wis_tpu.models.xtts.model import split_sentences

    assert split_sentences("One. Two! Three?") == ["One.", "Two!", "Three?"]
    voice = _voice(model)
    lat = np.asarray(voice["gpt_cond_latent"], np.float32)
    emb = np.asarray(voice["speaker_embedding"], np.float32)
    chunks = list(
        model.inference_stream_split(
            "Hi. Bye.", "en", lat, emb,
            enable_text_splitting=True,
            stream_chunk_size=8, overlap_wav_len=0, do_sample=False,
        )
    )
    assert len(chunks) >= 2  # at least one chunk per sentence
