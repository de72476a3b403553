"""HTTP API parity tests (reference main.py:1035-1377 endpoint surface)."""

import asyncio
import io
import json
import wave

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from wis_tpu.audio.mel import SAMPLE_RATE
from wis_tpu.runtime.engine import WhisperEngine
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.server.app import create_app
from wis_tpu.settings import APISettings


def _settings(**kw):
    base = dict(
        max_decode_tokens=6,
        batch_buckets=["1", "2", "4"],
        batch_window_s=0.01,
        whisper_model_default="tiny",
    )
    base.update(kw)
    return APISettings(**base)


@pytest.fixture(scope="module")
def engine():
    s = _settings()
    return WhisperEngine(ModelRegistry(s), s)


def _wav_bytes(seconds=1.0, seed=0) -> bytes:
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(seconds * SAMPLE_RATE)) * 0.05).astype(
        np.float32
    )
    ints = (pcm * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SAMPLE_RATE)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def _run(engine, coro_factory, **app_kw):
    async def runner():
        app = create_app(
            settings=app_kw.pop("settings", engine.settings), engine=engine, **app_kw
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await coro_factory(client)
        finally:
            await client.close()

    return asyncio.run(runner())


def test_ping(engine):
    async def go(client):
        resp = await client.get("/api/ping")
        assert resp.status == 200
        assert await resp.json() == {"message": "pong"}

    _run(engine, go)


def test_asr_multipart_wav(engine):
    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("audio_file", _wav_bytes(), filename="a.wav",
                       content_type="audio/wav")
        resp = await client.post("/api/asr?model=tiny&beam_size=1", data=form)
        assert resp.status == 200
        data = await resp.json()
        assert set(data) >= {
            "infer_time",
            "infer_speedup",
            "audio_duration",
            "language",
            "text",
        }
        assert data["audio_duration"] == 1000
        assert data["language"] == "en"

    _run(engine, go)


def test_asr_flac_fixture(engine, flac_fixture_3s):
    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("audio_file", flac_fixture_3s.read_bytes(),
                       filename="3sec.flac", content_type="audio/flac")
        resp = await client.post("/api/asr?model=tiny&beam_size=1", data=form)
        assert resp.status == 200
        data = await resp.json()
        assert data["audio_duration"] == 3840

    _run(engine, go)


def test_asr_word_timestamps(engine):
    """?word_timestamps=true returns per-word timing dicts (the CT2
    capability the reference server never exposes)."""
    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("audio_file", _wav_bytes(), filename="a.wav",
                       content_type="audio/wav")
        resp = await client.post(
            "/api/asr?model=tiny&beam_size=1&word_timestamps=true", data=form
        )
        assert resp.status == 200
        data = await resp.json()
        assert "words" in data
        for w in data["words"]:
            assert set(w) == {"word", "start", "end", "probability"}
            assert w["end"] >= w["start"] >= 0.0

    _run(engine, go)


def test_asr_invalid_force_language(engine):
    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("audio_file", _wav_bytes(), filename="a.wav")
        resp = await client.post("/api/asr?force_language=xx", data=form)
        assert resp.status == 400
        assert (await resp.json()) == {"error": "Invalid force_language"}

    _run(engine, go)


def test_asr_v3_only_language_on_v2_model(engine):
    """`yue` is representable only in the large-v3-family vocabulary;
    forcing it on a v2-layout model must 400, not silently transcribe in
    English while reporting language=yue (ADVICE r2)."""

    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("audio_file", _wav_bytes(), filename="a.wav")
        resp = await client.post(
            "/api/asr?model=tiny&force_language=yue", data=form
        )
        assert resp.status == 400
        body = await resp.json()
        assert "large-v3" in body["error"]

    _run(engine, go)


def test_engine_rejects_v3_language_on_v2_layout(engine):
    from wis_tpu.runtime.engine import UnsupportedLanguageError

    audio = np.zeros(SAMPLE_RATE // 2, np.float32)
    with pytest.raises(UnsupportedLanguageError):
        engine.transcribe(audio, model="tiny", beam_size=1,
                          force_language="yue", max_tokens=2)


def test_asr_invalid_audio(engine):
    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("audio_file", b"not audio at all", filename="a.bin")
        resp = await client.post("/api/asr", data=form)
        assert resp.status == 400
        assert (await resp.json()) == {"error": "Invalid audio"}

    _run(engine, go)


def test_willow_pcm_stream(engine):
    async def go(client):
        rng = np.random.default_rng(3)
        pcm = (rng.standard_normal(SAMPLE_RATE) * 0.05 * 32767).astype("<i2")
        resp = await client.post(
            "/api/willow?model=tiny",
            data=pcm.tobytes(),
            headers={
                "x-audio-sample-rate": "16000",
                "x-audio-bits": "16",
                "x-audio-channel": "1",
                "x-audio-codec": "pcm",
                "x-willow-id": "test-device",
            },
        )
        assert resp.status == 200
        data = await resp.json()
        # without stats=True only language+text (reference main.py:1373)
        assert set(data) == {"language", "text"}

    _run(engine, go)


def test_willow_wav_with_stats(engine):
    async def go(client):
        resp = await client.post(
            "/api/willow?model=tiny&stats=true",
            data=_wav_bytes(seed=4),
            headers={"x-audio-codec": "wav"},
        )
        assert resp.status == 200
        data = await resp.json()
        assert set(data) >= {"infer_time", "language", "text"}

    _run(engine, go)


def test_willow_invalid_audio(engine):
    async def go(client):
        resp = await client.post(
            "/api/willow", data=b"garbage", headers={"x-audio-codec": "wav"}
        )
        assert resp.status == 400

    _run(engine, go)


def test_ws_session_protocol(engine):
    async def go(client):
        ws = await client.ws_connect("/api/ws/asr?model=tiny")
        await ws.send_str(json.dumps({"type": "ping"}))
        pong = json.loads((await ws.receive_str()))
        assert pong["type"] == "pong"

        await ws.send_str(json.dumps({"type": "start", "obj": {"sample_rate": 16000}}))
        started = json.loads(await ws.receive_str())
        assert started["type"] == "log"

        rng = np.random.default_rng(5)
        pcm = (rng.standard_normal(SAMPLE_RATE // 2) * 0.05 * 32767).astype("<i2")
        await ws.send_bytes(pcm.tobytes())

        await ws.send_str(
            json.dumps({"type": "stop", "obj": {"model": "tiny", "beam_size": 1}})
        )
        infer = json.loads(await ws.receive_str())
        assert infer["type"] == "infer"
        assert "text" in infer["obj"]
        log = json.loads(await ws.receive_str())
        assert log["type"] == "log"
        await ws.close()

    _run(engine, go)


def test_rtc_unavailable_gives_501(engine):
    async def go(client):
        resp = await client.post(
            "/api/rtc/asr", json={"sdp": "v=0", "type": "offer"}
        )
        assert resp.status in (200, 501)  # 501 without aiortc

    _run(engine, go)


def test_openapi_and_docs(engine):
    async def go(client):
        resp = await client.get("/api/openapi.json")
        assert resp.status == 200
        doc = await resp.json()
        assert "/api/asr" in doc["paths"]
        resp = await client.get("/api/docs")
        assert resp.status == 200

    _run(engine, go)


def test_basic_auth(engine):
    import base64

    s = _settings(basic_auth_user="u", basic_auth_pass="p")

    async def go(client):
        resp = await client.get("/api/ping")
        assert resp.status == 401
        token = base64.b64encode(b"u:p").decode()
        resp = await client.get(
            "/api/ping", headers={"Authorization": f"Basic {token}"}
        )
        assert resp.status == 200

    _run(engine, go, settings=s)


def test_sv_disabled_gives_501(engine):
    async def go(client):
        resp = await client.post("/api/sv", data=_wav_bytes())
        assert resp.status == 501
        resp = await client.post(
            "/api/willow?voice_auth=true",
            data=_wav_bytes(),
            headers={"x-audio-codec": "wav"},
        )
        assert resp.status == 501

    _run(engine, go)


def test_status_endpoint(engine):
    async def go(client):
        resp = await client.get("/api/status")
        assert resp.status == 200
        data = await resp.json()
        assert set(data) >= {
            "devices",
            "models_loaded",
            "hbm_resident_bytes",
            "hbm_budget_bytes",
            "queue_depth",
            "compiled_programs",
        }

    _run(engine, go)


def test_willow_mp3_and_ogg_end_to_end(engine):
    """The reference accepts anything FFmpeg can decode through
    /api/willow (main.py:108-120, 1296-1314); mp3 and ogg uploads must
    transcribe end-to-end here too (system codec libs via sysdec.cc)."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    import fixture_codecs as fx

    if not (fx.lame_available() and fx.vorbis_available()):
        pytest.skip("system codec libraries unavailable")

    t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
    tone = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)

    async def go(client):
        for body, codec in [
            (fx.encode_mp3(tone), "mp3"),
            (fx.encode_ogg_vorbis(tone), "ogg"),
        ]:
            resp = await client.post(
                "/api/willow?model=tiny",
                data=body,
                headers={"x-audio-codec": codec},
            )
            assert resp.status == 200, (codec, await resp.text())
            data = await resp.json()
            assert set(data) == {"language", "text"}

    _run(engine, go)


def test_asr_multipart_mp3(engine):
    """mp3 upload through the multipart /api/asr endpoint."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    import fixture_codecs as fx

    if not fx.lame_available():
        pytest.skip("libmp3lame unavailable")

    t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
    tone = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)

    async def go(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("audio_file", fx.encode_mp3(tone), filename="a.mp3")
        resp = await client.post("/api/asr?model=tiny", data=form)
        assert resp.status == 200
        data = await resp.json()
        assert {"language", "text", "infer_time"} <= set(data)

    _run(engine, go)
