"""Server-side VAD tests: endpointing on synthetic speech/silence, and the
VAD-gated WS session flow (BASELINE.json config #5)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from wis_tpu.audio.mel import SAMPLE_RATE
from wis_tpu.audio.vad import EnergyVAD, VADConfig


def _speech(ms, amp=0.3, seed=0):
    rng = np.random.default_rng(seed)
    n = SAMPLE_RATE * ms // 1000
    t = np.arange(n) / SAMPLE_RATE
    return (amp * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


def _silence(ms, amp=0.001, seed=1):
    rng = np.random.default_rng(seed)
    n = SAMPLE_RATE * ms // 1000
    return (amp * rng.standard_normal(n)).astype(np.float32)


def test_vad_detects_end_of_utterance():
    vad = EnergyVAD(VADConfig(silence_ms=300, min_speech_ms=100))
    vad.feed(_silence(200))
    assert not vad.utterance_ended
    vad.feed(_speech(400))
    assert vad.in_speech and not vad.utterance_ended
    vad.feed(_silence(400))
    assert vad.utterance_ended


def test_vad_ignores_short_blips():
    vad = EnergyVAD(VADConfig(silence_ms=300, min_speech_ms=200))
    vad.feed(_speech(60))  # below min_speech
    vad.feed(_silence(500))
    assert not vad.utterance_ended


def test_vad_reset():
    vad = EnergyVAD(VADConfig(silence_ms=200, min_speech_ms=100))
    vad.feed(_speech(300))
    vad.feed(_silence(300))
    assert vad.utterance_ended
    vad.reset()
    assert not vad.utterance_ended and not vad.in_speech


def test_ws_vad_gated_session():
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.server.app import create_app
    from wis_tpu.settings import APISettings

    s = APISettings(
        max_decode_tokens=4,
        whisper_model_default="tiny",
        batch_window_s=0.01,
    )
    engine = WhisperEngine(ModelRegistry(s), s)

    async def go():
        app = create_app(settings=s, engine=engine)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            ws = await client.ws_connect("/api/ws/asr?model=tiny")
            await ws.send_str(
                json.dumps({"type": "start", "obj": {"vad": True}})
            )
            await ws.receive_str()  # log: recording started
            pcm = np.concatenate([_speech(500), _silence(900)])
            ints = (np.clip(pcm, -1, 1) * 32767).astype("<i2")
            # stream in small chunks like a device would
            step = SAMPLE_RATE // 10
            for i in range(0, len(ints), step):
                await ws.send_bytes(ints[i : i + step].tobytes())
            # VAD fires mid-stream: expect log(vad) + infer + log
            msgs = []
            for _ in range(3):
                msgs.append(json.loads(await ws.receive_str()))
            types = [m["type"] for m in msgs]
            assert "infer" in types
            assert any(
                m["type"] == "log" and "vad" in m["obj"]["msg"] for m in msgs
            )
            await ws.close()
        finally:
            await client.close()

    asyncio.run(go())
