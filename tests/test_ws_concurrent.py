"""Concurrent streaming sessions — the load profile of BASELINE.json
config #5 (concurrent WebRTC sessions, jmeter-asr.jmx): several WS
sessions stream and stop simultaneously; the dynamic batcher coalesces
their inferences."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from wis_tpu.audio.mel import SAMPLE_RATE
from wis_tpu.runtime.engine import WhisperEngine
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.server.app import create_app
from wis_tpu.settings import APISettings


@pytest.fixture(scope="module")
def engine():
    s = APISettings(
        max_decode_tokens=4,
        batch_buckets=["1", "2", "4"],
        batch_window_s=0.05,
        whisper_model_default="tiny",
    )
    return WhisperEngine(ModelRegistry(s), s)


def test_concurrent_ws_sessions(engine):
    async def one_session(client, seed):
        ws = await client.ws_connect("/api/ws/asr?model=tiny")
        await ws.send_str(json.dumps({"type": "start", "obj": {"sample_rate": 16000}}))
        await ws.receive_str()  # log
        rng = np.random.default_rng(seed)
        pcm = (rng.standard_normal(SAMPLE_RATE // 2) * 0.05 * 32767).astype("<i2")
        await ws.send_bytes(pcm.tobytes())
        await ws.send_str(json.dumps({"type": "stop", "obj": {"beam_size": 1}}))
        infer = json.loads(await ws.receive_str())
        await ws.close()
        assert infer["type"] == "infer"
        return infer["obj"]["text"]

    async def go():
        app = create_app(settings=engine.settings, engine=engine)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            texts = await asyncio.gather(*(one_session(client, i) for i in range(4)))
            assert len(texts) == 4
        finally:
            await client.close()

    asyncio.run(go())
