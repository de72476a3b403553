"""Unit tests for the session protocol + timing utilities (no device)."""

import asyncio
import json
import time

import numpy as np
import pytest

from wis_tpu.server.session import DataChannelMessage, StreamingSession
from wis_tpu.settings import APISettings
from wis_tpu.utils.timing import StageTimer


def test_datachannel_message_parse():
    m = DataChannelMessage.parse('{"type": "ping"}')
    assert m.type == "ping" and m.obj == {}
    m = DataChannelMessage.parse('{"type": "stop", "obj": {"model": "tiny"}}')
    assert m.obj["model"] == "tiny"
    with pytest.raises(ValueError):
        DataChannelMessage.parse('{"no_type": 1}')
    with pytest.raises(json.JSONDecodeError):
        DataChannelMessage.parse("not json")
    # non-dict obj is tolerated (reference accepts loose payloads)
    m = DataChannelMessage.parse('{"type": "ping", "obj": 5}')
    assert m.obj == {}


def test_session_rejects_stop_before_start():
    session = StreamingSession(executor=None, settings=APISettings())

    async def go():
        out = await session.handle(DataChannelMessage("stop", {}))
        assert json.loads(out[0])["type"] == "error"
        out = await session.handle(DataChannelMessage("bogus", {}))
        assert json.loads(out[0])["type"] == "error"
        out = await session.handle(DataChannelMessage("ping", {"x": 1}))
        assert json.loads(out[0]) == {"type": "pong", "obj": {"x": 1}}

    asyncio.run(go())


def test_session_ignores_audio_when_not_recording():
    session = StreamingSession(executor=None, settings=APISettings())
    session.feed_pcm(b"\x00\x00" * 100)
    assert session._chunks == []


def test_session_empty_stop_errors():
    session = StreamingSession(executor=None, settings=APISettings())

    async def go():
        await session.handle(DataChannelMessage("start", {}))
        out = await session.handle(DataChannelMessage("stop", {}))
        assert json.loads(out[0])["type"] == "error"  # no audio received

    asyncio.run(go())


def test_stage_timer_spans():
    t = StageTimer()
    with t.span("a"):
        time.sleep(0.01)
    with t.span("b"):
        pass
    d = t.as_dict()
    assert set(d) == {"a", "b"}
    assert d["a"] >= 10.0
    assert t.total_ms() >= d["a"]


def test_num_chunks_matches_iteration():
    from wis_tpu.audio.chunking import chunk_iter, num_chunks
    from wis_tpu.audio.mel import SAMPLE_RATE

    for seconds in (5, 30, 31, 45, 100):
        n = seconds * SAMPLE_RATE
        audio = np.zeros(n, np.float32)
        assert num_chunks(n) == len(list(chunk_iter(audio)))


def test_session_stop_with_bad_override_keeps_socket():
    """A v3-only language forced on a v2-layout model (or an unknown
    model) must error THIS utterance, not raise through the WS loop."""
    import asyncio

    import numpy as np

    from wis_tpu.runtime.batcher import InferenceExecutor
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.server.session import DataChannelMessage, StreamingSession
    from wis_tpu.settings import APISettings

    s = APISettings(max_decode_tokens=2, whisper_model_default="tiny",
                    batch_window_s=0.01)
    executor = InferenceExecutor(WhisperEngine(ModelRegistry(s), s), s)
    executor.start()
    try:
        session = StreamingSession(executor, s)

        async def go():
            await session.handle(DataChannelMessage("start", {}))
            pcm = (np.zeros(8000, np.float32) * 32767).astype("<i2")
            session.feed_pcm(pcm.tobytes())
            return await session.handle(
                DataChannelMessage(
                    "stop", {"model": "tiny", "force_language": "yue"}
                )
            )

        responses = asyncio.run(go())
        assert len(responses) == 1
        import json as _json

        parsed = _json.loads(responses[0])
        assert parsed["type"] == "error"
        assert "large-v3" in parsed["obj"]["msg"]
    finally:
        executor.shutdown()
