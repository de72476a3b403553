"""WebRTC session-layer tests against a fake aiortc (reference
main.py:123-184, 894-1032). Covers: offer/answer through the real
/api/rtc/asr endpoint, the datachannel ping/start/stop protocol with a
recorded track, per-request overrides from the stop message, the
RTCP-BYE keepalive patch, and the media recorder's resample path."""

import asyncio
import json
import os
import sys

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fake_aiortc  # noqa: E402

fake_aiortc.install()

from wis_tpu.audio.mel import SAMPLE_RATE  # noqa: E402
from wis_tpu.runtime.engine import WhisperEngine  # noqa: E402
from wis_tpu.runtime.residency import ModelRegistry  # noqa: E402
from wis_tpu.server.app import create_app  # noqa: E402
from wis_tpu.settings import APISettings  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    s = APISettings(
        max_decode_tokens=6,
        batch_buckets=["1", "2"],
        batch_window_s=0.01,
        whisper_model_default="tiny",
    )
    return WhisperEngine(ModelRegistry(s), s)


def _run(engine, coro_factory):
    async def runner():
        fake_aiortc.RTCPeerConnection.instances.clear()
        app = create_app(settings=engine.settings, engine=engine)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await coro_factory(client)
        finally:
            await client.close()

    return asyncio.run(runner())


def _offer_body():
    return {"sdp": "v=0 fake-offer", "type": "offer"}


def test_offer_answer(engine):
    async def go(client):
        resp = await client.post("/api/rtc/asr", json=_offer_body())
        assert resp.status == 200
        data = await resp.json()
        assert data["type"] == "answer"
        assert "fake-answer" in data["sdp"]

    _run(engine, go)


def test_datachannel_full_session(engine):
    """ping → pong; start → recording; frames arrive on the track at
    48 kHz; stop with per-request obj → infer + log responses."""

    async def go(client):
        resp = await client.post("/api/rtc/asr", json=_offer_body())
        assert resp.status == 200
        pc = fake_aiortc.RTCPeerConnection.instances[-1]

        track = fake_aiortc.FakeAudioTrack()
        chan = fake_aiortc.FakeDataChannel()
        pc.emit_track(track)
        pc.emit_datachannel(chan)

        await chan.deliver(json.dumps({"type": "ping"}))
        assert any(json.loads(m)["type"] == "pong" for m in chan.sent)

        await chan.deliver(json.dumps({"type": "start"}))
        # one second of 48 kHz noise in 20 ms frames
        rng = np.random.default_rng(0)
        for i in range(50):
            track.push(
                fake_aiortc.FakeAudioFrame(
                    (rng.standard_normal(960) * 0.05).astype(np.float32),
                    sample_rate=48000,
                )
            )
        await asyncio.sleep(0.2)  # let the recorder task drain the queue

        await chan.deliver(
            json.dumps(
                {"type": "stop", "obj": {"model": "tiny", "beam_size": 1}}
            )
        )
        types = [json.loads(m)["type"] for m in chan.sent]
        assert "infer" in types, types
        infer = next(
            json.loads(m)["obj"] for m in chan.sent
            if json.loads(m)["type"] == "infer"
        )
        assert "text" in infer
        # ~1 s of audio at 48 kHz resampled to 16 kHz
        assert 900 <= infer.get("audio_duration", 0) <= 1100

    _run(engine, go)


def test_bad_message_yields_error(engine):
    async def go(client):
        await client.post("/api/rtc/asr", json=_offer_body())
        pc = fake_aiortc.RTCPeerConnection.instances[-1]
        chan = fake_aiortc.FakeDataChannel()
        pc.emit_datachannel(chan)
        await chan.deliver("this is not json")
        assert any(json.loads(m)["type"] == "error" for m in chan.sent)

    _run(engine, go)


def test_connection_cleanup(engine):
    async def go(client):
        await client.post("/api/rtc/asr", json=_offer_body())
        from wis_tpu.server import rtc

        pc = fake_aiortc.RTCPeerConnection.instances[-1]
        assert pc in rtc._pcs
        await pc.emit_state("failed")
        assert pc.closed
        assert pc not in rtc._pcs

    _run(engine, go)


def test_rtcp_bye_patch(engine):
    """The reference's monkey-patch (main.py:123-135): BYE packets are
    swallowed so replaceTrack(null) idle pauses don't kill the session;
    other RTCP packets still reach the original handler."""

    async def go(client):
        await client.post("/api/rtc/asr", json=_offer_body())  # applies patch
        from aiortc import rtp
        from aiortc.rtcrtpreceiver import RTCRtpReceiver

        recv = RTCRtpReceiver()
        RTCRtpReceiver.handled.clear()
        out = await RTCRtpReceiver._handle_rtcp_packet(recv, rtp.RtcpByePacket())
        assert out is None  # swallowed
        assert RTCRtpReceiver.handled == []

        class OtherPacket:
            pass

        out = await RTCRtpReceiver._handle_rtcp_packet(recv, OtherPacket())
        assert out == "original-handled"
        assert len(RTCRtpReceiver.handled) == 1

    _run(engine, go)


def test_media_recorder_resamples():
    from wis_tpu.server.media import MediaRecorderLite

    rec = MediaRecorderLite()
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(48000) / 48000)).astype(
        np.float32
    )
    for i in range(0, 48000, 960):
        rec.add_frame(fake_aiortc.FakeAudioFrame(tone[i : i + 960], 48000))
    audio = rec.stop()
    assert abs(audio.shape[0] - SAMPLE_RATE) < 10
    freq = np.fft.rfftfreq(len(audio), 1 / SAMPLE_RATE)[
        np.argmax(np.abs(np.fft.rfft(audio)))
    ]
    assert abs(freq - 440.0) < 2.0
