"""Test double for aiortc (not installed in CI): just enough surface for
wis_tpu.server.rtc — RTCPeerConnection with decorator-style event
registration, SDP descriptions, the RTCP receiver hook the BYE patch
wraps, and an av-like audio frame/track pair."""

from __future__ import annotations

import asyncio
import sys
import types

import numpy as np


class RTCSessionDescription:
    def __init__(self, sdp, type):
        self.sdp = sdp
        self.type = type


class FakeDataChannel:
    def __init__(self):
        self.handlers = {}
        self.sent = []

    def on(self, event):
        def register(fn):
            self.handlers[event] = fn
            return fn

        return register

    def send(self, data):
        self.sent.append(data)

    async def deliver(self, raw, timeout=180.0):
        """Simulate an incoming datachannel message and drain the tasks
        the handler spawns (inference may compile on first use)."""
        before = len(self.sent)
        self.handlers["message"](raw)
        # every protocol message produces at least one response; the
        # recorder task legitimately stays pending, so completion is
        # signaled by output, not by task drain
        waited = 0.0
        while len(self.sent) == before and waited < timeout:
            await asyncio.sleep(0.05)
            waited += 0.05


class FakeAudioFrame:
    """Mimics av.AudioFrame as aiortc delivers it."""

    def __init__(self, pcm: np.ndarray, sample_rate: int = 48000):
        self._pcm = pcm
        self.sample_rate = sample_rate

    def to_ndarray(self):
        return (np.clip(self._pcm, -1, 1) * 32767).astype(np.int16)[None, :]


class FakeAudioTrack:
    kind = "audio"

    def __init__(self):
        self._queue: asyncio.Queue = asyncio.Queue()

    def push(self, frame):
        self._queue.put_nowait(frame)

    async def recv(self):
        return await self._queue.get()


class RTCPeerConnection:
    instances = []

    def __init__(self):
        self.handlers = {}
        self.connectionState = "new"
        self.localDescription = None
        self.closed = False
        RTCPeerConnection.instances.append(self)

    def on(self, event):
        def register(fn):
            self.handlers[event] = fn
            return fn

        return register

    async def setRemoteDescription(self, desc):
        self.remoteDescription = desc

    async def createAnswer(self):
        return RTCSessionDescription(sdp="v=0 fake-answer", type="answer")

    async def setLocalDescription(self, desc):
        self.localDescription = desc

    async def close(self):
        self.closed = True
        self.connectionState = "closed"

    # test helpers ------------------------------------------------------ #
    def emit_track(self, track):
        self.handlers["track"](track)

    def emit_datachannel(self, channel):
        self.handlers["datachannel"](channel)

    async def emit_state(self, state):
        self.connectionState = state
        await self.handlers["connectionstatechange"]()


class RtcpByePacket:
    pass


class RTCRtpReceiver:
    handled = []

    async def _handle_rtcp_packet(self, packet):
        RTCRtpReceiver.handled.append(packet)
        return "original-handled"


def install():
    """Install the fake aiortc module tree into sys.modules."""
    aiortc = types.ModuleType("aiortc")
    aiortc.RTCPeerConnection = RTCPeerConnection
    aiortc.RTCSessionDescription = RTCSessionDescription

    rtp = types.ModuleType("aiortc.rtp")
    rtp.RtcpByePacket = RtcpByePacket
    aiortc.rtp = rtp

    receiver_mod = types.ModuleType("aiortc.rtcrtpreceiver")
    receiver_mod.RTCRtpReceiver = RTCRtpReceiver
    aiortc.rtcrtpreceiver = receiver_mod

    sys.modules["aiortc"] = aiortc
    sys.modules["aiortc.rtp"] = rtp
    sys.modules["aiortc.rtcrtpreceiver"] = receiver_mod
    # force a fresh import of the module under test against the fake
    sys.modules.pop("wis_tpu.server.rtc", None)
    return aiortc
