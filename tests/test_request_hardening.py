"""Request→program-surface hardening (VERDICT r4 #3/#4/#7/#8).

On TPU every (beam, batch, decode-length, …) tuple is a COMPILE key: the
reference tolerates arbitrary per-request values because CT2 has no
compile step (reference main.py:1174-1182), but here an unvalidated
`?beam_size=40` would hold the inference thread through a multi-minute
XLA compile — so request-supplied compile keys are bucket-validated at
the endpoint AND in the engine, the program cache is LRU-bounded, and
speaker names (which become store filenames, reference xtts/main.py:
347-353) are charset-restricted before any file I/O.
"""

import asyncio
import io
import wave

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from wis_tpu.audio.mel import SAMPLE_RATE
from wis_tpu.runtime.engine import WhisperEngine
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.server.app import create_app
from wis_tpu.server.sv import SpeakerVerifier, valid_speaker_name
from wis_tpu.server.tts_app import SpeakerStore
from wis_tpu.settings import APISettings


def _settings(**kw):
    base = dict(
        max_decode_tokens=6,
        decode_token_buckets=["8"],
        batch_buckets=["1", "2"],
        batch_window_s=0.01,
        whisper_model_default="tiny",
    )
    base.update(kw)
    return APISettings(**base)


@pytest.fixture(scope="module")
def engine():
    s = _settings()
    return WhisperEngine(ModelRegistry(s), s)


def _wav_bytes(seconds=0.5, seed=0) -> bytes:
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
            settings=app_kw.pop("settings", engine.settings),
            engine=engine,
            **app_kw,
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await coro_factory(client)
        finally:
            await client.close()

    return asyncio.run(runner())


def _asr_form():
    import aiohttp

    form = aiohttp.FormData()
    form.add_field("audio_file", _wav_bytes(), filename="a.wav",
                   content_type="audio/wav")
    return form


# --------------------------------------------------------------------------- #
# Beam-size bucket validation
# --------------------------------------------------------------------------- #
def test_beam_bucket_rounds_up_and_rejects():
    s = _settings()
    assert s.beam_bucket(1) == 1
    assert s.beam_bucket(2) == 2
    assert s.beam_bucket(4) == 5  # rounds UP to the nearest bucket
    assert s.beam_bucket(5) == 5
    for bad in (0, -1, 6, 40, 10_000):
        with pytest.raises(ValueError):
            s.beam_bucket(bad)


def test_engine_rejects_oversize_beam(engine):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(SAMPLE_RATE) * 0.05).astype(np.float32)
    keys = set(engine._programs)
    with pytest.raises(ValueError):
        engine.transcribe(audio, model="tiny", beam_size=40)
    with pytest.raises(ValueError):
        engine.steady_state_latency(audio, model="tiny", beam_size=40)
    assert set(engine._programs) == keys  # nothing compiled


def test_asr_endpoint_rejects_oversize_beam(engine):
    """?beam_size=40 → 400 with NO compile (the remote-compile DoS)."""
    keys = set(engine._programs)

    async def go(client):
        resp = await client.post("/api/asr?beam_size=40", data=_asr_form())
        assert resp.status == 400
        body = await resp.json()
        assert "beam" in body["error"]

    _run(engine, go)
    assert set(engine._programs) == keys


def test_willow_endpoint_rejects_oversize_beam(engine):
    async def go(client):
        resp = await client.post(
            "/api/willow?beam_size=99",
            data=_wav_bytes(),
            headers={"x-audio-codec": "wav"},
        )
        assert resp.status == 400

    _run(engine, go)


def test_asr_endpoint_rounds_beam_to_bucket(engine):
    """beam_size=4 runs as the beam-5 bucket instead of compiling a
    one-off beam-4 program."""

    async def go(client):
        resp = await client.post("/api/asr?beam_size=4", data=_asr_form())
        assert resp.status == 200

    _run(engine, go)
    beams = {k[1] for k in engine._programs if isinstance(k[1], int)}
    assert 4 not in beams


# --------------------------------------------------------------------------- #
# Program-cache LRU bound
# --------------------------------------------------------------------------- #
def test_program_cache_lru_bound():
    s = _settings(compile_cache_max=2)
    eng = WhisperEngine(ModelRegistry(s), s)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(SAMPLE_RATE) * 0.05).astype(np.float32)
    for beam in (1, 2, 3):
        eng.transcribe(audio, model="tiny", beam_size=beam)
    assert len(eng._programs) == 2
    # most-recent keys survive
    beams = {k[1] for k in eng._programs}
    assert beams == {2, 3}


# --------------------------------------------------------------------------- #
# Speaker-name sanitization (SV + TTS stores)
# --------------------------------------------------------------------------- #
def test_valid_speaker_name():
    assert valid_speaker_name("alice")
    assert valid_speaker_name("CLB")
    assert valid_speaker_name("user_2-b")
    for bad in (None, "", "../../x", "a/b", "a\\b", "..", ".", "a" * 65,
                "né", "a b", "x\x00y"):
        assert not valid_speaker_name(bad)


def test_sv_enroll_rejects_traversal(tmp_path):
    v = SpeakerVerifier(
        _settings(support_sv=True, sv_speaker_dir=str(tmp_path / "store")),
        embed_fn=lambda a: np.ones(8, np.float32),
    )
    audio = np.zeros(SAMPLE_RATE, np.float32)
    with pytest.raises(ValueError):
        v.enroll("../../evil", audio)
    assert not (tmp_path / "store").exists()  # no file I/O happened
    v.enroll("alice", audio)
    assert (tmp_path / "store" / "alice.npy").exists()


def test_sv_endpoint_rejects_traversal(engine, tmp_path):
    s = _settings(support_sv=True, sv_speaker_dir=str(tmp_path / "store"))

    async def go(client):
        resp = await client.post(
            "/api/sv?enroll=../../evil", data=_wav_bytes()
        )
        assert resp.status == 400
        body = await resp.json()
        assert "speaker" in body["error"].lower()

    _run(engine, go, settings=s)
    assert not (tmp_path / "store").exists()


def test_tts_store_path_rejects_traversal(tmp_path):
    store = SpeakerStore(str(tmp_path))
    with pytest.raises(ValueError):
        store.path("../../x")
    with pytest.raises(ValueError):
        store.load("../secrets")
    assert store.path("default").endswith("default.json")


def test_tts_endpoints_reject_traversal(tmp_path):
    from test_xtts import MICRO
    from wis_tpu.models.xtts.model import XTTSModel
    from wis_tpu.server.tts_app import create_tts_app

    import jax.numpy as jnp

    s = _settings(xtts_speaker_dir=str(tmp_path / "voices"))
    model = XTTSModel(cfg=MICRO, dtype=jnp.float32)

    async def runner():
        app = create_tts_app(settings=s, model=model)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.get(
                "/api/tts", params={"text": "hi", "speaker": "../../x"}
            )
            assert resp.status == 400
            import aiohttp

            form = aiohttp.FormData()
            form.add_field("wav_file", _wav_bytes(), filename="v.wav",
                           content_type="audio/wav")
            resp = await client.post(
                "/api/tts", params={"speaker": "../evil"}, data=form
            )
            assert resp.status == 400
        finally:
            await client.close()

    asyncio.run(runner())
    assert not (tmp_path / "voices").exists()


# --------------------------------------------------------------------------- #
# SV capability auto-gating (VERDICT r4 weak #9)
# --------------------------------------------------------------------------- #
def test_sv_auto_disabled_without_weights(engine):
    # support_sv default None = auto; no WavLM checkpoint in this repo →
    # SV endpoints 501 exactly like the reference on an incapable device
    async def go(client):
        resp = await client.post("/api/sv", data=_wav_bytes())
        assert resp.status == 501

    _run(engine, go, settings=_settings())


def test_sv_auto_enabled_with_weights(engine, tmp_path, monkeypatch):
    weights = tmp_path / "wavlm-base-plus-sv"
    weights.mkdir()
    (weights / "model.safetensors").write_bytes(b"\0" * 8)
    from wis_tpu.server import sv as sv_mod

    # the capability check follows settings.model_dir (<dir>/wavlm-base-plus-sv)
    assert sv_mod.sv_weights_present(_settings(model_dir=str(tmp_path)))
    assert not sv_mod.sv_weights_present(
        _settings(model_dir=str(tmp_path / "missing"))
    )

    import wis_tpu.server.app as app_mod

    monkeypatch.setattr(
        app_mod, "sv_weights_present", lambda *a: True
    )
    s = _settings(sv_speaker_dir=str(tmp_path / "store"))

    async def go(client):
        # enabled: the endpoint proceeds past the 501 gate (enroll path
        # with an injected embedder would be a deeper test; here the gate
        # itself is the contract)
        client.server.app["sv"]._embed_fn = lambda a: np.ones(8, np.float32)
        resp = await client.post("/api/sv?enroll=alice", data=_wav_bytes())
        assert resp.status == 200
        assert (await resp.json()) == {"enrolled": "alice"}

    _run(engine, go, settings=s)
    assert (tmp_path / "store" / "alice.npy").exists()


def test_explicit_support_sv_false_wins(engine, tmp_path, monkeypatch):
    import wis_tpu.server.app as app_mod

    monkeypatch.setattr(app_mod, "sv_weights_present", lambda *a: True)

    async def go(client):
        resp = await client.post("/api/sv", data=_wav_bytes())
        assert resp.status == 501

    _run(engine, go, settings=_settings(support_sv=False))


# --------------------------------------------------------------------------- #
# Engine faults surface as 500, not "Invalid audio" 400 (VERDICT r4 #8)
# --------------------------------------------------------------------------- #
def test_engine_fault_returns_500(engine, monkeypatch):
    def boom(*a, **kw):
        raise RuntimeError("engine exploded")

    monkeypatch.setattr(engine, "transcribe", boom)

    async def go(client):
        resp = await client.post("/api/asr", data=_asr_form())
        assert resp.status == 500

    _run(engine, go)


def test_ws_session_rejects_oversize_beam(engine):
    """The WS/datachannel path bucket-validates per-utterance beam
    overrides BEFORE enqueue (a bad override must fail the utterance,
    never trigger a compile or fail a coalesced batch)."""
    import json as _json

    async def go(client):
        ws = await client.ws_connect("/api/ws/asr")
        await ws.send_str(_json.dumps({"type": "start"}))
        await ws.receive()  # log: recording started
        rng = np.random.default_rng(0)
        pcm = (rng.standard_normal(SAMPLE_RATE) * 0.05 * 32767).astype(
            "<i2"
        )
        await ws.send_bytes(pcm.tobytes())
        await ws.send_str(
            _json.dumps({"type": "stop", "obj": {"beam_size": 40}})
        )
        msg = await ws.receive()
        parsed = _json.loads(msg.data)
        assert parsed["type"] == "error"
        assert "beam" in parsed["obj"]["msg"]
        await ws.close()

    keys = set(engine._programs)
    _run(engine, go)
    assert set(engine._programs) == keys
