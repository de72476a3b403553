"""TTS server — API parity with the reference XTTS sidecar
(reference xtts/main.py:54-355):

    POST /clone_speaker  — reference wav → conditioning latents JSON
    POST /tts_stream     — JSON body streaming TTS
    GET  /api/tts        — query-param streaming TTS w/ full sampling
                           surface + persisted speakers
    POST /api/tts        — enroll a new voice from an upload

Speaker voices persist as `<dir>/<name>.json` with fp16
`gpt_cond_latent` + `speaker_embedding` (reference xtts/main.py:185-198,
347-353). Responses stream `audio/wav`: header first, then int16 chunks
as the vocoder emits them (204-211)."""

from __future__ import annotations

import asyncio
import json
import logging
import os
from typing import Dict, Optional

import numpy as np
from aiohttp import web

from wis_tpu.audio.ingest import load_audio, wav_stream_header
from wis_tpu.models.xtts.model import XTTS_LANGUAGES, XTTSModel
from wis_tpu.server.sv import valid_speaker_name
from wis_tpu.settings import APISettings, get_api_settings

logger = logging.getLogger("wis_tpu")


def postprocess_int16(wav: np.ndarray) -> bytes:
    """float wave → int16 bytes with clip/scale (reference xtts/main.py:77-85)."""
    wav = np.clip(wav, -1.0, 1.0)
    return (wav * 32767).astype("<i2").tobytes()


class SpeakerStore:
    """JSON voice store (reference xtts/main.py:185-198)."""

    def __init__(self, directory: str):
        self.directory = directory

    def path(self, name: str) -> str:
        # names become filenames: reject traversal before any file I/O
        # (`speaker=../../x` would read/write .json outside the store —
        # VERDICT r4 #4; endpoints 400 before reaching here)
        if not valid_speaker_name(name):
            raise ValueError(f"invalid speaker name {name!r}")
        return os.path.join(self.directory, f"{name}.json")

    def names(self):
        if not os.path.isdir(self.directory):
            return []
        return sorted(
            f[:-5] for f in os.listdir(self.directory) if f.endswith(".json")
        )

    def load(self, name: str) -> Optional[Dict]:
        p = self.path(name)
        if not os.path.isfile(p):
            return None
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def save(self, name: str, latents: Dict) -> None:
        os.makedirs(self.directory, exist_ok=True)
        with open(self.path(name), "w", encoding="utf-8") as f:
            json.dump(latents, f)
        logger.info("TTS: saved speaker %s", name)

    def load_or_default(self, name: str, provision=None) -> Dict:
        """Unknown speakers fall back to 'default' (reference
        xtts/main.py:289-295). If no 'default' voice exists yet and a
        `provision` callback is given, it is invoked once to enroll the
        built-in voices (the reference ships xtts/{default,female,male}
        .json; here they are cloned from deterministic synthetic
        utterances on first use — real checkpoints re-clone real
        voices). Last resort: a zero voice."""
        voice = self.load(name)
        if voice is None:
            voice = self.load("default")
        if voice is None and provision is not None:
            provision(self)
            voice = self.load(name) or self.load("default")
        if voice is None:
            voice = {
                "gpt_cond_latent": [[0.0] * 1024] * 32,
                "speaker_embedding": [0.0] * 512,
            }
        return voice


def _voice_seed_audio(f0: float, seconds: float = 4.0, sr: int = 16000) -> np.ndarray:
    """Deterministic vowel-like utterance for provisioning the built-in
    voices: an f0 harmonic stack shaped by slowly-gliding formants."""
    t = np.arange(int(seconds * sr)) / sr
    glide = 1.0 + 0.02 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * f0 * np.cumsum(glide) / sr
    wav = np.zeros_like(t, dtype=np.float64)
    formants = (500 + 80 * np.sin(2 * np.pi * 0.31 * t),
                1500 + 200 * np.sin(2 * np.pi * 0.17 * t),
                2500 * np.ones_like(t))
    for k in range(1, 40):
        fk = k * f0
        amp = sum(np.exp(-0.5 * ((fk - fc) / 220.0) ** 2) for fc in formants)
        wav += amp * np.sin(k * phase)
    wav *= 0.15 / max(np.abs(wav).max(), 1e-9)
    # amplitude syllable envelope
    wav *= 0.6 + 0.4 * np.clip(np.sin(2 * np.pi * 2.5 * t), 0.0, 1.0)
    return wav.astype(np.float32)


def provision_builtin_voices(model: XTTSModel):
    """Returns a provision callback enrolling the reference's shipped
    voice set (xtts/{default,female,male,CLB}.json — CLB is the Arctic
    corpus speaker the reference bundles)."""

    def provision(store: SpeakerStore) -> None:
        for name, f0 in (
            ("default", 160.0),
            ("female", 225.0),
            ("male", 120.0),
            ("CLB", 210.0),
        ):
            if store.load(name) is None:
                store.save(name, model.clone_speaker(_voice_seed_audio(f0)))
        logger.info("TTS: provisioned built-in voices %s", store.names())

    return provision


def _stream_params(query) -> Dict:
    """The reference's full GET /api/tts sampling surface
    (xtts/main.py:243-325)."""
    def f(name, default, cast):
        raw = query.get(name)
        if raw is None:
            return default
        try:
            return cast(raw)
        except ValueError:
            return default

    decoder = query.get("decoder", "ne_hifigan")
    if decoder not in ("ne_hifigan", "hifigan"):  # reference xtts/main.py:274
        decoder = "ne_hifigan"
    return {
        "stream_chunk_size": f("stream_chunk_size", 20, int),
        "overlap_wav_len": f("overlap_wav_len", 1024, int),
        "temperature": f("temperature", 0.1, float),
        "length_penalty": f("length_penalty", 1.0, float),
        "repetition_penalty": f("repetition_penalty", 7.0, float),
        "top_k": f("top_k", 50, int),
        "top_p": f("top_p", 0.8, float),
        "do_sample": query.get("do_sample", "true").lower() in ("1", "true", "t", "yes"),
        "speed": f("speed", 1.0, float),
        "decoder": decoder,
        "enable_text_splitting": query.get("enable_text_splitting", "false").lower()
        in ("1", "true", "t", "yes"),
        # extension beyond the reference surface: floors the emitted token
        # count (stop masked until then) — load/latency tests use it to
        # pin utterance length under random weights; default 0 is inert
        "min_audio_tokens": f("min_audio_tokens", 0, int),
    }


async def _stream_tts(
    request: web.Request,
    text: str,
    language: str,
    voice: Dict,
    params: Dict,
    add_wav_header: bool = True,
) -> web.StreamResponse:
    model: XTTSModel = request.app["tts_model"]
    sr = model.cfg.vocoder.sample_rate
    resp = web.StreamResponse(
        headers={
            "Content-Type": "audio/wav",
            "Cache-Control": "public, max-age=31536000",
        }
    )
    await resp.prepare(request)
    if add_wav_header:
        await resp.write(wav_stream_header(sr=sr))

    loop = asyncio.get_running_loop()
    queue: asyncio.Queue = asyncio.Queue(maxsize=4)

    def producer():
        try:
            for chunk in model.inference_stream_split(
                text,
                language,
                np.asarray(voice["gpt_cond_latent"], np.float32),
                np.asarray(voice["speaker_embedding"], np.float32),
                **params,
            ):
                asyncio.run_coroutine_threadsafe(queue.put(chunk), loop).result()
        finally:
            asyncio.run_coroutine_threadsafe(queue.put(None), loop).result()

    task = loop.run_in_executor(None, producer)
    while True:
        chunk = await queue.get()
        if chunk is None:
            break
        await resp.write(postprocess_int16(chunk))
    await task
    await resp.write_eof()
    return resp


# --------------------------------------------------------------------------- #
# Handlers
# --------------------------------------------------------------------------- #
async def clone_speaker(request: web.Request) -> web.Response:
    """POST multipart wav_file → conditioning latents JSON (reference
    xtts/main.py:62-74)."""
    model: XTTSModel = request.app["tts_model"]
    reader = await request.multipart()
    data = None
    async for part in reader:
        if part.name in ("wav_file", "audio_file", "file"):
            data = await part.read(decode=False)
            break
    if data is None:
        return web.json_response({"error": "Missing wav_file"}, status=400)
    try:
        audio = load_audio(bytes(data))
    except Exception:  # noqa: BLE001
        return web.json_response({"error": "Invalid audio"}, status=400)
    loop = asyncio.get_running_loop()
    latents = await loop.run_in_executor(None, model.clone_speaker, audio)
    return web.json_response(latents)


async def tts_stream(request: web.Request) -> web.StreamResponse:
    """POST JSON streaming TTS (reference xtts/main.py:107-171)."""
    body = await request.json()
    text = body.get("text", "")
    language = body.get("language", "en")
    voice = {
        "gpt_cond_latent": body.get("gpt_cond_latent"),
        "speaker_embedding": body.get("speaker_embedding"),
    }
    if voice["gpt_cond_latent"] is None or voice["speaker_embedding"] is None:
        return web.json_response({"error": "Missing speaker latents"}, status=400)
    # the reference's StreamingInputs carries the full sampling surface
    # (xtts/main.py:95-104) — forward all of it, not just chunk size
    decoder = body.get("decoder", "ne_hifigan")
    if decoder not in ("ne_hifigan", "hifigan"):
        decoder = "ne_hifigan"
    params = {
        "stream_chunk_size": int(body.get("stream_chunk_size", 20)),
        "temperature": float(body.get("temperature", 0.1)),
        "length_penalty": float(body.get("length_penalty", 1.0)),
        "repetition_penalty": float(body.get("repetition_penalty", 7.0)),
        "top_k": int(body.get("top_k", 50)),
        "top_p": float(body.get("top_p", 0.8)),
        "do_sample": bool(body.get("do_sample", True)),
        "speed": float(body.get("speed", 1.0)),
        "decoder": decoder,
        "enable_text_splitting": bool(body.get("enable_text_splitting", False)),
    }
    # add_wav_header mirrors the reference's /tts_stream body field
    # (xtts/main.py StreamingInputs)
    add_header = bool(body.get("add_wav_header", True))
    return await _stream_tts(
        request, text, language, voice, params, add_wav_header=add_header
    )


async def tts_get(request: web.Request) -> web.StreamResponse:
    """GET /api/tts — the Willow streaming endpoint (reference
    xtts/main.py:278-325)."""
    text = request.query.get("text", "")
    language = request.query.get("language", "en").lower()
    if language not in XTTS_LANGUAGES:
        return web.json_response(
            {"error": f"Unsupported language {language}"}, status=400
        )
    store: SpeakerStore = request.app["tts_speakers"]
    speaker = request.query.get("speaker", "default")
    if not valid_speaker_name(speaker):
        return web.json_response({"error": "Invalid speaker name"}, status=400)
    loop = asyncio.get_running_loop()
    voice = await loop.run_in_executor(
        None, store.load_or_default, speaker, request.app.get("tts_provision")
    )
    params = _stream_params(request.query)
    return await _stream_tts(request, text, language, voice, params)


async def tts_enroll(request: web.Request) -> web.Response:
    """POST /api/tts — enroll a new voice from an upload (reference
    xtts/main.py:329-355)."""
    model: XTTSModel = request.app["tts_model"]
    store: SpeakerStore = request.app["tts_speakers"]
    speaker = request.query.get("speaker")
    if not speaker:
        return web.json_response({"error": "Missing speaker name"}, status=400)
    if not valid_speaker_name(speaker):
        return web.json_response({"error": "Invalid speaker name"}, status=400)
    reader = await request.multipart()
    data = None
    async for part in reader:
        if part.name in ("wav_file", "audio_file", "file"):
            data = await part.read(decode=False)
            break
    if data is None:
        return web.json_response({"error": "Missing audio upload"}, status=400)
    try:
        audio = load_audio(bytes(data))
    except Exception:  # noqa: BLE001
        return web.json_response({"error": "Invalid audio"}, status=400)
    loop = asyncio.get_running_loop()
    latents = await loop.run_in_executor(None, model.clone_speaker, audio)
    store.save(speaker, latents)
    return web.json_response({"speaker": speaker, "status": "saved"})


async def tts_speakers_list(request: web.Request) -> web.Response:
    store: SpeakerStore = request.app["tts_speakers"]
    return web.json_response({"speakers": store.names()})


def create_tts_app(
    settings: Optional[APISettings] = None,
    model: Optional[XTTSModel] = None,
) -> web.Application:
    settings = settings or get_api_settings()
    app = web.Application(client_max_size=512 * 1024**2)
    app["settings"] = settings
    app["tts_model"] = model or XTTSModel(quant=settings.xtts_quant)
    app["tts_speakers"] = SpeakerStore(settings.xtts_speaker_dir)
    app["tts_provision"] = provision_builtin_voices(app["tts_model"])
    app.router.add_post("/clone_speaker", clone_speaker)
    app.router.add_post("/tts_stream", tts_stream)
    app.router.add_get("/api/tts", tts_get)
    app.router.add_post("/api/tts", tts_enroll)
    app.router.add_get("/api/tts/speakers", tts_speakers_list)
    return app


def main() -> None:
    import sys

    from wis_tpu.utils.logging import configure_logging

    configure_logging()
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 19010
    web.run_app(create_tts_app(), port=port)


if __name__ == "__main__":
    main()
