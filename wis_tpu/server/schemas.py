"""API response schemas (reference main.py:1125-1165) + OpenAPI document.

FastAPI generated the reference's OpenAPI at /api/docs (main.py:1039-1041);
here the pydantic models drive both response validation in tests and a
hand-assembled OpenAPI JSON served at /api/openapi.json.
"""

from __future__ import annotations

from typing import Dict, Optional

from pydantic import BaseModel


class Ping(BaseModel):
    message: str


class ASR(BaseModel):
    language: str
    infer_time: float
    translation: Optional[str] = None
    infer_speedup: int
    audio_duration: int
    text: str


class WillowStats(ASR):
    voice_auth: Optional[Dict[str, float]] = None
    speaker_status: Optional[str] = None


def openapi_document(settings) -> dict:
    """Minimal OpenAPI 3.1 document for the served surface."""

    def schema(model: type[BaseModel]):
        return model.model_json_schema()

    return {
        "openapi": "3.1.0",
        "info": {
            "title": settings.name,
            "description": settings.description,
            "version": settings.version,
        },
        "paths": {
            "/api/ping": {
                "get": {
                    "summary": "Ping for connectivity check",
                    "responses": {"200": {"description": "pong"}},
                }
            },
            "/api/asr": {
                "post": {
                    "summary": "Submit audio file for ASR",
                    "parameters": [
                        (
                            {
                                "name": p,
                                "in": "query",
                                "required": False,
                                "description": (
                                    "beam width; rounds UP to the nearest "
                                    "compiled beam bucket "
                                    f"({sorted(int(b) for b in settings.beam_buckets)}); "
                                    "values above the largest bucket are "
                                    "rejected with 400 (beam size is a "
                                    "compile key on TPU)"
                                ),
                            }
                            if p == "beam_size"
                            else {"name": p, "in": "query", "required": False}
                        )
                        for p in (
                            "model",
                            "detect_language",
                            "beam_size",
                            "force_language",
                            "translate",
                            "timestamps",
                            "word_timestamps",
                        )
                    ],
                    "responses": {"200": {"description": "ASR engine output"}},
                }
            },
            "/api/willow": {
                "post": {
                    "summary": "Stream Willow audio for ASR",
                    "responses": {"200": {"description": "ASR engine output"}},
                }
            },
            "/api/rtc/asr": {
                "post": {
                    "summary": "Return SDP for WebRTC clients",
                    "responses": {"200": {"description": "SDP answer"}},
                }
            },
            "/api/ws/asr": {
                "get": {
                    "summary": "WebSocket streaming ASR session "
                    "(datachannel-protocol messages)",
                    "responses": {"101": {"description": "upgrade"}},
                }
            },
            "/api/sv": {
                "post": {
                    "summary": "Speaker verification / enrollment",
                    "responses": {"200": {"description": "speaker scores"}},
                }
            },
            "/api/status": {
                "get": {
                    "summary": "Model residency / queue snapshot",
                    "responses": {"200": {"description": "status"}},
                }
            },
        },
        "components": {
            "schemas": {"ASR": schema(ASR), "Ping": schema(Ping)}
        },
    }
