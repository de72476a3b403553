"""Environment-driven configuration.

Mirrors the reference settings surface (reference settings.py:6-82) —
same env-var names, case-insensitive, no prefix — plus TPU-specific knobs
that replace the reference's CUDA VRAM autodetection (reference
main.py:234-302) with a static HBM residency/compile-budget model.

Also preserves the reference's whole-file override hook: if a module named
``custom_settings`` is importable and defines ``get_api_settings``, it wins
(reference main.py:68-77).

pydantic-settings is not available in this image, so env parsing is done
explicitly on top of a plain pydantic model (same semantics: every field is
settable by an env var of the same name, case-insensitive).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import List, Optional

from pydantic import BaseModel


def _coerce(raw: str, annotation) -> object:
    """Parse an env-var string into the field's type (pydantic-settings rules)."""
    if annotation in (bool, Optional[bool]):
        return raw.strip().lower() in ("1", "true", "yes", "on", "t", "y")
    if annotation is int:
        return int(raw)
    if annotation is float:
        return float(raw)
    if annotation in (List[str], list):
        raw = raw.strip()
        if raw.startswith("["):
            return json.loads(raw)
        return [s.strip() for s in raw.split(",") if s.strip()]
    return raw


class APISettings(BaseModel):
    # ------------------------------------------------------------------ #
    # Project metadata (reference settings.py:8-10)
    # ------------------------------------------------------------------ #
    name: str = "Willow Inference Server (TPU)"
    description: str = "High Performance Language Inference API — TPU-native"
    version: str = "1.0"

    # ------------------------------------------------------------------ #
    # ASR decoding defaults (reference settings.py:12-26)
    # ------------------------------------------------------------------ #
    #: default beam size — 1 is greedy
    beam_size: int = 1
    #: beam size for long transcriptions ("long mode")
    long_beam_size: int = 3
    #: audio duration (ms) at/above which long mode activates
    long_beam_size_threshold: int = 12000
    #: default language
    language: str = "en"
    #: detect language by default?
    detect_language: bool = False

    # ------------------------------------------------------------------ #
    # Model residency (reference settings.py:28-38). On TPU all sizes fit
    # in one v5e chip's HBM in bf16 (~8 GB total weights), so preloading
    # everything is cheap; the flags are honored for API compat.
    # ------------------------------------------------------------------ #
    preload_all_models: bool = False
    preload_whisper_model_tiny: bool = True
    preload_whisper_model_base: bool = True
    preload_whisper_model_small: bool = True
    preload_whisper_model_medium: bool = True
    preload_whisper_model_large: bool = True

    #: default whisper model: tiny | base | small | medium | large
    whisper_model_default: str = "medium"

    # ------------------------------------------------------------------ #
    # Long-form chunking (reference settings.py:41-53)
    # ------------------------------------------------------------------ #
    support_chunking: bool = True
    #: max chunks decoded on-device at once; on TPU this is the static
    #: batch bucket for the long-form path rather than a VRAM guess
    concurrent_gpu_chunks: int = 4

    # ------------------------------------------------------------------ #
    # Speaker verification (reference settings.py:55-59)
    # ------------------------------------------------------------------ #
    #: None = auto: enable iff converted WavLM weights are present at
    #: startup — the capability-based gating the reference applies to its
    #: GPU probe (reference main.py:266-292 auto-enables SV on capable
    #: devices); an explicit true/false env value always wins
    support_sv: Optional[bool] = None
    sv_threshold: float = 0.75
    #: directory of enrolled speaker embeddings (<name>.npy)
    sv_speaker_dir: str = "speakers/voice_auth"

    # ------------------------------------------------------------------ #
    # Serving (reference settings.py:64-74)
    # ------------------------------------------------------------------ #
    cors_allowed_origins: List[str] = []
    basic_auth_user: Optional[str] = None
    basic_auth_pass: Optional[str] = None
    aiortc_debug: bool = False
    #: UDP port range for WebRTC media (reference main.py:141-184 pins
    #: ephemeral ports; here it is plain configuration, not a monkey-patch)
    rtc_port_start: int = 10000
    rtc_port_end: int = 10050

    # ------------------------------------------------------------------ #
    # TPU-specific — replaces CUDA device probing (reference main.py:234-302)
    # ------------------------------------------------------------------ #
    #: computation dtype for model weights/activations
    dtype: str = "bfloat16"
    #: weight quantization: "none" | "int8" (per-output-channel symmetric,
    #: dequant fused into the matmuls — the TPU analog of the reference's
    #: CTranslate2 int8_float16 compute type, main.py:281-292 / QUANT env
    #: in utils.sh:70). An int4 decode weight stream was built and
    #: measured perf-NEUTRAL in round 2 (the in-kernel nibble unpack's
    #: VPU cost cancels the halved DMA at small beam batches) and was
    #: removed in round 3; "int4" now aliases "int8" (the RTN int4
    #: quantizer itself remains in ops/quant.py). See BENCH.md §int4.
    quant: str = "int8"
    #: cross-attention K/V stream quantization inside the fused decode
    #: step: "int8" streams per-column int8 cross-KV (half the dominant
    #: per-step HBM traffic after weights; scales apply outside the
    #: contraction — exact dequant semantics over int8-rounded values,
    #: the same noise class as weight int8) | "none". Only active when
    #: `quant` is int8 and the fused path runs.
    xa_quant: str = "int8"
    #: XTTS GPT weight quantization: "none" | "int8". The chunked TTS
    #: decode streams the full 30L/1024d block stack per audio token —
    #: weight-bound like the whisper decoder, so int8 halves its HBM
    #: traffic; embeddings/LayerNorms/audio head stay bf16
    #: (ops/quant.py quantize_gpt_params).
    xtts_quant: str = "int8"
    #: static HBM budget per chip in bytes (v5e = 16 GiB); residency
    #: decisions are computed against this instead of runtime VRAM probes
    hbm_budget_bytes: int = 16 * 1024**3
    #: batch-size buckets the decoder is compiled for; requests are padded
    #: up to the nearest bucket (dynamic batcher). Capped at 4 by default:
    #: measured on v5e large-v2 beam-5, per-request device cost stops
    #: amortizing past bk≈20 (encoder + block-diagonal cross-KV scale
    #: linearly), so a batch-8 dispatch serves 10-way load SLOWER than
    #: two batch-4s (9.6 vs 13.9 req/s, p50 1048 vs 584 ms — BENCH.md
    #: round 5). Add "8" back for throughput-over-latency deployments.
    batch_buckets: List[str] = ["1", "2", "4"]
    #: beam-size compile buckets. Beam size is a COMPILE key on TPU (the
    #: reference's CT2 engine has no compile step and tolerates arbitrary
    #: beams, main.py:1174-1182): an unvalidated `?beam_size=40` would
    #: force a fresh multi-minute XLA compile while holding the inference
    #: thread — a remote-compile DoS. Requested beams round UP to the
    #: nearest bucket; beams above the largest bucket are rejected (400).
    beam_buckets: List[str] = ["1", "2", "3", "5"]
    #: hard cap on generated tokens per 30 s window
    max_decode_tokens: int = 224
    #: decode-length compile buckets: short utterances use a small KV
    #: cache (every beam reorder moves the whole cache — halving its
    #: length halves that traffic); audio ≤ short_audio_threshold_ms
    #: uses the first bucket
    decode_token_buckets: List[str] = ["96", "224"]
    short_audio_threshold_ms: int = 12000
    #: audio-length compile buckets (seconds): a request transfers only
    #: bucket-many int16 samples and the program zero-pads to the 30 s
    #: window ON DEVICE — through a network TPU tunnel each shipped
    #: megabyte costs ~10 ms, so short utterances must not pay the full
    #: padded window (BENCH.md r3)
    audio_second_buckets: List[str] = ["4", "8", "16", "30"]
    #: directory holding converted model weights (<size>/ with params.npz
    #: or HF safetensors); missing weights fall back to seeded random init
    model_dir: str = "models"
    #: number of warmup inferences per preloaded model (reference
    #: main.py:480-511 runs 3)
    warmup_iterations: int = 1
    #: mesh axis layout: "replica" data-parallel replicas (the TPU analog
    #: of CTranslate2 device_index fan-out) and optional tensor parallelism
    mesh_replica_axis: int = -1  # -1 = all local devices
    mesh_tensor_axis: int = 1

    #: dynamic batcher window (s): how long to hold a request open for
    #: coalescing before dispatch
    batch_window_s: float = 0.004
    #: straggler-admission inter-arrival window (s): when a drained batch
    #: is already coalescing (≥2) but below the max bucket, keep blocking
    #: in windows of this length — each window that lands one more
    #: request extends the wait; one silent window dispatches. On a
    #: single-core host device dispatch starves the event loop of the
    #: GIL, so peers' requests only get parsed while the batcher blocks
    #: here — without it the batcher phase-locks at batch 2-3 with 10
    #: clients in flight (measured: 7.75 req/s locked vs 13+ unlocked).
    #: Light load pays at most one window on an already-coalesced batch.
    batch_admit_s: float = 0.02
    #: absolute ceiling on the total straggler-admission wait, measured
    #: from the first admit window: bounds the FIRST request's added
    #: queueing delay even under a steady trickle of arrivals (without
    #: it, each landing straggler extends the wait by another
    #: batch_admit_s up to max_batch — a tail-latency cliff for 2-3
    #: client workloads; ADVICE r4)
    batch_admit_max_s: float = 0.08
    #: serve with one engine replica per chip (the CT2 device_index
    #: analog); "auto" enables it when >1 device is visible
    replica_pool: str = "auto"
    #: max concurrent compiled programs kept hot per model
    compile_cache_max: int = 32
    #: all-layers-in-one-kernel Pallas decode step for batch-1 programs:
    #: "auto" (on TPU) | "on" (anywhere — CPU interprets; tests) | "off".
    #: Measured on v5e large-v2 beam-5: 2.56 ms/step all-in vs 3.0 for
    #: the XLA ancestry path (BENCH.md round 2).
    fused_decode: str = "auto"

    #: TTS speaker-latent store directory (reference xtts/main.py:185-198)
    xtts_speaker_dir: str = "speakers/xtts"
    #: default TTS decoder chunk size in tokens (reference xtts/main.py:243)
    tts_stream_chunk_size: int = 20

    def batch_bucket_list(self) -> List[int]:
        return sorted(int(b) for b in self.batch_buckets)

    def beam_bucket(self, beam: int) -> int:
        """Round a requested beam size UP to the nearest compiled beam
        bucket; reject out-of-range values. Every caller that lets a
        request choose a beam (query param, WS message, RTC offer) must
        pass it through here BEFORE it can reach the program cache."""
        buckets = sorted(int(b) for b in self.beam_buckets)
        if not isinstance(beam, int) or beam < 1 or beam > buckets[-1]:
            raise ValueError(
                f"beam_size {beam!r} outside compiled beam buckets "
                f"{buckets} (max {buckets[-1]})"
            )
        for b in buckets:
            if beam <= b:
                return b
        return buckets[-1]

    def audio_second_bucket_list(self) -> List[int]:
        return sorted(int(b) for b in self.audio_second_buckets)


def _load_dotenv(path: str = ".env") -> dict:
    """Flat KEY=VALUE file support (the reference layers a .env through
    utils.sh:8-18 and docker-compose env_file). Process env wins."""
    out = {}
    if os.path.isfile(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                key, _, value = line.partition("=")
                out[key.strip().lower()] = value.strip().strip("'\"")
    return out


def _settings_from_env() -> APISettings:
    env = _load_dotenv()
    env.update({k.lower(): v for k, v in os.environ.items()})
    kwargs = {}
    for field_name, field in APISettings.model_fields.items():
        if field_name in env:
            try:
                kwargs[field_name] = _coerce(env[field_name], field.annotation)
            except (ValueError, json.JSONDecodeError):
                kwargs[field_name] = env[field_name]
    return APISettings(**kwargs)


@lru_cache()
def get_api_settings() -> APISettings:
    """Return process-wide settings, honoring the custom_settings override
    hook (reference main.py:68-77)."""
    try:
        import custom_settings  # type: ignore

        if hasattr(custom_settings, "get_api_settings"):
            return custom_settings.get_api_settings()
    except ImportError:
        pass
    return _settings_from_env()
