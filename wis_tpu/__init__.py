"""wis_tpu — TPU-native speech inference framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
toverainc/willow-inference-server (the "reference"): Whisper ASR
(tiny→large-v2) with per-request model/beam/language selection, long-form
chunked transcription, speech-to-English translation, speaker verification,
and XTTS-class custom-voice streaming TTS, served over the same REST /
Willow-streaming / WebRTC API surface.

Unlike the reference — whose compute core is CTranslate2 C++/CUDA reached
through Python bindings (reference main.py:341-443) — every model here is a
TPU-first JAX program: fused Pallas log-mel frontend, flash-attention
encoder, KV-cached beam-search decoder compiled once per (model, beam,
batch-bucket) shape, HBM-aware multi-model residency, and a dynamic batcher
that coalesces concurrent sessions into padded TPU batches over a
`jax.sharding.Mesh` of per-chip replicas.

Layout:
    wis_tpu.audio     — ingest (native C++ codecs), log-mel frontend, chunking
    wis_tpu.models    — whisper / wavlm (speaker-ID) / xtts model families
    wis_tpu.ops       — Pallas kernels + XLA ops (attention, mel, sampling)
    wis_tpu.decoding  — greedy/beam search, language detect, prompts
    wis_tpu.runtime   — engine, compile cache, residency, dynamic batcher
    wis_tpu.parallel  — device mesh, replica dispatch, TP shardings
    wis_tpu.server    — HTTP/WS/WebRTC serving layer (API-parity endpoints)
    wis_tpu.utils     — timing spans, logging, profiling
"""

from wis_tpu.version import __version__

__all__ = ["__version__"]
