"""Headline benchmark — Whisper large-v2, beam 5, 3.84 s fixture.

Mirrors the reference's headline row (BASELINE.md: 140 ms / 27x realtime
on RTX 4090, README.md:71, measured as the API-reported `infer_time` with
model load excluded). Same protocol here: end-to-end engine time —
features + encoder + beam-5 KV-cached decode + token decode — on one TPU
chip, p50 of repeated runs after warmup, model load/compile excluded.

Weights are seeded-random when no checkpoint is present (latency is
weight-independent); decode length is capped at 32 new tokens, a
realistic budget for 3.84 s of speech (~15-25 tokens + EOT in the
reference transcript) since random weights never emit EOT. With real
weights the same program exits early at EOT, so this cap does not
understate production latency.

Prints one JSON line:
  {"metric": "large-v2_beam5_3.84s_realtime_x", "value": <p50 speedup>,
   "unit": "x_realtime", "vs_baseline": <value / 27.0>}
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

AUDIO_MS = 3840.0
BASELINE_X = 27.0  # RTX 4090, reference README.md:71
TOKEN_BUDGET = 32
RUNS = 10


def _load_fixture() -> np.ndarray:
    try:
        from wis_tpu.audio.ingest import load_audio

        with open("/root/reference/client/3sec.flac", "rb") as f:
            return load_audio(f.read())
    except Exception:
        rng = np.random.default_rng(0)
        return (rng.standard_normal(61440) * 0.05).astype(np.float32)


def main() -> None:
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    settings = APISettings(
        whisper_model_default="large",
        beam_size=5,
        # beam-5 must not be overridden by long mode for this fixture
        long_beam_size=5,
        batch_buckets=["1", "2", "4", "8"],
    )
    engine = WhisperEngine(ModelRegistry(settings), settings)
    audio = _load_fixture()

    # warmup: compile + first dispatch (excluded, as the reference excludes
    # model load and runs warm_models first)
    for _ in range(2):
        engine.transcribe(audio, model="large", beam_size=5, max_tokens=TOKEN_BUDGET)

    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        res = engine.transcribe(
            audio, model="large", beam_size=5, max_tokens=TOKEN_BUDGET
        )
        times.append(res.infer_time_ms)
        del t0
    p50 = statistics.median(times)
    speedup = AUDIO_MS / p50
    print(
        json.dumps(
            {
                "metric": "large-v2_beam5_3.84s_realtime_x",
                "value": round(speedup, 2),
                "unit": "x_realtime",
                "vs_baseline": round(speedup / BASELINE_X, 3),
                "p50_infer_ms": round(p50, 1),
                "all_ms": [round(t, 1) for t in times],
                "token_budget": TOKEN_BUDGET,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
