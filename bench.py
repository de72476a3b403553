"""Driver benchmark — whisper realtime multiples across the reference's
published table (BASELINE.md / reference README.md:69-103).

Prints one JSON line per config, HEADLINE FIRST (drivers that read a
single line get the headline row; the full set makes the BENCH.md
cross-config table driver-audited):

  1. large-v2 beam-5, 3.84 s  — vs RTX 4090 27x   (the headline row)
  2. large-v2 beam-5, 10.7 s  — vs H100 20x       (best published)
  3. large-v2 beam-5, 29.2 s  — vs H100 23x
  4. medium  beam-1, 3.84 s  — vs RTX 4090 45x
  5. medium  beam-1, 29.2 s  — vs RTX 4090 77x
  6. large-v2 beam-5 batch-4 coalesced throughput (req/s) — vs the
     reference's best-case serial rate (7.14 req/s, 140 ms/req 4090)

Protocol mirrors the reference's headline measurement: the API-reported
`infer_time` (features + encoder + decode + text), model load/compile
excluded, p50 of repeated runs after warmup (reference main.py:1218-1224,
README.md:69).

Weights are seeded-random when no checkpoint is present (latency is
weight-independent); per-row decode budgets are realistic transcript
lengths for each fixture (~2-4 tokens/s of speech + EOT) since random
weights never emit EOT. With real weights the same program exits early
at EOT, so the caps do not understate production latency.
"""

from __future__ import annotations

import json
import statistics
import sys

import numpy as np

RUNS = 10
WARMUP = 2

#: (metric, model, beam, fixture, synth_ms, token_budget, baseline_x, baseline_hw)
CONFIGS = [
    ("large-v2_beam5_3.84s_realtime_x", "large", 5, "3sec.flac", 3840, 32,
     27.0, "RTX4090"),
    ("large-v2_beam5_10.7s_realtime_x", "large", 5, "10sec.flac", 10688, 64,
     20.0, "H100"),
    ("large-v2_beam5_29.2s_realtime_x", "large", 5, "30sec.flac", 29248, 100,
     23.0, "H100"),
    ("medium_beam1_3.84s_realtime_x", "medium", 1, "3sec.flac", 3840, 32,
     45.0, "RTX4090"),
    ("medium_beam1_29.2s_realtime_x", "medium", 1, "30sec.flac", 29248, 100,
     77.0, "RTX4090"),
]


def _load_fixture(name: str, synth_ms: int) -> np.ndarray:
    try:
        from wis_tpu.audio.ingest import load_audio

        with open(f"/root/reference/client/{name}", "rb") as f:
            return load_audio(f.read())
    except Exception:
        rng = np.random.default_rng(0)
        n = int(synth_ms * 16)  # 16 kHz
        return (rng.standard_normal(n) * 0.05).astype(np.float32)


def _engine(model: str, beam: int):
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    settings = APISettings(
        whisper_model_default=model,
        beam_size=beam,
        # long mode must not override the row's beam (reference rows fix
        # the beam per config)
        long_beam_size=beam,
        batch_buckets=["1", "2", "4", "8"],
    )
    return WhisperEngine(ModelRegistry(settings), settings)


def _throughput_row(engines) -> None:
    """Batch-4 coalesced throughput (large beam-5, 3.84 s requests, cap
    32) through the fused block-diagonal kernel — the BENCH.md
    throughput claim, driver-audited. Baseline: the reference's
    best-case SERIAL rate on its headline GPU (RTX 4090, 140 ms/request
    → 7.14 req/s; the reference runs one gunicorn worker and never
    batches, main.py:1204-1215 / entrypoint.sh:19)."""
    import time

    from wis_tpu.runtime.batcher import ASRRequest

    eng = engines[("large", 5)]
    rng = np.random.default_rng(0)
    reqs = [
        ASRRequest(
            audio=(rng.standard_normal(int(3.84 * 16000)) * 0.05).astype(
                np.float32
            ),
            model="large",
            beam_size=5,
            max_tokens=32,
        )
        for _ in range(4)
    ]
    for _ in range(WARMUP):
        eng.transcribe_coalesced(reqs)
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        eng.transcribe_coalesced(reqs)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    req_s = 4.0 / med
    base = 1.0 / 0.140
    print(
        json.dumps(
            {
                "metric": "large-v2_beam5_batch4_throughput_req_s",
                "value": round(req_s, 2),
                "unit": "req_s",
                "vs_baseline": round(req_s / base, 3),
                "baseline": "7.14 req/s serial RTX4090 (140 ms/req)",
                "p50_batch_ms": round(med * 1000, 1),
                "all_ms": [round(t * 1000, 1) for t in times],
                "token_budget": 32,
            }
        ),
        flush=True,
    )


def main() -> None:
    engines = {}
    for metric, model, beam, fixture, synth_ms, budget, base_x, base_hw in CONFIGS:
        key = (model, beam)
        if key not in engines:
            engines[key] = _engine(model, beam)
        eng = engines[key]
        audio = _load_fixture(fixture, synth_ms)
        audio_ms = audio.shape[0] / 16.0

        for _ in range(WARMUP):
            eng.transcribe(audio, model=model, beam_size=beam, max_tokens=budget)
        times = []
        for _ in range(RUNS):
            res = eng.transcribe(
                audio, model=model, beam_size=beam, max_tokens=budget
            )
            times.append(res.infer_time_ms)
        p50 = statistics.median(times)
        speedup = audio_ms / p50
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(speedup, 2),
                    "unit": "x_realtime",
                    "vs_baseline": round(speedup / base_x, 3),
                    "baseline": f"{base_x}x {base_hw}",
                    "p50_infer_ms": round(p50, 1),
                    "all_ms": [round(t, 1) for t in times],
                    "token_budget": budget,
                }
            ),
            flush=True,
        )

    _throughput_row(engines)


if __name__ == "__main__":
    sys.exit(main())
