"""Driver benchmark — whisper realtime multiples across the reference's
published table (BASELINE.md / reference README.md:69-103).

Prints one compact JSON line per config, HEADLINE FIRST, then a final
summary line `{"metric": <headline metric>, "value": ..., "rows": [...]}`
so BOTH capture styles work: a driver that parses the LAST line gets the
headline metric/value/vs_baseline (plus every row in `rows`), and one
that reads a bounded tail still sees whole rows (each row stays well
under 250 chars; raw per-run timings go to stderr, never stdout):

  1. large-v2 beam-5, 3.84 s  — vs RTX 4090 27x   (the headline row)
  2. large-v2 beam-5, 10.7 s  — vs H100 20x       (best published)
  3. large-v2 beam-5, 29.2 s  — vs H100 23x
  4. medium  beam-1, 3.84 s  — vs RTX 4090 45x
  5. medium  beam-1, 29.2 s  — vs RTX 4090 77x
  6. large-v2 beam-5 batch-4 coalesced throughput (req/s) — vs the
     reference's best-case serial rate (7.14 req/s, 140 ms/req 4090)
  7. base beam-1, 180 s chunked long-form — vs RTX 4090 648x
     (reference README.md:93: 277 ms for 3 min; exercises chunk_iter →
     window batching → LCS merge, the whole >30 s subsystem)
  8. XTTS streaming TTS: realtime factor (audio-seconds per wall-second)
     + time-to-first-chunk — the reference publishes no TTS RTF
     (BASELINE.md), so the row pins this repo's own floor; vs_baseline
     is RTF against the 1.0 realtime bar a streaming TTS must clear

Protocol mirrors the reference's headline measurement: the API-reported
`infer_time` span (features + encoder + decode + text), model
load/compile excluded, p50 of repeated runs after warmup (reference
main.py:1218-1224, README.md:69).

Span accounting: the reference times from audio-in-server-RAM with the
GPU one PCIe hop away (main.py:577-759) — its interconnect moves this
table's inputs in microseconds. This dev harness reaches its TPU
through a network tunnel whose round-trip (25-60 ms) and bandwidth
(6-60 MB/s) vary BY SESSION (measured; BENCH.md round 4), so a
single-shot wall clock here times the tunnel, not the server. Each ASR
row therefore reports as `value` the reference-comparable span:
steady-state on-device program latency (pipelined dispatch, live-RTT
subtracted — `WhisperEngine.steady_state_latency`, verified linear in
K within 1 ms) PLUS the host-side stages (feature prep + text decode)
from the single-shot runs. The raw tunnel-in single-shot p50 stays in
every row (`single_shot_ms`) next to the live `rtt_ms`, and the
session's tunnel calibration rides the summary line.

Weights are seeded-random when no checkpoint is present (latency is
weight-independent); per-row decode budgets are realistic transcript
lengths for each fixture (~2-4 tokens/s of speech + EOT) since random
weights never emit EOT. With real weights the same program exits early
at EOT, so the caps do not understate production latency.
"""

from __future__ import annotations

import contextlib
import gc
import json
import statistics
import sys

import numpy as np

RUNS = 10
WARMUP = 2

#: every emitted row, in print order (headline first) — replayed in the
#: final summary line so a last-line parse carries the whole table
_ROWS: list[dict] = []


def _emit(row: dict, raw: dict | None = None) -> None:
    """Print one compact row to stdout and stash it for the summary.

    Per-run timing arrays and other bulky diagnostics go to stderr only:
    the driver captures a bounded stdout tail, and round 3 proved that
    ~200-char `all_ms` arrays push the headline row out of the capture
    window (VERDICT round 3, Weak #1)."""
    _ROWS.append(row)
    print(json.dumps(row), flush=True)
    if raw:
        print(json.dumps({"metric": row["metric"], **raw}), file=sys.stderr, flush=True)


_TUNNEL: dict = {}


def _calibrate_tunnel() -> None:
    """Measure the axon tunnel's round-trip and h2d bandwidth right now.

    The TPU sits behind a network tunnel whose bandwidth varies by
    session (measured 11-60 MB/s on identical data across days); rows
    that move megabytes of audio (the 180 s chunked row ships 5.76 MB
    of PCM per request) swing with it. Recording the conditions next to
    the numbers keeps the artifact interpretable — bare-metal serving
    pays neither cost (PCIe ≈ 16 GB/s)."""
    import time

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    tiny = np.zeros(8, np.int32)
    _ = np.asarray(f(tiny))  # warm
    rtts = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f(tiny))
        rtts.append((time.perf_counter() - t0) * 1000)
    s = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    big = np.random.default_rng(0).integers(
        -20000, 20000, 180 * 16000).astype(np.int16)
    _ = np.asarray(s(big))  # warm
    bws = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(s(big))
        dt = time.perf_counter() - t0 - statistics.median(rtts) / 1000
        bws.append(big.nbytes / max(dt, 1e-3) / 1e6)
    _TUNNEL.update(
        rtt_ms=round(statistics.median(rtts), 1),
        h2d_MBps=round(statistics.median(bws), 1),
    )
    print(json.dumps({"tunnel": _TUNNEL}), file=sys.stderr, flush=True)


def _summary() -> None:
    """Final line = headline metric/value/vs_baseline + every row, compact.
    A driver that parses only the LAST stdout line gets the headline
    number; `rows` carries the full table in <800 chars."""
    if not _ROWS:
        return
    head = _ROWS[0]
    print(
        json.dumps(
            {
                "metric": head["metric"],
                "value": head["value"],
                "unit": head["unit"],
                "vs_baseline": head["vs_baseline"],
                "tunnel": _TUNNEL,
                "rows": [
                    {
                        "metric": r["metric"],
                        "value": r["value"],
                        "vs_baseline": r["vs_baseline"],
                    }
                    for r in _ROWS
                ],
            }
        ),
        flush=True,
    )


@contextlib.contextmanager
def _no_gc():
    """Standard benchmark hygiene (what timeit does): collect once, then
    keep the collector off during the timed loop. On this single-core
    host a mid-loop collection of remote device-buffer wrappers issues
    deletion RPCs that land inside the NEXT request's wall time —
    observed as 100-750 ms p50 inflation (BENCH.md, long-form row)."""
    gc.collect()
    was_enabled = gc.isenabled()
    gc.disable()
    try:
        yield
    finally:
        if was_enabled:
            gc.enable()
        gc.collect()

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
            audio = load_audio(f.read())
    except Exception:
        rng = np.random.default_rng(0)
        n = int(synth_ms * 16)  # 16 kHz
        audio = (rng.standard_normal(n) * 0.05).astype(np.float32)
    # int16 once at load time: the engine accepts integer PCM natively
    # (the device program consumes int16), so requests skip the
    # float→int16 passes — measurable on this single-core host
    return np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)


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
    times, hosts = [], []
    with _no_gc():
        for _ in range(RUNS):
            t0 = time.perf_counter()
            out = eng.transcribe_coalesced(reqs)
            times.append(time.perf_counter() - t0)
            t = out[0].timings
            hosts.append(
                out[0].infer_time_ms - t.get("asr_dispatch", 0.0)
            )
        ss = eng.steady_state_latency(
            reqs[0].audio, model="large", beam_size=5, max_tokens=32,
            batch=4,
        )
    shot = statistics.median(times) * 1000
    med = (ss["device_ms"] + statistics.median(hosts)) / 1000
    req_s = 4.0 / med
    base = 1.0 / 0.140
    _emit(
        {
            "metric": "large-v2_beam5_batch4_throughput_req_s",
            "value": round(req_s, 2),
            "unit": "req_s",
            "vs_baseline": round(req_s / base, 3),
            "span": "pipelined",
            "vs_baseline_single_shot": round((4000.0 / shot) / base, 3),
            "baseline": "7.14 req/s serial RTX4090 (140 ms/req)",
            "p50_batch_ms": round(med * 1000, 1),
            "single_shot_ms": round(shot, 1),
            "rtt_ms": round(ss["rtt_ms"], 1),
            "token_budget": 32,
        },
        raw={"all_ms": [round(t * 1000, 1) for t in times],
             "steady": {k: round(v, 2) for k, v in ss.items()}},
    )


def _longform_row() -> None:
    """180 s chunked long-form (base beam-1) — the reference's most
    dramatic published number: 277 ms · 648× on the RTX 4090
    (reference README.md:93). Runs the full >30 s subsystem: chunk_iter
    (22 s windows, 4 s strides) → padded window batches through the
    batch buckets → LCS merge."""
    import statistics as stats
    import time

    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    settings = APISettings(
        whisper_model_default="base",
        beam_size=1,
        long_beam_size=1,  # the row fixes beam 1 (reference protocol)
        # all 13 chunk windows decode as ONE batch-13 dispatch: the
        # audio crosses the tunnel once as a single contiguous int16
        # segment (windows are extracted on device, decoding/fused.py
        # chunked=True) and every saved dispatch is a full tunnel
        # round-trip. Base-13 fits the fused kernel's scoped VMEM
        # (13.9 MB block-diagonal cross-KV < the 15 MB gate) so the
        # engine routes it to the fused path; measured head-to-head
        # the fused and XLA decode loops are within noise at this
        # scale (181.3 vs 181.9 ms p50 end-to-end, BENCH.md), and
        # wider/larger-model batches fall back to XLA automatically
        # via fused_step_vmem_bytes (the reference's
        # concurrent_gpu_chunks knob, tuned the same way its GPU
        # configs are)
        batch_buckets=["1", "13"],
        concurrent_gpu_chunks=13,
    )
    eng = WhisperEngine(ModelRegistry(settings), settings)
    # 180 s fixture: loop the 29.2 s reference clip (falls back to
    # noise); content is irrelevant to latency with fixed budgets
    base = _load_fixture("30sec.flac", 29248)
    audio = np.tile(base, 7)[: 180 * 16000]
    audio_ms = audio.shape[0] / 16.0
    budget = 64  # per 22 s window ≈ 3 tok/s of speech + EOT

    runs, warmup = 5, 1
    for _ in range(warmup):
        eng.transcribe(audio, model="base", beam_size=1, max_tokens=budget)
    times, hosts = [], []
    with _no_gc():
        for _ in range(runs):
            t0 = time.perf_counter()
            res = eng.transcribe(
                audio, model="base", beam_size=1, max_tokens=budget
            )
            times.append((time.perf_counter() - t0) * 1000)
            hosts.append(
                res.infer_time_ms - res.timings.get("asr_dispatch", 0.0)
            )
        ss = eng.steady_state_latency(
            audio, model="base", beam_size=1, max_tokens=budget, iters=4
        )
    shot = stats.median(times)
    p50 = ss["device_ms"] + stats.median(hosts)
    speedup = audio_ms / p50
    _emit(
        {
            "metric": "base_beam1_180s_realtime_x",
            "value": round(speedup, 2),
            "unit": "x_realtime",
            "vs_baseline": round(speedup / 648.0, 3),
            "span": "pipelined",
            "vs_baseline_single_shot": round((audio_ms / shot) / 648.0, 3),
            "baseline": "648x RTX4090 (277 ms / 180 s)",
            "p50_infer_ms": round(p50, 1),
            "single_shot_ms": round(shot, 1),
            "rtt_ms": round(ss["rtt_ms"], 1),
            "token_budget_per_window": budget,
            "windows": 13,
        },
        raw={"all_ms": [round(t, 1) for t in times],
             "steady": {k: round(v, 2) for k, v in ss.items()}},
    )


def _tts_row() -> None:
    """XTTS streaming synthesis: realtime factor + time-to-first-chunk
    at stream_chunk_size 20 (reference xtts/main.py:201-211 streams the
    same chunk size). Random weights — latency is weight-independent;
    the reference publishes no TTS RTF, so vs_baseline is measured
    against the 1.0 realtime bar.

    min_audio_tokens pins a realistic utterance length the way the ASR
    rows pin token budgets: random weights sample the stop token almost
    immediately, which would leave the measurement dominated by prefill
    + first-chunk fixed costs. The fixture sentence (~95 chars ≈ 6.5 s
    of speech at XTTS's 1024-sample code stride @ 22.05 kHz ≈ 46.4 ms
    per token ≈ 140 tokens) decodes the same number of chunks a real
    checkpoint would speak; with real weights the default floor of 0
    leaves behavior untouched."""
    import statistics as stats
    import time

    from wis_tpu.models.xtts.model import XTTSModel

    model = XTTSModel()
    rng = np.random.default_rng(0)
    latent = rng.standard_normal(
        (model.cfg.cond_len, model.cfg.gpt.d_model)
    ).astype(np.float32) * 0.05
    speaker = rng.standard_normal(model.cfg.vocoder.cond_dim).astype(
        np.float32
    )
    sentence = (
        "The quick brown fox jumps over the lazy dog while the tea "
        "kettle whistles in the kitchen."
    )

    def stream_once():
        t0 = time.perf_counter()
        ttfb = None
        audio_s = 0.0
        for chunk in model.inference_stream(
            sentence, "en", latent, speaker, stream_chunk_size=20, seed=1,
            min_audio_tokens=140,
        ):
            if ttfb is None:
                ttfb = (time.perf_counter() - t0) * 1000
            audio_s += chunk.shape[-1] / 24000.0
        wall = time.perf_counter() - t0
        return ttfb, audio_s, wall

    stream_once()  # compile warmup
    ttfbs, rtfs = [], []
    with _no_gc():
        for _ in range(5):
            ttfb, audio_s, wall = stream_once()
            if ttfb is not None and wall > 0:
                ttfbs.append(ttfb)
                rtfs.append(audio_s / wall)
    rtf = stats.median(rtfs) if rtfs else 0.0
    _emit(
        {
            "metric": "xtts_stream_rtf",
            "value": round(rtf, 3),
            "unit": "audio_s_per_wall_s",
            "vs_baseline": round(rtf / 1.0, 3),
            "baseline": "1.0 realtime bar (no published ref RTF)",
            "ttfb_p50_ms": round(stats.median(ttfbs), 1) if ttfbs else None,
            "stream_chunk_size": 20,
            "min_audio_tokens": 140,
        },
        raw={"all_rtf": [round(r, 3) for r in rtfs]},
    )


def main() -> None:
    _calibrate_tunnel()
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
        times, hosts = [], []
        with _no_gc():
            for _ in range(RUNS):
                res = eng.transcribe(
                    audio, model=model, beam_size=beam, max_tokens=budget
                )
                times.append(res.infer_time_ms)
                hosts.append(
                    res.infer_time_ms - res.timings.get("asr_dispatch", 0.0)
                )
            ss = eng.steady_state_latency(
                audio, model=model, beam_size=beam, max_tokens=budget
            )
        shot = statistics.median(times)
        p50 = ss["device_ms"] + statistics.median(hosts)
        speedup = audio_ms / p50
        _emit(
            {
                "metric": metric,
                "value": round(speedup, 2),
                "unit": "x_realtime",
                "vs_baseline": round(speedup / base_x, 3),
                # span semantics tag + a single-shot-derived comparison so
                # round-over-round artifacts stay comparable across the
                # round-4 protocol change (ADVICE r4): "pipelined" = the
                # steady-state device span + host stages; the raw
                # tunnel-in single-shot wall keeps its own vs_baseline
                "span": "pipelined",
                "vs_baseline_single_shot": round(
                    (audio_ms / shot) / base_x, 3
                ),
                "baseline": f"{base_x}x {base_hw}",
                "p50_infer_ms": round(p50, 1),
                "single_shot_ms": round(shot, 1),
                "rtt_ms": round(ss["rtt_ms"], 1),
                "token_budget": budget,
            },
            raw={"all_ms": [round(t, 1) for t in times],
                 "steady": {k: round(v, 2) for k, v in ss.items()}},
        )

    _throughput_row(engines)
    _longform_row()
    _tts_row()
    _summary()


if __name__ == "__main__":
    sys.exit(main())
