"""Decompose a request's fixed (mel+encode+prefill+RTT) vs per-token
cost by sweeping the runtime token cap inside one compiled program
(decode bucket 96 covers caps up to 96 — no recompiles).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "medium"
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from wis_tpu.audio.ingest import load_audio
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    settings = APISettings(
        whisper_model_default=model, beam_size=beam, long_beam_size=beam,
        batch_buckets=["1", "2", "4", "8"],
    )
    eng = WhisperEngine(ModelRegistry(settings), settings)
    audio = load_audio(open("/root/reference/client/3sec.flac", "rb").read())

    caps = [2, 12, 22, 32]
    for _ in range(2):
        eng.transcribe(audio, model=model, beam_size=beam, max_tokens=32)
    pts = []
    for cap in caps:
        times = []
        for _ in range(8):
            r = eng.transcribe(audio, model=model, beam_size=beam, max_tokens=cap)
            times.append(r.infer_time_ms)
        p50 = statistics.median(times)
        pts.append((cap, p50))
        print(f"cap={cap}: p50 {p50:.1f} ms  raw {['%.1f' % t for t in times]}",
              flush=True)
    xs = np.array([p[0] for p in pts], float)
    ys = np.array([p[1] for p in pts], float)
    slope, icept = np.polyfit(xs, ys, 1)
    print(f"{model} beam-{beam}: {slope:.2f} ms/token, fixed {icept:.1f} ms "
          f"(incl ~26 ms tunnel RTT)")


if __name__ == "__main__":
    main()
