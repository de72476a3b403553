"""End-to-end coalesced-batch throughput on the real TPU.

Drives engine.transcribe_coalesced with batch-4 of 3.84 s requests
(large, beam 5 — the BENCH.md throughput row) and reports steady-state
req/s. Compiles the production B=4 fused program into the persistent
cache on first run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from wis_tpu.audio.mel import SAMPLE_RATE
from wis_tpu.runtime.batcher import ASRRequest
from wis_tpu.runtime.engine import WhisperEngine
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.settings import APISettings


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large"
    beam = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    fused = sys.argv[5] if len(sys.argv) > 5 else "auto"
    settings = APISettings(
        whisper_model_default=model,
        batch_buckets=["1", "2", "4"],
        warmup_iterations=0,
        fused_decode=fused,
    )
    eng = WhisperEngine(ModelRegistry(settings), settings)
    rng = np.random.default_rng(0)
    reqs = [
        ASRRequest(
            audio=(rng.standard_normal(int(3.84 * SAMPLE_RATE)) * 0.05)
            .astype(np.float32),
            model=model,
            beam_size=beam,
            max_tokens=cap,
        )
        for _ in range(batch)
    ]

    t0 = time.perf_counter()
    eng.transcribe_coalesced(reqs)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        eng.transcribe_coalesced(reqs)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(
        f"coalesced batch-{batch} {model} beam-{beam} cap-{cap} "
        f"fused-{fused}: {med*1000:.1f} ms/batch = {batch/med:.2f} req/s "
        f"(raw s {['%.3f' % t for t in times]})"
    )


if __name__ == "__main__":
    main()
