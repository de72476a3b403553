"""Time the REAL inference_stream generator per chunk on the TPU.

Prints per-chunk wall deltas, total RTF, and TTFB for 3 streaming runs
of the bench sentence (chunk 20, min_audio_tokens 140). Used to
attribute streaming cost between device compute, tunnel fetches, and
host work — per-chunk wall should sit near max(device chunk time,
~27 ms tunnel RTT) now that chunks are speculatively dispatched and
fetched as one packed array.

Run: python scripts/probe_tts_real.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from wis_tpu.models.xtts.model import XTTSModel


def main():
    model = XTTSModel()
    g = model.cfg.gpt
    rng = np.random.default_rng(0)
    latent = rng.standard_normal((model.cfg.cond_len, g.d_model)).astype(
        np.float32
    ) * 0.05
    speaker = rng.standard_normal(model.cfg.vocoder.cond_dim).astype(np.float32)
    sentence = (
        "The quick brown fox jumps over the lazy dog while the tea "
        "kettle whistles in the kitchen."
    )

    for run in range(3):
        t0 = time.perf_counter()
        marks = []
        n = 0
        audio = 0.0
        for chunk in model.inference_stream(
            sentence, "en", latent, speaker, stream_chunk_size=20, seed=1,
            min_audio_tokens=140,
        ):
            marks.append((time.perf_counter() - t0) * 1e3)
            n += 1
            audio += len(chunk) / model.cfg.vocoder.sample_rate
        wall = time.perf_counter() - t0
        deltas = [round(marks[0], 1)] + [
            round(marks[i] - marks[i - 1], 1) for i in range(1, len(marks))
        ]
        print(
            f"run {run}: chunks={n} audio={audio:.2f}s wall={wall:.2f}s "
            f"rtf={audio / wall:.3f} per-chunk(ms)={deltas}"
        )


if __name__ == "__main__":
    main()
