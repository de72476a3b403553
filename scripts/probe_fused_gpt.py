"""A/B probe: XTTS GPT chunk decode, fused Pallas step vs XLA scan.

Times the full decode_vocode streaming program (GPT chunk + vocoder, one
dispatch per 20-token chunk) on the real TPU for both paths in one
process. Steady-state chunk time = total wall for N dependent chunk
launches (state chains on device) / N, fetch-synced via np.asarray on
the final packed output (block_until_ready does not reliably block
through the tunnel — docs/NEXT.md).

Usage: python scripts/probe_fused_gpt.py [n_chunks]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SENTENCE = (
    "The quick brown fox jumps over the lazy dog while the tea "
    "kettle whistles in the kitchen."
)


def run(fused: bool):
    os.environ["XTTS_FUSED"] = "1" if fused else "0"
    import jax
    import jax.numpy as jnp

    from wis_tpu.models.xtts.model import XTTSModel

    model = XTTSModel()
    assert model._fused == fused, (model._fused, fused)
    rng = np.random.default_rng(0)
    latent = rng.standard_normal(
        (model.cfg.cond_len, model.cfg.gpt.d_model)
    ).astype(np.float32) * 0.05
    speaker = rng.standard_normal(model.cfg.vocoder.cond_dim).astype(
        np.float32
    )

    def stream(n):
        t0 = time.perf_counter()
        times = [t0]
        it = model.inference_stream(
            SENTENCE, "en", latent, speaker, stream_chunk_size=20, seed=1,
            min_audio_tokens=20 * n,
        )
        for i, _ in enumerate(it):
            times.append(time.perf_counter())
            if i + 1 >= n:
                break
        return times

    stream(2)  # compile warmup
    times = stream(N)
    deltas = [
        (b - a) * 1000 for a, b in zip(times[1:], times[2:])
    ]  # skip first chunk (prefill+ttfb)
    label = "fused" if fused else "xla"
    print(
        f"{label}: steady chunks ms = {[round(d, 1) for d in deltas]}"
        f"  median {np.median(deltas):.1f}"
    )
    return float(np.median(deltas))


if __name__ == "__main__":
    f = run(True)
    x = run(False)
    print(f"fused {f:.1f} ms/chunk vs xla {x:.1f} ms/chunk -> "
          f"{x / f:.2f}x")
