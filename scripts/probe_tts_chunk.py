"""Decompose the XTTS streaming chunk: full decode_vocode_fused program
vs vocoder-only vs GPT-only, plus the production stream's steady-state
wall per chunk. All compose-probed (N-dispatch chains, fetch-synced,
RTT-subtracted) per CLAUDE.md."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from wis_tpu.models.xtts.model import XTTSModel

CHUNK = 20


def rtt_ms():
    f = jax.jit(lambda x: x + 1)
    t = np.zeros(8, np.int32)
    np.asarray(f(t))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(t))
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def main():
    model = XTTSModel()
    rng = np.random.default_rng(0)
    latent = (rng.standard_normal(
        (model.cfg.cond_len, model.cfg.gpt.d_model)) * 0.05).astype(np.float32)
    speaker = rng.standard_normal(model.cfg.vocoder.cond_dim).astype(np.float32)
    sentence = ("The quick brown fox jumps over the lazy dog while the tea "
                "kettle whistles in the kitchen.")
    rtt = rtt_ms()
    print(f"rtt {rtt:.1f} ms", flush=True)

    # (a) production stream steady state
    def stream_once():
        t0 = time.perf_counter()
        ttfb = None
        chunks = 0
        for c in model.inference_stream(
            sentence, "en", latent, speaker, stream_chunk_size=CHUNK, seed=1,
            min_audio_tokens=140,
        ):
            if ttfb is None:
                ttfb = (time.perf_counter() - t0) * 1000
            chunks += 1
        wall = (time.perf_counter() - t0) * 1000
        return ttfb, chunks, wall

    stream_once()  # warm
    walls, ttfbs, nchunks = [], [], 0
    for _ in range(5):
        ttfb, chunks, wall = stream_once()
        ttfbs.append(ttfb)
        walls.append(wall)
        nchunks = chunks
    wall = float(np.median(walls))
    print(
        f"stream: {nchunks} chunks, wall {wall:.1f} ms, ttfb "
        f"{np.median(ttfbs):.1f} ms -> per-chunk "
        f"{(wall - np.median(ttfbs)) / max(1, nchunks - 1):.1f} ms "
        f"(post-first)",
        flush=True,
    )

    # (b) vocoder-only at the chunk's frame count
    left = model.cfg.left_context_frames
    frames = CHUNK + left
    voc = model._program("vocoder", frames=frames)
    voc_params = model.vocoder_params
    lat = jnp.asarray(
        rng.standard_normal((1, frames, model.cfg.vocoder.in_dim)) * 0.05,
        model.dtype,
    )
    spk = jnp.asarray(speaker[None], model.dtype)
    np.asarray(voc(voc_params, lat, spk))
    for n in (8,):
        t0 = time.perf_counter()
        outs = [voc(voc_params, lat, spk) for _ in range(n)]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) * 1000 - rtt
        print(f"vocoder-only: {dt / n:.2f} ms/chunk ({n}-chain)", flush=True)


if __name__ == "__main__":
    main()
