"""Fixed-cost decomposition: mel / encoder / cross-KV / prefill staged
programs on the real TPU (batch 1). Subtract ~26 ms RTT from each."""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from wis_tpu.audio.mel import _log_mel_jax
from wis_tpu.models.whisper.config import WHISPER_CONFIGS
from wis_tpu.models.whisper.model import DecoderCache, cross_kv, encode, prefill
from wis_tpu.models.whisper.weights import random_params
from wis_tpu.ops.quant import quantize_whisper_params


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "medium"
    cfg = WHISPER_CONFIGS[model]
    params = quantize_whisper_params(
        random_params(cfg, seed=0, dtype=jnp.bfloat16)
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((1, 480000)) * 3000).astype(np.int16)
    )
    prompt = jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32)

    # every stage fetches a TINY slice (d2h ≈ 200 MB/s would skew big
    # outputs by tens of ms)
    @jax.jit
    def p_mel(params, audio):
        return _log_mel_jax(audio.astype(jnp.float32) / 32768.0,
                            n_mels=cfg.n_mels)[0, 0, :4]

    @jax.jit
    def p_enc(params, audio):
        mel = _log_mel_jax(audio.astype(jnp.float32) / 32768.0,
                           n_mels=cfg.n_mels)
        return encode(params, mel, cfg)[0, 0, :4]

    @jax.jit
    def p_kv(params, audio):
        mel = _log_mel_jax(audio.astype(jnp.float32) / 32768.0,
                           n_mels=cfg.n_mels)
        xa = encode(params, mel, cfg)
        k, v = cross_kv(params, xa, cfg)
        return k[0, 0, 0, 0, :4]

    @jax.jit
    def p_prefill(params, audio):
        mel = _log_mel_jax(audio.astype(jnp.float32) / 32768.0,
                           n_mels=cfg.n_mels)
        xa = encode(params, mel, cfg)
        xa_kv = cross_kv(params, xa, cfg)
        cache = DecoderCache.zeros(cfg, 1, 128, jnp.bfloat16)
        logits, cache = prefill(params, prompt, cache, xa_kv, cfg)
        return logits[:, -1, :4]

    stages = [("mel", p_mel), ("mel+enc", p_enc), ("+cross_kv", p_kv),
              ("+prefill", p_prefill)]
    for name, fn in stages:
        t0 = time.perf_counter()
        np.asarray(fn(params, audio))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fn(params, audio))
            times.append((time.perf_counter() - t0) * 1000)
        med = statistics.median(times)
        print(f"{model} {name}: {med:.1f} ms (−26 RTT ≈ {med-26:.1f} on-dev; "
              f"compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
