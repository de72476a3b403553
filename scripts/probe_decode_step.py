"""Compose-probe: per-step beam-decode cost on the real TPU.

Measures an N-step scan of the production decode step body (decode_step +
beam bookkeeping analog) for ancestry vs physical-reorder cache handling,
with a forced non-identity parent permutation every step (the worst case
the physical path pays ~1.7 ms/step for on large-v2 — BENCH.md).

Protocol per CLAUDE.md: single program, fetch-sync via np.asarray of a
tiny output, subtract the ~26 ms tunnel round-trip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from wis_tpu.models.whisper.config import WHISPER_CONFIGS
from wis_tpu.models.whisper.model import DecoderCache, decode_step
from wis_tpu.models.whisper.weights import random_params
from wis_tpu.ops.quant import quantize_whisper_params

STEPS = 16
K = int(__import__("os").environ.get("PROBE_K", 5))
B = int(__import__("os").environ.get("PROBE_B", 1))
BK = B * K
CACHE_LEN = 100  # prompt 4 + bucket 96 (the bench operating point)
S = 1500


def build(cfg, mode: str):
    """mode: 'ancestry' | 'physical'"""

    @jax.jit
    def run(params, xa_kv, cache, anc):
        # fixed non-identity rotation as the worst-case parent pattern
        parent = (jnp.arange(K, dtype=jnp.int32)[None, :] + 1) % K  # (B, K)
        parent = jnp.broadcast_to(parent, (B, K))

        def body(carry, _):
            cache, anc, tok = carry
            if mode == "ancestry":
                anc2 = jax.lax.dynamic_update_index_in_dim(
                    anc,
                    jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)),
                    cache.pos,
                    axis=2,
                )
                logits, cache = decode_step(params, tok, cache, xa_kv, cfg, anc=anc2)
                anc2 = jnp.take_along_axis(anc2, parent[..., None], axis=1)
            else:
                logits, cache = decode_step(params, tok, cache, xa_kv, cfg)
                gp = (jnp.arange(B, dtype=jnp.int32)[:, None] * K + parent).reshape(BK)
                cache = cache.reorder(gp)
                anc2 = anc
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (cache, anc2, tok), None

        (cache, anc, tok), _ = jax.lax.scan(
            body, (cache, anc, jnp.zeros((BK,), jnp.int32)), None, length=STEPS
        )
        return tok[:4]  # tiny fetch

    return run


def main():
    cfg = WHISPER_CONFIGS["large-v2"]
    params = random_params(cfg, seed=0, dtype=jnp.bfloat16)
    params = quantize_whisper_params(params)
    dh = cfg.n_text_state // cfg.n_text_head
    rng = np.random.default_rng(0)
    xa_k = jnp.asarray(
        rng.standard_normal((cfg.n_text_layer, B, cfg.n_text_head, dh, S)) * 0.1,
        jnp.bfloat16,
    )
    xa_v = jnp.asarray(
        rng.standard_normal((cfg.n_text_layer, B, cfg.n_text_head, dh, S)) * 0.1,
        jnp.bfloat16,
    )
    cache = DecoderCache.zeros(cfg, BK, CACHE_LEN, jnp.bfloat16)
    cache = DecoderCache(cache.k, cache.v, jnp.int32(4))  # as after prefill
    anc = jnp.where(
        jnp.arange(CACHE_LEN)[None, None, :] < 4,
        jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, CACHE_LEN)),
        -1,
    )

    for mode in sys.argv[1:] or ["ancestry", "physical"]:
        fn = build(cfg, mode)
        t0 = time.perf_counter()
        out = np.asarray(fn(params, (xa_k, xa_v), cache, anc))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = np.asarray(fn(params, (xa_k, xa_v), cache, anc))
            times.append((time.perf_counter() - t0) * 1000)
        med = sorted(times)[len(times) // 2]
        per_step = (med - 26.0) / STEPS
        print(
            f"{mode}: compile {compile_s:.1f}s, median {med:.1f} ms "
            f"({STEPS} steps) -> {per_step:.2f} ms/step  raw={['%.1f' % t for t in times]}"
        )


if __name__ == "__main__":
    main()
