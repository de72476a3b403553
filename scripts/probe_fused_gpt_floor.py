"""Decompose the fused XTTS GPT step: bare-kernel floor vs full step.

Times (a) a 20-step scan of ONLY the fused kernel (fixed embedding, no
head/sampling) and (b) the production decode chunk body, both as single
dispatches fetch-synced on a tiny output. The gap is the per-token XLA
epilogue (double LN + head matmul + sampling + scan glue) — the case
for (or against) an in-kernel sampling head.

Usage: python scripts/probe_fused_gpt_floor.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from wis_tpu.models.xtts.gpt import (
    GPTConfig,
    build_prefill,
    flatten_gpt_cache,
    random_gpt,
    run_decode_chunk_fused,
)
from wis_tpu.ops.fused_gpt import build_fused_gpt_step, pack_gpt
from wis_tpu.ops.quant import quantize_gpt_params
from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

CHUNK = 20
T_PAD = 768  # the bucket-64 production cache length

cfg = GPTConfig()
params = quantize_gpt_params(random_gpt(cfg, seed=0, dtype=jnp.bfloat16))
packed = pack_gpt(params, cfg)
step_fn = build_fused_gpt_step(cfg, bk=1, t_cache=T_PAD)

prefill = build_prefill(cfg, batch=1, cond_len=32, text_len=64, max_len=702)
cond = jnp.zeros((1, 32, cfg.d_model), jnp.bfloat16)
text = jnp.zeros((1, 64), jnp.int32)
_, cache = prefill(params, cond, text)
kc, vc = jax.jit(lambda c: flatten_gpt_cache(c, T_PAD))(cache)
pos0 = cache.pos
BKT = T_PAD


@jax.jit
def bare(packed, x0, kc, vc, pos0):
    def step(carry, _):
        x, kc, vc, pos = carry
        col = jax.lax.broadcasted_iota(jnp.int32, (1, BKT), 1)
        sel = (col < pos).astype(jnp.float32)
        xh, kc, vc = step_fn(packed, x, kc, vc, sel, pos)
        return (xh * 0.01, kc, vc, pos + 1), None

    (x, kc, vc, pos), _ = jax.lax.scan(
        step, (x0, kc, vc, pos0), None, length=CHUNK
    )
    return x[:, :8]


@jax.jit
def full(params, packed, kc, vc, pos0):
    tokens, latents, kc, vc, pos, history, hist_len, done = (
        run_decode_chunk_fused(
            params, packed, step_fn,
            jnp.full((1,), cfg.start_audio_token, jnp.int32),
            kc, vc, pos0,
            jnp.zeros((1, cfg.max_audio_tokens), jnp.int32), jnp.int32(0),
            jax.random.PRNGKey(0), jnp.float32(0.8), jnp.int32(50),
            jnp.float32(0.85), jnp.float32(2.0), jnp.bool_(True),
            jnp.int32(CHUNK),
            cfg=cfg, chunk=CHUNK, batch=1,
        )
    )
    return tokens


def timeit(fn, *args, n=8):
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts)), ts


x0 = jnp.zeros((1, cfg.d_model), jnp.float32)
b, ts_b = timeit(bare, packed, x0, kc, vc, pos0)
f, ts_f = timeit(full, params, packed, kc, vc, pos0)
rtt = 26.0  # measured tunnel round-trip (docs/NEXT.md)
print(f"bare kernel scan: {b:.1f} ms/chunk ({(b - rtt) / CHUNK:.2f} ms/tok on-device)  {[round(t,1) for t in ts_b]}")
print(f"full chunk body:  {f:.1f} ms/chunk ({(f - rtt) / CHUNK:.2f} ms/tok on-device)  {[round(t,1) for t in ts_f]}")
print(f"epilogue share:   {(f - b) / CHUNK:.2f} ms/tok")


# ---- round-4 variants: fused sampling head + cache-length buckets ---- #
from wis_tpu.ops.fused_gpt_head import build_fused_gpt_head, pack_head

head_fn = build_fused_gpt_head(cfg, dtype=jnp.bfloat16)
head_packed = pack_head(params, cfg, jnp.bfloat16)


@jax.jit
def full_head(params, packed, head_packed, kc, vc, pos0):
    tokens, *_ = run_decode_chunk_fused(
        params, packed, step_fn,
        jnp.full((1,), cfg.start_audio_token, jnp.int32),
        kc, vc, pos0,
        jnp.zeros((1, cfg.max_audio_tokens), jnp.int32), jnp.int32(0),
        jax.random.PRNGKey(0), jnp.float32(0.8), jnp.int32(50),
        jnp.float32(0.85), jnp.float32(2.0), jnp.bool_(True),
        jnp.int32(CHUNK), head_packed,
        cfg=cfg, chunk=CHUNK, batch=1, head_fn=head_fn,
    )
    return tokens


T_SMALL = 256
step_small = build_fused_gpt_step(cfg, bk=1, t_cache=T_SMALL)
kc_s, vc_s = jax.jit(lambda c: flatten_gpt_cache(c, T_SMALL))(cache)


@jax.jit
def full_head_small(params, packed, head_packed, kc, vc, pos0):
    tokens, *_ = run_decode_chunk_fused(
        params, packed, step_small,
        jnp.full((1,), cfg.start_audio_token, jnp.int32),
        kc, vc, pos0,
        jnp.zeros((1, cfg.max_audio_tokens), jnp.int32), jnp.int32(0),
        jax.random.PRNGKey(0), jnp.float32(0.8), jnp.int32(50),
        jnp.float32(0.85), jnp.float32(2.0), jnp.bool_(True),
        jnp.int32(CHUNK), head_packed,
        cfg=cfg, chunk=CHUNK, batch=1, head_fn=head_fn,
    )
    return tokens


fh, ts_fh = timeit(full_head, params, packed, head_packed, kc, vc, pos0)
fs, ts_fs = timeit(full_head_small, params, packed, head_packed, kc_s, vc_s, pos0)
print(f"full + head kernel @768: {fh:.1f} ms/chunk ({(fh - rtt) / CHUNK:.2f} ms/tok on-device)  {[round(t,1) for t in ts_fh]}")
print(f"full + head kernel @256: {fs:.1f} ms/chunk ({(fs - rtt) / CHUNK:.2f} ms/tok on-device)  {[round(t,1) for t in ts_fs]}")
