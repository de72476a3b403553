"""A/B probe: encoder conv-stem formulations and LayerNorm variants on
the real chip (compose-probe protocol: N reps inside one jit, fetch-sync,
subtract ~26 ms RTT).

Stem variants (large-v2 dims: mel (1, 80, 3000) → (1, 1500, 1280)):
  conv      — production lax.conv_general_dilated pair (model._conv1d)
  matmul    — im2col-by-reshape: conv1 as 3 shifted (3000,80)@(80,D)
              matmuls; conv2 (stride 2) as ONE (1500,3D)@(3D,D) matmul
              over a concat of the even/odd phase slices
LN variants on (1, 1500, D) bf16 (65 instances per encoder pass):
  f32cast   — production layer_norm (astype f32, mean/var, scale, back)
  pallas    — single-pass Pallas kernel, bf16 in/out, f32 accumulation

Equality is checked to bf16 resolution before timing.
"""

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

from wis_tpu.models.whisper import model as M
from wis_tpu.models.whisper.config import WHISPER_CONFIGS
from wis_tpu.models.whisper.weights import random_params

RTT = 26.0


def timeit(fn, *args, n_outer=6):
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(n_outer):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append((time.perf_counter() - t0) * 1000)
    return statistics.median(times), compile_s


def stem_conv(enc, mel):
    x = mel.swapaxes(-1, -2).astype(enc["conv1"]["w"].dtype)
    x = jax.nn.gelu(M._conv1d(x, enc["conv1"]["w"], enc["conv1"]["b"], 1), approximate=False)
    x = jax.nn.gelu(M._conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], 2), approximate=False)
    return x + enc["pos"].astype(x.dtype)


def stem_matmul(enc, mel):
    from wis_tpu.models.whisper.stem import conv_stem

    return conv_stem(enc, mel)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large"
    cfg = WHISPER_CONFIGS[model]
    params = random_params(cfg, seed=0, dtype=jnp.bfloat16)
    enc = params["encoder"]
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, cfg.n_mels, 3000)), jnp.float32)

    # ---- equality ----
    a = np.asarray(jax.jit(stem_conv)(enc, mel), np.float32)
    b = np.asarray(jax.jit(stem_matmul)(enc, mel), np.float32)
    scale = np.abs(a).max()
    print(f"stem max|Δ| = {np.abs(a - b).max():.6f} (scale {scale:.2f})", flush=True)

    N = 16
    for name, stem in (("conv", stem_conv), ("matmul", stem_matmul)):

        @jax.jit
        def run(enc, mel, stem=stem):
            def body(c, _):
                x = stem(enc, mel)
                return c + x[0, 0, :4].astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.zeros(4, jnp.float32), None, length=N)
            return acc

        med, comp = timeit(run, enc, mel)
        print(f"stem/{name:7s}: {(med - RTT) / N:6.2f} ms  (p50 {med:.1f}, compile {comp:.0f}s)", flush=True)

    # ---- LN variants ----
    D = cfg.n_audio_state
    x = jnp.asarray(rng.standard_normal((1, 1500, D)) * 0.5, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    bb = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)

    from wis_tpu.ops.layernorm import layer_norm_pallas

    a = np.asarray(M.layer_norm(x, g, bb), np.float32)
    b = np.asarray(layer_norm_pallas(x, g, bb), np.float32)
    print(f"ln max|Δ| = {np.abs(a - b).max():.6f}", flush=True)

    NLN = 64  # ~one encoder pass worth of LNs
    for name, ln in (("f32cast", M.layer_norm), ("pallas", layer_norm_pallas)):

        @jax.jit
        def run(x, g, bb, ln=ln):
            def body(c, _):
                # rotate input so XLA cannot hoist the LN out of the loop
                y = ln(c, g, bb)
                return y + jnp.bfloat16(1e-3) * x, None

            y, _ = jax.lax.scan(body, x, None, length=NLN)
            return y[0, 0, :4]

        med, comp = timeit(run, x, g, bb)
        print(f"ln/{name:8s}: {(med - RTT) / NLN * 1000:7.1f} us/LN  (p50 {med:.1f}, compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
