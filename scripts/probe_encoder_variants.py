"""Attribution probe: where do the large-v2 encoder's ~26 on-device ms
go? Runs the encoder N times inside one jit (scan-composed, fetch-sync,
subtract one ~26 ms RTT) under ablations:

  full        — production encode()
  noflash     — XLA attention instead of the Pallas flash kernel
  noln        — LayerNorms replaced by identity (measures LN cost)
  gelu_tanh   — approximate gelu (erf → tanh)
  noattn      — attention blocks skipped entirely (matmul floor + mlp)
  nomlp       — MLPs skipped (attention + qkvo cost)

Ablations change the math — they are cost probes, not numerics tests.
"""

import os
import statistics
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import wis_tpu.models.whisper.model as M
from wis_tpu.models.whisper.config import WHISPER_CONFIGS
from wis_tpu.models.whisper.weights import random_params

N = 8  # encoder passes per dispatch


@contextmanager
def patched(**patches):
    saved = {k: getattr(M, k) for k in patches}
    try:
        for k, v in patches.items():
            setattr(M, k, v)
        yield
    finally:
        for k, v in saved.items():
            setattr(M, k, v)


def time_variant(name, cfg, params, mel, **patches):
    env = patches.pop("env", None)
    if env:
        os.environ[env] = "1"
    try:
        with patched(**patches):

            @jax.jit
            def run(params, mel):
                def body(c, _):
                    x = M.encode(params, mel, cfg)
                    return c + x[0, 0, :4].astype(jnp.float32), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros(4, jnp.float32), None, length=N
                )
                return acc

            t0 = time.perf_counter()
            np.asarray(run(params, mel))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(6):
                t0 = time.perf_counter()
                np.asarray(run(params, mel))
                times.append((time.perf_counter() - t0) * 1000)
            med = statistics.median(times)
            per = (med - 26.0) / N
            print(
                f"{name:10s}: {per:6.2f} ms/encoder  "
                f"(raw p50 {med:.1f} for {N}, compile {compile_s:.0f}s)",
                flush=True,
            )
            return per
    finally:
        if env:
            os.environ.pop(env, None)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large"
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "full", "noln", "gelu_tanh", "noattn", "nomlp", "noflash",
    ]
    cfg = WHISPER_CONFIGS[model]
    params = random_params(cfg, seed=0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, cfg.n_mels, 3000)), jnp.float32)

    orig_ln = M.layer_norm
    orig_attn = M._attn_block
    orig_mlp = M._mlp

    defs = {
        "full": {},
        "noflash": {"env": "WIS_NO_FLASH"},
        "noln": {"layer_norm": lambda x, g, b: x},
        "gelu_tanh": {
            "_mlp": lambda x, blk: M._linear(
                jax.nn.gelu(M._linear(x, blk["w1"], blk["b1"]), approximate=True),
                blk["w2"], blk["b2"],
            )
        },
        "noattn": {
            "_attn_block": lambda x, blk, layer, n_heads, mask=None, kv=None: (
                M._linear(x, blk["o_w"], blk["o_b"])
            )
        },
        "nomlp": {"_mlp": lambda x, blk: x * 1.0},
    }
    for name in variants:
        time_variant(name, cfg, params, mel, **dict(defs[name]))


if __name__ == "__main__":
    main()
