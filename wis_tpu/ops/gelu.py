"""Near-exact gelu without erf.

Whisper uses exact-erf gelu (openai/whisper model.py; HF Whisper
NewGELUActivation is the tanh form ONLY for GPT-family — Whisper's is
nn.GELU exact). XLA's erf lowering on TPU costs ~2.1 ms of the large-v2
encoder pass (probe_encoder_variants: full 22.55 vs gelu_tanh 20.40),
and Mosaic has no erf lowering at all, which forced earlier Pallas
kernels to the classic tanh approximation (max |err| ≈ 3e-3 — visible
against the HF-parity tolerance of 2e-3, so the XLA paths kept erf).

This is a better compromise: a 7th-order odd polynomial inside tanh,
least-squares fit of exact gelu on [0, 6] (scripts in round-4 BENCH.md):

    gelu(x) ≈ 0.5·x·(1 + tanh(x·(c1 + x²·(c3 + x²·(c5 + x²·c7)))))

max |gelu_tanh4(x) − gelu_exact(x)| = 1.30e-5 over all of ℝ (f32 eval,
tails clamped exactly: x for x > 6, 0 for x < −6) — 150× inside the
2e-3 parity budget and far below bf16 resolution. Cost: one tanh + 5
mul/FMA, no erf. Tested against scipy erf in tests/test_gelu.py.
"""

from __future__ import annotations

import jax.numpy as jnp

C1 = 7.97674780e-01
C3 = 3.67492532e-02
C5 = -2.60437574e-04
C7 = -8.21175498e-06


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-tails tanh-form gelu, max abs error 1.3e-5 vs erf gelu.
    Internal math is f32 (like XLA's erf path) so bf16 inputs round the
    same way exact gelu does for ~99% of values and within 1 ulp always."""
    x32 = x.astype(jnp.float32)
    xc = jnp.clip(x32, -6.0, 6.0)
    u = xc * xc
    p = xc * (C1 + u * (C3 + u * (C5 + u * C7)))
    y = 0.5 * x32 * (1.0 + jnp.tanh(p))
    y = jnp.where(x32 > 6.0, x32, y)
    return jnp.where(x32 < -6.0, jnp.zeros((), jnp.float32), y).astype(x.dtype)
