"""Weight-only int8 quantization.

The reference's CUDA engine runs `int8_float16` weights via CTranslate2
(reference main.py:281-292: compute-type selection). The TPU analog:
per-output-channel symmetric int8 weights dequantized inside the matmul.
Decode-step latency is HBM-bandwidth-bound on streaming decoder weights
(~1.7 GB/step for large-v2 in bf16) — int8 halves that traffic.

A weight leaf becomes {"q": int8 (..., K, N), "s": f32 (..., 1, N)};
`qmatmul` dispatches: Pallas fused dequant-matmul on TPU, plain XLA
dequant elsewhere (numerically identical — validated in tests).
"""

from __future__ import annotations

from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

QuantLeaf = Dict[str, jnp.ndarray]
Weight = Union[jnp.ndarray, QuantLeaf]


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


@jax.jit
def _quantize_on_device(w: jnp.ndarray):
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.rint(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight(w: jnp.ndarray) -> QuantLeaf:
    """Per-output-channel symmetric int8 over the last axis: scale has
    shape (..., 1, N) so stacked-layer leaves (L, K, N) quantize
    per-(layer, output-channel). Runs on device — weights never round-trip
    to the host."""
    q, scale = _quantize_on_device(jnp.asarray(w))
    return {"q": q, "s": scale}


def dequantize(w: QuantLeaf, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (w["q"].astype(jnp.float32) * w["s"]).astype(dtype)


def qmatmul(x: jnp.ndarray, w: Weight) -> jnp.ndarray:
    """x (..., K) @ w (K, N) with transparent int8 dispatch. Output dtype
    follows x."""
    if not is_quantized(w):
        y = jnp.einsum("...d,df->...f", x, w, preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    q, s = w["q"], w["s"]
    if _use_pallas(x, q):
        from wis_tpu.ops.quant_pallas import int8_matmul

        return int8_matmul(x, q, s).astype(x.dtype)
    # XLA path: dequant fused into the matmul operand read where possible
    y = jnp.einsum(
        "...d,df->...f",
        x,
        (q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def _use_pallas(x: jnp.ndarray, q: jnp.ndarray) -> bool:
    # Measured on v5e: XLA fuses the int8→bf16 dequant into the dot's
    # operand read and streams weights at near-peak HBM bandwidth
    # (~1.2 ms for a full large-v2 decoder step), so the custom kernel
    # is opt-in (WIS_PALLAS_QUANT=1) rather than the default path.
    import os

    if not os.environ.get("WIS_PALLAS_QUANT"):
        return False
    if q.ndim != 2:
        return False
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    if platform not in ("tpu", "axon"):
        return False
    k, n = q.shape
    return k % 128 == 0 and n % 128 == 0


# --------------------------------------------------------------------------- #
# Param-tree quantization
# --------------------------------------------------------------------------- #
#: whisper weight-leaf names eligible for int8 (matmul projection weights
#: only; LN/bias/conv/positional/embedding stay bf16 — tok_emb doubles as
#: a lookup table, and the logits matmul is <10% of per-step traffic)
_WHISPER_QUANT_KEYS = frozenset({"q_w", "k_w", "v_w", "o_w", "w1", "w2"})


def quantize_whisper_params(params: Dict, keys=None, subtrees=("decoder",)) -> Dict:
    """Return a copy of a whisper param tree with eligible weight leaves
    quantized.

    Only the **decoder** quantizes by default: decode steps are
    HBM-bandwidth-bound on weight streaming (int8 halves it), while the
    encoder is MXU-compute-bound at T=1500 — there the in-matmul dequant
    only adds work. `subtrees=("encoder", "decoder")` quantizes both
    (matching CT2's whole-model int8, at a small encoder latency cost).
    """
    keys = keys or _WHISPER_QUANT_KEYS

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for name, child in node.items():
                if name in keys and isinstance(child, jnp.ndarray) and child.ndim >= 2:
                    out[name] = quantize_weight(child)
                else:
                    out[name] = walk(child)
            return out
        return node

    out = dict(params)
    for sub in subtrees:
        if sub in out:
            out[sub] = walk(out[sub])
    return out


def quantized_bytes(params: Dict) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
