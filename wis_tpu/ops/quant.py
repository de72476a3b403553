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


@jax.jit
def _quantize_rows_on_device(w: jnp.ndarray):
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.rint(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_rows(w: jnp.ndarray) -> QuantLeaf:
    """Per-ROW symmetric int8 (scale over the LAST axis): the layout for
    operands contracted along their last axis against an activation —
    e.g. the (V, D) tok_emb read by the logits head, where each vocab
    row's logit scales by that row's own factor AFTER the dot."""
    q, scale = _quantize_rows_on_device(jnp.asarray(w))
    return {"q": q, "s": scale}


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
    if "decoder" in subtrees and "decoder" in out:
        # A second, per-row int8 copy of tok_emb for the LOGITS matmul
        # only (the (V, D) embedding re-reads every decode step — 133 MB
        # on large-v2; int8 halves it). The bf16 original stays for
        # embedding lookups. Both the fused head (ops/fused_logits) and
        # the XLA logits tail (models/whisper/model.py) consume it, so
        # the two decode paths keep identical numerics.
        dec = dict(out["decoder"])
        if isinstance(dec.get("tok_emb"), jnp.ndarray):
            dec["tok_emb_q"] = quantize_rows(dec["tok_emb"])
            out["decoder"] = dec
    return out


#: XTTS GPT block matmul weights (models/xtts/gpt.py layout)
_GPT_QUANT_KEYS = ("q_w", "k_w", "v_w", "proj_w", "mlp_w1", "mlp_w2")


def quantize_gpt_params(params: Dict) -> Dict:
    """XTTS GPT analog of quantize_whisper_params: the chunked TTS decode
    streams the full 30L/1024d block stack once per audio token (weight-
    bound exactly like the whisper decoder), so the stacked block matmul
    weights quantize to int8. Embeddings, LayerNorms, and the (small,
    1026-way) audio-code head stay in the working dtype."""
    blocks = dict(params["blocks"])
    for k in _GPT_QUANT_KEYS:
        blocks[k] = quantize_weight(blocks[k])
    out = dict(params)
    out["blocks"] = blocks
    return out


# --------------------------------------------------------------------------- #
# int4 quantizer (nibble-packed, group-wise scales). The fused-decode int4
# weight stream that consumed it was removed in round 3 (perf-neutral —
# BENCH.md §int4); the quantizer stays for future high-batch use
# --------------------------------------------------------------------------- #
def int4_group_size(k: int) -> int:
    """Scale-group length along K: 128 when it divides the nibble half,
    else the half itself (small test configs)."""
    half = k // 2
    return 128 if half % 128 == 0 else half


def quantize_weight_int4(w: jnp.ndarray, group: int = None):
    """Symmetric int4 with group-wise scales over the K (contraction)
    axis: w (K, N) → q4 int8 (K//2, N) with byte[r, n] packing
    q[r] in the LOW nibble and q[r + K//2] in the HIGH nibble, plus
    s4 f32 (K//group, N). Values clip to [-7, 7] (symmetric grid).

    Halves the decode-step weight-stream bytes vs int8; the fused kernel
    consumer unpacks nibbles in-register and applies
    the group scales on per-group partial dots. Weight-only, RTN — the
    XLA paths (prefill/encoder) keep int8.
    """
    w32 = jnp.asarray(w).astype(jnp.float32)
    k = w32.shape[-2]
    assert k % 2 == 0
    group = group or int4_group_size(k)
    assert k % group == 0 and (k // 2) % group == 0, (k, group)
    g = k // group
    grouped = w32.reshape(w32.shape[:-2] + (g, group, w32.shape[-1]))
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    s4 = jnp.maximum(absmax, 1e-8) / 7.0  # (..., G, 1, N)
    q = jnp.clip(jnp.rint(grouped / s4), -7, 7).astype(jnp.int32)
    q = q.reshape(w32.shape)  # back to (..., K, N)
    lo = q[..., : k // 2, :]
    hi = q[..., k // 2 :, :]
    packed = ((lo & 0xF) | (hi << 4)).astype(jnp.int8)
    return packed, s4[..., 0, :]


def unpack_int4(q4: jnp.ndarray):
    """(..., K//2, N) packed int8 → (lo, hi) int32 nibbles, sign-extended
    (the XLA mirror of the kernel's in-register unpack)."""
    v = q4.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(v, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(v, 24), 28)
    return lo, hi


def dequantize_int4(q4: jnp.ndarray, s4: jnp.ndarray, dtype=jnp.float32):
    """Inverse of quantize_weight_int4 → (..., K, N) effective weights."""
    lo, hi = unpack_int4(q4)
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)  # (..., K, N)
    k = q.shape[-2]
    g = s4.shape[-2]
    group = k // g
    q = q.reshape(q.shape[:-2] + (g, group, q.shape[-1]))
    return (q * s4[..., :, None, :]).reshape(
        q.shape[:-3] + (k, q.shape[-1])
    ).astype(dtype)


def quantized_bytes(params: Dict) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
