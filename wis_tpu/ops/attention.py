"""Multi-head attention ops.

XLA-fused baseline attention used by every model family. The quadratic
encoder self-attention additionally has a Pallas flash-attention kernel
(wis_tpu.ops.flash) selected automatically on TPU for long sequences.

Replaces the attention inside CTranslate2's CUDA Whisper engine (reference
main.py:341-443 delegates all of this to `ctranslate2.models.Whisper`).

Conventions: activations bf16, attention logits accumulated in f32
(`preferred_element_type`), softmax in f32, context matmul back in the
value dtype. Shapes: (batch, heads, seq, head_dim).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def qkv_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(B, T, D) → (B, H, T, Dh)."""
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, Dh) → (B, T, D)."""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: (B, H, Tq, Dh); k, v: (B, H, Tk, Dh); mask broadcastable to
    (B, H, Tq, Tk), True = attend. Whisper applies dh**-0.25 to both q and
    k; folded into a single dh**-0.5 on the f32 scores here.
    """
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)
