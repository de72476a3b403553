"""Encoder conv stem as MXU matmuls.

The reference's stem is two cuDNN conv1ds (CTranslate2's Whisper encoder;
openai/whisper model.py Conv1d pair). On TPU, `lax.conv_general_dilated`
at these shapes (K=3, C_in 80/1280, stride 1/2) lowers to a convolution
that measures ~4 ms of the 22.4 ms large-v2 encoder pass — far off the
~0.08 ms MXU floor for its 16.5 GFLOP (BENCH.md round-3 attribution).

This module reformulates both convs as plain matmuls with zero gathers:

- conv1 (stride 1, pad 1): im2col by CONCAT of three shifted views —
  (B, 3000, 3·C_in) @ (3·C_in, D). Shifted views of a padded array are
  contiguous slices, so the concat is pure HBM copy, no gather.
- conv2 (stride 2, pad 1): the stride-2 phases come from a reshape
  (B, 3000, D) → (B, 1500, 2, D): even phase y[2t] = r[:, :, 0], odd
  phase y[2t+1] = r[:, :, 1], and y[2t-1] is the odd phase shifted one
  row. One (B, 1500, 3D) @ (3D, D) matmul (14.7 GFLOP on large-v2).

Accumulation is f32 (preferred_element_type) exactly like the conv path;
gelu stays exact-erf (transcript parity). Bit-equality vs the conv
formulation is probed on-chip in scripts/probe_stem_ln.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_stem(enc: dict, mel: jnp.ndarray) -> jnp.ndarray:
    """mel (B, n_mels, 3000) → (B, 1500, D): conv1+gelu, conv2(s2)+gelu,
    positional add — the full openai-whisper encoder stem."""
    w1 = enc["conv1"]["w"]  # (3, C, D)
    w2 = enc["conv2"]["w"]  # (3, D, D)
    dtype = w1.dtype
    x = mel.swapaxes(-1, -2).astype(dtype)  # (B, T, C)
    b, t, c = x.shape
    d = w1.shape[-1]

    # conv1, stride 1, pad 1: y[t] = Σ_k x[t+k-1] @ w1[k]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    z1 = jnp.concatenate([xp[:, 0:t], xp[:, 1 : t + 1], xp[:, 2 : t + 2]], axis=-1)
    from wis_tpu.ops.gelu import gelu

    y = jnp.einsum(
        "btc,cd->btd", z1, w1.reshape(3 * c, d),
        preferred_element_type=jnp.float32,
    )
    y = gelu((y + enc["conv1"]["b"]).astype(dtype))

    # conv2, stride 2, pad 1: out[t] = y[2t-1]@w[0] + y[2t]@w[1] + y[2t+1]@w[2]
    r = y.reshape(b, t // 2, 2, d)
    even = r[:, :, 0]  # y[2t]
    odd = r[:, :, 1]  # y[2t+1]
    odd_prev = jnp.pad(odd[:, :-1], ((0, 0), (1, 0), (0, 0)))  # y[2t-1]
    z2 = jnp.concatenate([odd_prev, even, odd], axis=-1)  # (B, T/2, 3D)
    y2 = jnp.einsum(
        "btc,cd->btd", z2, w2.reshape(3 * d, d),
        preferred_element_type=jnp.float32,
    )
    y2 = gelu((y2 + enc["conv2"]["b"]).astype(dtype))
    return y2 + enc["pos"].astype(dtype)
