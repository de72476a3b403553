"""Flash attention (Pallas TPU) for the encoder's full-sequence self-attention.

The Whisper encoder attends over 1500 positions per layer; materializing
(H, 1500, 1500) f32 score tensors costs ~180 MB of HBM traffic per layer
for large-v2. This kernel computes attention with online softmax — scores
never leave VMEM:

    grid = (B*H, nq, nk), k-tiles innermost
    per q-tile running state (m, l, acc) in VMEM scratch
    final tile writes acc / l

Unmasked (encoder) attention with key-side padding masked via iota —
inputs pad the time axis up to a 128 multiple (1500 → 1536).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, nk, tk, valid, scale):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (TK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, TK)

    # mask key padding (positions >= valid)
    key_ids = j * tk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_ids < valid, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,  # (B, H, T, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    # tiles sized for whisper's 1536-padded encoder: one k-sweep per
    # q-tile (3 grid steps per head) — small tiles multiply grid-step
    # fixed costs ~6× for no VMEM benefit at D=64
    block_q: int = 512,
    block_k: int = 1536,
) -> jnp.ndarray:
    """Unmasked softmax(q kᵀ / √D) v with online softmax. T is padded to a
    tile multiple internally; D should be a multiple of 8 (whisper: 64)."""
    b, h, t, d = q.shape
    scale = d ** -0.5
    bh = b * h

    tile = max(block_q, block_k)
    t_pad = ((t + tile - 1) // tile) * tile
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qf = q.reshape(bh, t_pad, d)
    kf = k.reshape(bh, t_pad, d)
    vf = v.reshape(bh, t_pad, d)

    nq = t_pad // block_q
    nk = t_pad // block_k
    grid = (bh, nq, nk)

    out = pl.pallas_call(
        functools.partial(
            _kernel, nk=nk, tk=block_k, valid=t, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d,
            bytes_accessed=3 * bh * t_pad * d * 2 + bh * t_pad * d * 2,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, t_pad, d)[:, :, :t]
