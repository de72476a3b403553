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


def _kernel_packed(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, nk, tk, valid,
    scale, dh, n_sub,
):
    """Packed-layout variant: blocks carry `n_sub` heads side-by-side in
    the 128-lane dim (Dh=64 → head pairs); each head runs its own online
    softmax over static 64-lane slices (the same pattern
    ops/fused_decode.py uses per head)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    key_ids = j * tk + jax.lax.broadcasted_iota(
        jnp.int32, (q_ref.shape[1], tk), 1
    )

    for h in range(n_sub):
        q = q_ref[0][:, h * dh:(h + 1) * dh]  # (TQ, Dh)
        k = k_ref[0][:, h * dh:(h + 1) * dh]  # (TK, Dh)
        v = v_ref[0][:, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (TQ, TK)
        s = jnp.where(key_ids < valid, s, NEG_INF)

        m_prev = m_ref[:, h:h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, h:h + 1] = l_ref[:, h:h + 1] * alpha + jnp.sum(
            p, axis=-1, keepdims=True
        )
        acc_ref[:, h * dh:(h + 1) * dh] = (
            acc_ref[:, h * dh:(h + 1) * dh] * alpha
            + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        m_ref[:, h:h + 1] = m_new

    @pl.when(j == nk - 1)
    def _():
        out = [
            acc_ref[:, h * dh:(h + 1) * dh]
            / jnp.maximum(l_ref[:, h:h + 1], 1e-30)
            for h in range(n_sub)
        ]
        o_ref[0] = jnp.concatenate(out, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "block_q", "block_k"))
def flash_attention_packed(
    q: jnp.ndarray,  # (B, T, D) — heads packed along the model dim
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    block_q: int = 512,
    block_k: int = 1536,
) -> jnp.ndarray:
    """Unmasked attention on PACKED (B, T, D) q/k/v — no (B, H, T, Dh)
    transposes on either side. The encoder's head split/merge otherwise
    moves ~4 × B·T·D bytes per layer through HBM (≈ 7.7 GB per large-v2
    pass — measured as most of the attention block's cost,
    BENCH.md r3). The grid walks head PAIRS so lane blocks stay
    128-aligned (Dh = 64); per-head math slices 64 lanes statically.
    Output is packed (B, T, D), ready for the o-projection."""
    b, t, d = q.shape
    dh = d // n_heads
    assert dh in (64, 128), dh
    n_sub = 128 // dh  # heads per 128-lane block
    lanes = n_sub * dh  # 128
    n_grp = n_heads // n_sub
    scale = dh ** -0.5

    tile = max(block_q, block_k)
    t_pad = ((t + tile - 1) // tile) * tile
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    nq = t_pad // block_q
    nk = t_pad // block_k
    grid = (b * n_grp, nq, nk)

    def idx(g, i, j_):
        return (g // n_grp, i, g % n_grp)

    def idx_k(g, i, j_):
        return (g // n_grp, j_, g % n_grp)

    out = pl.pallas_call(
        functools.partial(
            _kernel_packed, nk=nk, tk=block_k, valid=t, scale=scale,
            dh=dh, n_sub=n_sub,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, lanes), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, lanes), idx_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, lanes), idx_k, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, lanes), idx, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, n_sub), jnp.float32),   # m per head
            pltpu.VMEM((block_q, n_sub), jnp.float32),   # l per head
            pltpu.VMEM((block_q, lanes), jnp.float32),   # acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * t_pad * t_pad * dh,
            bytes_accessed=4 * b * t_pad * d * 2,
            transcendentals=b * n_heads * t_pad * t_pad,
        ),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v)
    return out[:, :t]


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
