"""Prototype: beam decode-attention with ancestry indirection (Pallas).

The measured per-token cost of beam search is dominated by physically
permuting the KV cache on beam reorders (~1.7 ms/step on large-v2 —
BENCH.md). This kernel removes the physical reorder: each beam writes its
new K/V column to its own physical row, and an ancestry map
``anc (BK, T)`` records, for every past position, which physical row
holds each logical beam's history. Attention gathers rows **at read
time, inside the kernel, in VMEM** — the cache is streamed from HBM
exactly once and never rewritten.

    out[b, h, :] = softmax_s(q[b,h,:]·K[anc[b,s], h, :, s]) · V[anc[b,s], h, :, s]

Grid: (head-tiles,). Each grid step holds the full (BK, h_tile, Dh, T)
K/V block in VMEM (BK is the flattened beam batch — ≤ 8 · 64 KB per
head), loops beams in-kernel, and resolves ancestry with a one-hot
mask-sum over the BK rows (BK is tiny; the multiply-mask is VPU work on
VMEM-resident data).

Status: correctness-validated on real TPU v5e (max err 2e-4 vs the XLA
reference; 32 sequential calls = 2.7 ms). Not yet wired into production:
at one-call-per-layer granularity the ~84 µs Pallas call overhead eats
the ~1.7 ms/step reorder saving — the production win requires this
kernel to also absorb the QKV/O projections of its layer (the round-2
fused-layer plan in docs/NEXT.md), for which this prototype de-risks
the ancestry math and the Mosaic constraints (2-D dots only, no dynamic
sublane indexing, head-major blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pos_ref, anc_ref, q_ref, k_ref, v_ref, o_ref, *, bk, scale):
    """One head per grid step, head-major blocks: q (1, BK, Dh),
    k/v (1, BK, Dh, T), anc (BK, T) scalar-prefetched, pos scalar.

    Mosaic constraints shape the math: only 2-D dots lower, and dynamic
    sublane indexing is illegal — so ancestry selection is an all-pairs
    QK computed with a *static* unrolled loop over physical rows,
    combined via one-hot masks (BK ≤ 8 keeps the amplification trivial
    and entirely VMEM-resident).
    """
    pos = pos_ref[0]
    t_max = k_ref.shape[3]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, t_max), 1) <= pos
    )  # (1, T)

    q_all = q_ref[0].astype(jnp.float32)  # (BK, Dh)
    scores = jnp.zeros((bk, t_max), jnp.float32)
    anc = anc_ref[...]  # (BK, T) int32
    for bp in range(bk):  # static unroll over physical rows
        sel = (anc == bp).astype(jnp.float32)  # (BK, T)
        qk = jnp.dot(
            q_all, k_ref[0, bp].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # (BK, T)
        scores = scores + qk * sel
    scores = scores * scale
    scores = jnp.where(valid, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)  # (BK, T)

    out = jnp.zeros((bk, q_ref.shape[2]), jnp.float32)
    for bp in range(bk):
        sel = (anc == bp).astype(jnp.float32)
        out = out + jnp.dot(
            w * sel, v_ref[0, bp].astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_tile",))
def ancestry_attention(
    q: jnp.ndarray,  # (BK, H, Dh)
    k_cache: jnp.ndarray,  # (BK, H, Dh, T) — unreordered physical rows
    v_cache: jnp.ndarray,
    anc: jnp.ndarray,  # (BK, T) int32 — physical row per (beam, position)
    pos: jnp.ndarray,  # () int32 — last valid position
    head_tile: int = 0,  # 0 → all heads in one block (whisper fits VMEM)
) -> jnp.ndarray:
    """Returns (BK, H, Dh) attention output without any cache permutation."""
    bk, h, dh = q.shape
    t = k_cache.shape[3]
    scale = dh ** -0.5
    # one head per grid step (this Mosaic build only lowers 2-D dots),
    # head-major layout so every block's trailing dims are tile-legal
    # (production would store the cache head-major natively)
    del head_tile
    ht = 1
    grid = (h,)
    q_hm = q.swapaxes(0, 1)  # (H, BK, Dh)
    k_hm = k_cache.swapaxes(0, 1)  # (H, BK, Dh, T)
    v_hm = v_cache.swapaxes(0, 1)

    out_hm = pl.pallas_call(
        functools.partial(_kernel, bk=bk, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bk, t), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (ht, bk, dh), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ht, bk, dh, t), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ht, bk, dh, t), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (ht, bk, dh), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((h, bk, dh), q.dtype),
    )(jnp.asarray([pos], jnp.int32) if pos.ndim == 0 else pos, anc, q_hm, k_hm, v_hm)
    return out_hm.swapaxes(0, 1)


def ancestry_attention_reference(q, k_cache, v_cache, anc, pos):
    """Plain-XLA reference (materializes the gathered cache)."""
    bk, h, dh = q.shape
    k_sel = jnp.take(k_cache, anc, axis=0)  # (BK, T, H, Dh, T) — wrong; do per-pos
    # per-position row gather: K_sel[b, h, d, s] = k_cache[anc[b, s], h, d, s]
    k_sel = jnp.einsum(
        "bhdt,xbt->xhdt",
        k_cache,
        jax.nn.one_hot(anc, bk, axis=0, dtype=k_cache.dtype).transpose(1, 0, 2),
    )
    v_sel = jnp.einsum(
        "bhdt,xbt->xhdt",
        v_cache,
        jax.nn.one_hot(anc, bk, axis=0, dtype=v_cache.dtype).transpose(1, 0, 2),
    )
    scale = dh ** -0.5
    scores = jnp.einsum("bhd,bhdt->bht", q, k_sel) * scale
    t_max = k_cache.shape[3]
    valid = jnp.arange(t_max)[None, None, :] <= pos
    scores = jnp.where(valid, scores, NEG_INF)
    w = jax.nn.softmax(scores, axis=-1).astype(v_sel.dtype)
    return jnp.einsum("bht,bhdt->bhd", w, v_sel)
