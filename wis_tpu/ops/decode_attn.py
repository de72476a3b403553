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

Status: correctness-tested prototype (tests/test_decode_attn.py,
interpret mode) — production wiring (replacing DecoderCache.reorder)
is the round-2 item in docs/NEXT.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pos_ref, anc_ref, q_ref, k_ref, v_ref, o_ref, *, bk, scale):
    """One head-tile: q (BK, HT, Dh), k/v (BK, HT, Dh, T), anc (BK, T)
    in SMEM-prefetched form, pos scalar."""
    pos = pos_ref[0]
    t_max = k_ref.shape[3]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, t_max), 1) <= pos
    )  # (1, T)

    def per_beam(b, _):
        anc_b = anc_ref[b, :]  # (T,) int32 physical row per position
        # one-hot over physical rows: (BK, T)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bk, t_max), 0)
        sel = (rows == anc_b[None, :]).astype(k_ref.dtype)  # (BK, T)
        # gather-by-mask: K_sel (HT, Dh, T) = sum_b' K[b'] * sel[b']
        k_sel = jnp.einsum(
            "bhdt,bt->hdt", k_ref[:], sel, preferred_element_type=jnp.float32
        ).astype(k_ref.dtype)
        v_sel = jnp.einsum(
            "bhdt,bt->hdt", v_ref[:], sel, preferred_element_type=jnp.float32
        ).astype(v_ref.dtype)
        q_b = q_ref[b]  # (HT, Dh)
        scores = jnp.einsum(
            "hd,hdt->ht", q_b, k_sel, preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.where(valid, scores, NEG_INF)
        w = jax.nn.softmax(scores, axis=-1).astype(v_sel.dtype)
        o_ref[b] = jnp.einsum(
            "ht,hdt->hd", w, v_sel, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bk, per_beam, 0)


@functools.partial(jax.jit, static_argnames=("head_tile",))
def ancestry_attention(
    q: jnp.ndarray,  # (BK, H, Dh)
    k_cache: jnp.ndarray,  # (BK, H, Dh, T) — unreordered physical rows
    v_cache: jnp.ndarray,
    anc: jnp.ndarray,  # (BK, T) int32 — physical row per (beam, position)
    pos: jnp.ndarray,  # () int32 — last valid position
    head_tile: int = 4,
) -> jnp.ndarray:
    """Returns (BK, H, Dh) attention output without any cache permutation."""
    bk, h, dh = q.shape
    t = k_cache.shape[3]
    scale = dh ** -0.5
    grid = (h // head_tile,)

    return pl.pallas_call(
        functools.partial(_kernel, bk=bk, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bk, t), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bk, head_tile, dh), lambda i, *_: (0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bk, head_tile, dh, t), lambda i, *_: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bk, head_tile, dh, t), lambda i, *_: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (bk, head_tile, dh), lambda i, *_: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((bk, h, dh), q.dtype),
    )(jnp.asarray([pos], jnp.int32) if pos.ndim == 0 else pos, anc, q, k_cache, v_cache)


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
