"""Fused single-token XTTS-GPT decode step: all L layers in ONE Pallas
kernel.

The TTS chunked decode (models/xtts/gpt.py run_decode_chunk) is the same
shape of problem as the whisper decode loop (ops/fused_decode.py): one
token's compute is trivial next to streaming the int8 block stack
(~12.6 MB/layer × 30 layers ≈ 378 MB per token on the production XTTS
dims) and the self-attention cache through VMEM. The XLA `lax.scan` over
layers pays per-op launch overhead on ~8 fused kernels per layer per
token (~240 launches per token) — measured 2.2 ms/token against a
~0.6 ms weight-stream floor. This kernel runs the whole stack in one
launch with the hand-rolled 2-slot DMA pipeline fused_decode.py measured
at 643-657 GB/s on v5e.

Differences from the whisper kernel (this is a strict subset):
- no cross-attention (GPT2 blocks are self-attention only), so the
  chunk layout is 12 (D, D) int8 chunks per layer: [q k v o | w1 ×4 |
  w2 ×4], and the LN block is (L, 4, D) = ln1 g,b | ln2 g,b.
- bk is the decode batch (streaming TTS runs bk=1), not beams — there
  is no ancestry; `sel` is the plain causal mask over written cache
  columns (flat column t*bk + row belongs to query row `row` when
  t < pos).
- GPT2's two final LayerNorms and the (D, 1026) audio-code head are
  left to XLA — they are per-token epilogue work on one row, not part
  of the streamed stack.

Reference analog: the DeepSpeed-fused GPT inference kernels Coqui's
XTTS enables when available (reference xtts/main.py:25-49 `use_deepspeed`);
this is the TPU-native equivalent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wis_tpu.models.xtts.gpt import GPTConfig
from wis_tpu.ops.fused_decode import _get_qs, _ln, _pick_groups

NEG = -1e30

# chunk-slot layout along the packed axis
QW, KW, VW, OW = 0, 1, 2, 3
W1_0, W2_0 = 4, 8
NC = 12


class PackedGPT(NamedTuple):
    """GPT block weights repacked for the fused kernel (host-side, once
    at load time). Accepts the int8 leaves quantize_gpt_params produces
    or plain bf16 leaves (quantized here)."""

    w: jnp.ndarray  # (L, NC, D, D) int8
    s: jnp.ndarray  # (L, NC, 1, D) f32 — per-output-channel scales
    b: jnp.ndarray  # (L, NC, 1, D) f32 — biases (zeros where absent)
    ln: jnp.ndarray  # (L, 4, D) f32 — ln1 g,b | ln2 g,b


def pack_gpt(params: dict, cfg: GPTConfig) -> PackedGPT:
    """Repack the stacked GPT block pytree into the kernel chunk layout."""
    blk = params["blocks"]
    L, D = cfg.n_layer, cfg.d_model

    w = jnp.zeros((L, NC, D, D), jnp.int8)
    s = jnp.zeros((L, NC, D), jnp.float32)
    b = jnp.zeros((L, NC, D), jnp.float32)

    def put(ci, leaf, bias=None):
        nonlocal w, s, b
        q, sc = _get_qs(leaf)  # q (L, D, D), sc (L, 1, D)
        w = w.at[:, ci].set(q)
        s = s.at[:, ci].set(sc[:, 0, :])
        if bias is not None:
            b = b.at[:, ci].set(bias.astype(jnp.float32))

    put(QW, blk["q_w"], blk["q_b"])
    put(KW, blk["k_w"], blk["k_b"])
    put(VW, blk["v_w"], blk["v_b"])
    put(OW, blk["proj_w"], blk["proj_b"])

    q1, s1 = _get_qs(blk["mlp_w1"])  # (L, D, F), (L, 1, F)
    b1 = blk["mlp_b1"].astype(jnp.float32)  # (L, F)
    for i in range(4):
        sl = slice(i * D, (i + 1) * D)
        w = w.at[:, W1_0 + i].set(q1[:, :, sl])
        s = s.at[:, W1_0 + i].set(s1[:, 0, sl])
        b = b.at[:, W1_0 + i].set(b1[:, sl])

    q2, s2 = _get_qs(blk["mlp_w2"])  # (L, F, D), (L, 1, D)
    for i in range(4):
        w = w.at[:, W2_0 + i].set(q2[:, i * D : (i + 1) * D, :])
    # w2's per-output scale/bias apply once after the 4 partial sums
    s = s.at[:, W2_0 + 3].set(s2[:, 0, :])
    b = b.at[:, W2_0 + 3].set(blk["mlp_b2"].astype(jnp.float32))

    ln = jnp.stack(
        [blk["ln1_g"], blk["ln1_b"], blk["ln2_g"], blk["ln2_b"]], axis=1
    ).astype(jnp.float32)
    return PackedGPT(w=w, s=s[:, :, None, :], b=b[:, :, None, :], ln=ln)


def fused_gpt_vmem_bytes(cfg: GPTConfig, bk: int, t_cache: int) -> int:
    """Scoped-VMEM footprint estimate (mirror of the scratch list below);
    the caller gates the fused path on this staying under ~15 MB."""
    D = cfg.d_model
    H = cfg.n_head
    Dh = D // H
    F = 4 * D
    BKT = bk * t_cache
    g_c = _pick_groups(H, Dh * BKT, 1 << 20)
    cache_buf = 2 * 2 * g_c * Dh * BKT * 2
    acts = bk * (3 * D + 3 * D) * 4 + bk * (D + F) * 2
    wbuf = 2 * D * D
    w_blocks = NC * D * 4 * 2 + 4 * D * 4
    return cache_buf + acts + wbuf + w_blocks + (1 << 20)


def build_fused_gpt_step(cfg: GPTConfig, *, bk: int, t_cache: int):
    """Return fn(packed, x_emb, k_cache, v_cache, sel, pos)
      -> (x_out (bk, D) f32, k_cache', v_cache')

    x_emb:   (bk, D) f32 — token + positional embedding for this step
    k/v_cache: (L, D, bk*t_cache) bf16 — TIME-MAJOR flat columns (flat
             index = t*bk + row, heads merged into D), updated IN PLACE
             via input_output_aliases: the kernel injects this step's
             K/V columns into each resident slab (one-hot matmul at the
             dynamic lane offset pos*bk) and streams the slab back
             behind the attention reads — the caller never touches the
             cache between steps.
    sel:     (bk, BKT) f32 — 1 where flat column t*bk + row belongs to
             query row `row`'s history (t < pos); the step's own K/V
             join via the in-kernel self column.
    pos:     () int32 — the cache position this step writes.
    """
    D = cfg.d_model
    H = cfg.n_head
    Dh = D // H
    L = cfg.n_layer
    F = 4 * D
    BKT = bk * t_cache
    assert BKT % 128 == 0, "bk * t_cache must be lane-aligned"
    scale = Dh**-0.5

    g_c = _pick_groups(H, Dh * BKT, 1 << 20)
    ng_c = H // g_c

    def kernel(
        # scalar prefetch
        pos_ref,
        # blocked inputs
        s_ref, b_ref, ln_ref, x_in, sel_ref,
        # ANY (HBM) inputs
        w_hbm, kc_hbm, vc_hbm,
        # outputs (kc_out/vc_out alias kc/vc_hbm; written by slab DMA)
        x_out, kc_out, vc_out,
        # scratch
        x, h, qkv, attn, gbuf, yacc,
        wbuf, kbuf, vbuf,
        wsem, ksem, vsem, kwsem, vwsem,
    ):
        l = pl.program_id(0)
        pos = pos_ref[0]

        def kwdma(grp, slot):
            li, gi = grp // ng_c, grp % ng_c
            return pltpu.make_async_copy(
                kbuf.at[slot],
                kc_out.at[li, pl.ds(gi * g_c * Dh, g_c * Dh)],
                kwsem.at[slot],
            )

        def vwdma(grp, slot):
            li, gi = grp // ng_c, grp % ng_c
            return pltpu.make_async_copy(
                vbuf.at[slot],
                vc_out.at[li, pl.ds(gi * g_c * Dh, g_c * Dh)],
                vwsem.at[slot],
            )

        def wdma(g, slot):
            li, ci = g // NC, g % NC
            return pltpu.make_async_copy(
                w_hbm.at[li, ci], wbuf.at[slot], wsem.at[slot]
            )

        def kdma(grp, slot):
            li, gi = grp // ng_c, grp % ng_c
            return pltpu.make_async_copy(
                kc_hbm.at[li, pl.ds(gi * g_c * Dh, g_c * Dh)],
                kbuf.at[slot], ksem.at[slot],
            )

        def vdma(grp, slot):
            li, gi = grp // ng_c, grp % ng_c
            return pltpu.make_async_copy(
                vc_hbm.at[li, pl.ds(gi * g_c * Dh, g_c * Dh)],
                vbuf.at[slot], vsem.at[slot],
            )

        @pl.when(l == 0)
        def _():
            x[:] = x_in[:]
            wdma(0, 0).start()
            kdma(0, 0).start()
            vdma(0, 0).start()

        # stream each (D, D) int8 chunk through the 2-slot scratch,
        # issuing one chunk ahead of its consumer (fused_decode.py
        # pattern: 643-657 GB/s measured)
        def use_w(c):
            g = l * NC + c
            nxt = g + 1

            @pl.when(nxt < L * NC)
            def _():
                wdma(nxt, nxt % 2).start()

            wdma(g, g % 2).wait()
            return wbuf[g % 2], s_ref[0, c], b_ref[0, c, 0]

        def wdot(src_bf16, c):
            wchunk, schunk, bchunk = use_w(c)
            y = jnp.dot(
                src_bf16, wchunk.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return y * schunk[0][None, :] + bchunk[None, :]

        # ---------------- LN1 + q/k/v projections -------------------- #
        h[:] = _ln(x[:], ln_ref[0, 0], ln_ref[0, 1]).astype(jnp.bfloat16)
        qkv[:, 0:D] = wdot(h[:], QW)
        qkv[:, D : 2 * D] = wdot(h[:], KW)
        qkv[:, 2 * D : 3 * D] = wdot(h[:], VW)

        # ------------- self-attention + o projection ----------------- #
        sel = sel_ref[:]  # (bk, BKT) f32
        jj = jax.lax.broadcasted_iota(jnp.int32, (bk, BKT), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (bk, BKT), 1)
        place = (cc == pos * bk + jj).astype(jnp.bfloat16)  # (bk, BKT)
        cc1 = jax.lax.broadcasted_iota(jnp.int32, (1, BKT), 1)
        colmask = (cc1 >= pos * bk) & (cc1 < pos * bk + bk)  # (1, BKT)
        for grp in range(ng_c):
            gslot = (l * ng_c + grp) % 2
            nxt_g = l * ng_c + grp + 1
            gd0 = grp * g_c * Dh

            @pl.when(nxt_g < (L * ng_c))
            def _():
                # the slot being refilled held group nxt_g-2, whose
                # write-back must have landed first
                @pl.when(nxt_g >= 2)
                def _():
                    kwdma(nxt_g - 2, nxt_g % 2).wait()
                    vwdma(nxt_g - 2, nxt_g % 2).wait()

                kdma(nxt_g, nxt_g % 2).start()
                vdma(nxt_g, nxt_g % 2).start()

            kdma(l * ng_c + grp, gslot).wait()
            vdma(l * ng_c + grp, gslot).wait()
            # inject the new columns into the resident slab, then stream
            # the slab back (this IS the cache update; `sel` masks the
            # current position out of this step's scores)
            newk = qkv[:, D + gd0 : D + gd0 + g_c * Dh].astype(jnp.bfloat16)
            kbuf[gslot] = jnp.where(
                colmask,
                jax.lax.dot_general(
                    newk, place, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16),
                kbuf[gslot],
            )
            newv = qkv[:, 2 * D + gd0 : 2 * D + gd0 + g_c * Dh].astype(
                jnp.bfloat16
            )
            vbuf[gslot] = jnp.where(
                colmask,
                jax.lax.dot_general(
                    newv, place, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16),
                vbuf[gslot],
            )
            kwdma(l * ng_c + grp, gslot).start()
            vwdma(l * ng_c + grp, gslot).start()
            for hl in range(g_c):
                hh = grp * g_c + hl
                q_h = qkv[:, hh * Dh : (hh + 1) * Dh]  # (bk, Dh) f32
                k_h = qkv[:, D + hh * Dh : D + (hh + 1) * Dh]
                v_h = qkv[:, 2 * D + hh * Dh : 2 * D + (hh + 1) * Dh]
                scores = (
                    jnp.dot(
                        q_h.astype(jnp.bfloat16),
                        kbuf[gslot, hl * Dh : (hl + 1) * Dh],
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )  # (bk, BKT)
                scores = jnp.where(sel > 0, scores, NEG)
                s_self = jnp.sum(q_h * k_h, axis=1, keepdims=True) * scale
                m = jnp.maximum(
                    jnp.max(scores, axis=1, keepdims=True), s_self
                )
                e = jnp.exp(scores - m)
                e_self = jnp.exp(s_self - m)  # (bk, 1)
                denom = jnp.sum(e, axis=1, keepdims=True) + e_self
                out_h = jax.lax.dot_general(
                    e.astype(jnp.bfloat16),
                    vbuf[gslot, hl * Dh : (hl + 1) * Dh],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (bk, Dh)
                out_h = (out_h + e_self * v_h) / denom
                attn[:, hh * Dh : (hh + 1) * Dh] = out_h
        x[:] = x[:] + wdot(attn[:].astype(jnp.bfloat16), OW)

        # ---------------------------- mlp ----------------------------- #
        h[:] = _ln(x[:], ln_ref[0, 2], ln_ref[0, 3]).astype(jnp.bfloat16)
        for i in range(4):
            # Mosaic has no erf lowering: tanh-approx gelu — and GPT2's
            # gelu_new IS the tanh approximation, so this is exact here
            gbuf[:, i * D : (i + 1) * D] = jax.nn.gelu(
                wdot(h[:], W1_0 + i), approximate=True
            ).astype(jnp.bfloat16)
        for i in range(4):
            wchunk, schunk, bchunk = use_w(W2_0 + i)
            part = jnp.dot(
                gbuf[:, i * D : (i + 1) * D],
                wchunk.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            if i == 0:
                yacc[:] = part
            else:
                yacc[:] = yacc[:] + part
            if i == 3:
                x[:] = x[:] + yacc[:] * schunk[0][None, :] + bchunk[None, :]

        @pl.when(l == L - 1)
        def _():
            # last two slab write-backs have no later read to pair their
            # waits with — drain them here
            total = L * ng_c
            for g in range(max(0, total - 2), total):
                kwdma(g, g % 2).wait()
                vwdma(g, g % 2).wait()
            x_out[:] = x[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, NC, 1, D), lambda l, pos: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 1, D), lambda l, pos: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, D), lambda l, pos: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, D), lambda l, pos: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, BKT), lambda l, pos: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bk, D), lambda l, pos: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),      # x
            pltpu.VMEM((bk, D), jnp.bfloat16),     # h
            pltpu.VMEM((bk, 3 * D), jnp.float32),  # qkv
            pltpu.VMEM((bk, D), jnp.float32),      # attn
            pltpu.VMEM((bk, F), jnp.bfloat16),     # gbuf
            pltpu.VMEM((bk, D), jnp.float32),      # yacc
            pltpu.VMEM((2, D, D), jnp.int8),       # wbuf
            pltpu.VMEM((2, g_c * Dh, BKT), jnp.bfloat16),  # kbuf
            pltpu.VMEM((2, g_c * Dh, BKT), jnp.bfloat16),  # vbuf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bk, D), jnp.float32),
            jax.ShapeDtypeStruct((L, D, BKT), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, D, BKT), jnp.bfloat16),
        ],
        # flattened-input indices (0 = the pos scalar): kc=7, vc=8 alias
        # the cache outputs 1, 2 — the decode loop never copies the cache
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() == "cpu",
    )

    def step(packed, x_emb, k_cache, v_cache, sel, pos):
        return call(
            jnp.asarray(pos, jnp.int32).reshape(1),
            packed.s, packed.b, packed.ln, x_emb, sel,
            packed.w, k_cache, v_cache,
        )

    return step


# --------------------------------------------------------------------- #
# Pure-XLA mirror of the kernel math (tests)
# --------------------------------------------------------------------- #
def fused_gpt_step_reference(
    cfg: GPTConfig, packed: PackedGPT, x_emb, k_cache, v_cache, sel, pos
):
    """Mirror of the kernel math (caches flat (L, D, bk*T), TIME-MAJOR
    columns like the kernel). Returns (x, k_cache', v_cache') with this
    step's K/V written at columns pos*bk + row."""
    D = cfg.d_model
    H = cfg.n_head
    Dh = D // H
    L = cfg.n_layer
    bk = x_emb.shape[0]
    BKT = k_cache.shape[-1]
    kcv = k_cache.reshape(L, H, Dh, BKT)
    vcv = v_cache.reshape(L, H, Dh, BKT)
    scale = Dh**-0.5

    def wdot(src, l, ci):
        y = jnp.dot(
            src, packed.w[l, ci].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return y * packed.s[l, ci] + packed.b[l, ci]

    x = x_emb
    k_news, v_news = [], []
    for l in range(L):
        h = _ln(x, packed.ln[l, 0], packed.ln[l, 1]).astype(jnp.bfloat16)
        q = wdot(h, l, QW)
        k = wdot(h, l, KW)
        v = wdot(h, l, VW)
        k_news.append(k.astype(jnp.bfloat16))
        v_news.append(v.astype(jnp.bfloat16))
        outs = []
        for hh in range(H):
            q_h = q[:, hh * Dh : (hh + 1) * Dh]
            k_h = k[:, hh * Dh : (hh + 1) * Dh]
            v_h = v[:, hh * Dh : (hh + 1) * Dh]
            scores = (
                jnp.dot(
                    q_h.astype(jnp.bfloat16), kcv[l, hh],
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            scores = jnp.where(sel > 0, scores, NEG)
            s_self = jnp.sum(q_h * k_h, axis=1, keepdims=True) * scale
            m = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), s_self)
            e = jnp.exp(scores - m)
            e_self = jnp.exp(s_self - m)
            denom = jnp.sum(e, axis=1, keepdims=True) + e_self
            out_h = jnp.einsum(
                "bt,dt->bd", e.astype(jnp.bfloat16), vcv[l, hh],
                preferred_element_type=jnp.float32,
            )
            outs.append((out_h + e_self * v_h) / denom)
        attn = jnp.concatenate(outs, axis=1)
        x = x + wdot(attn.astype(jnp.bfloat16), l, OW)

        h = _ln(x, packed.ln[l, 2], packed.ln[l, 3]).astype(jnp.bfloat16)
        g_parts = [
            jax.nn.gelu(wdot(h, l, W1_0 + i), approximate=True).astype(
                jnp.bfloat16
            )
            for i in range(4)
        ]
        y = sum(
            jnp.dot(
                g_parts[i], packed.w[l, W2_0 + i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            for i in range(4)
        )
        x = x + y * packed.s[l, W2_0 + 3] + packed.b[l, W2_0 + 3]

    kc, vc = k_cache, v_cache
    for r in range(bk):
        kc = kc.at[:, :, pos * bk + r].set(
            jnp.stack(k_news)[:, r, :]
        )
        vc = vc.at[:, :, pos * bk + r].set(
            jnp.stack(v_news)[:, r, :]
        )
    return x, kc, vc
