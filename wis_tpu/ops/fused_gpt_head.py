"""Fused XTTS-GPT sampling head: double final-LN + audio-code logits +
repetition penalty + temperature + top-k + top-p + the categorical draw,
in ONE Pallas kernel.

After ops/fused_gpt.py collapsed the 30-layer stack to one launch, the
per-token epilogue stayed ~25 small XLA ops (~0.6 ms of the 1.34 ms
token: two LayerNorms, the (D, 1026) head, a 605×1026 one-hot history
reduction, a full sort for top-k, a cumsum for top-p, the gumbel
draw — docs/NEXT.md round-3 gap #2). This kernel replaces all of it:

- LN/logits staging mirrors the XLA path bit-for-bit (bf16 rounding at
  the same points, f32 statistics).
- the history one-hot is gone: the caller carries a (1, V_pad) hit-mask
  updated incrementally (one op/token), initialized per chunk from the
  same `history` array, so the mask — including the reference path's
  token-0-from-zero-padding behavior — is IDENTICAL to
  `_mask_logits`'s per-step one-hot.
- top-k / top-p need only threshold VALUES, not a sort. kth largest =
  min{l(t) : #{l > l(t)} ≤ k−1} (exactly sorted_desc[k−1], ties
  included). For top-p, `_mask_logits` counts kept positions over the
  PRE-top-k sorted distribution with reversed-stable-sort tie order
  (equal values ordered by descending index); the kernel reproduces
  that exactly: prefix(t) = Σ P(t')·[l(t')>l(t) or (l(t')==l(t) and
  t'>t)], cutoff = #{prefix < p}, pth = cutoff-th largest. Comparisons
  run as 9 unrolled (128, V_pad) row-chunks — ~1.3 M VPU compares,
  microseconds.
- the draw: the caller passes the SAME gumbel row jax.random.categorical
  would add (gumbel(sub, logits.shape)), so sampled tokens are identical
  to the XLA path given equal logits; greedy is the argmax of the masked
  logits; do_sample selects in-kernel.

Reference analog: Coqui samples through HF LogitsProcessors inside
`inference_stream` (reference xtts/main.py:297-314); the staging order
(penalty → temperature → top-k → top-p) is oracle-tested against those
processors in tests/test_xtts_gpt_oracle.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wis_tpu.models.xtts.gpt import GPTConfig

NEG = -1e30
BIG = 1e30
RC = 128  # comparison row-chunk


def v_padded(v: int) -> int:
    return ((v + 127) // 128) * 128


def build_fused_gpt_head(cfg: GPTConfig, *, dtype=jnp.bfloat16):
    """Return fn(x (1, D) f32, ln4 (4, D) f32, head_w (D, Vp) dtype,
    head_b (1, Vp) f32, hist (1, Vp) f32, gum (1, Vp) f32,
    knobs (1, 8) f32) → (tok (1, 1) i32, hidden (1, D) f32,
    logits_masked (1, Vp) f32).

    knobs columns: [temperature, top_k, top_p, repetition_penalty,
    stop_blocked, do_sample, 0, 0]. `dtype` is the model working dtype —
    the LN/head rounding staging matches run_decode_chunk_fused's XLA
    epilogue exactly (bf16 production, f32 micro tests)."""
    d = cfg.d_model
    v = cfg.n_audio_vocab
    vp = v_padded(v)
    nch = vp // RC
    stop_tok = cfg.stop_audio_token
    is_bf16 = dtype == jnp.bfloat16

    def _ln_rows(xv, g, b):
        x32 = xv.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return (((x32 - mu) * jax.lax.rsqrt(var + 1e-5)) * g + b)

    def kernel(
        x_ref, ln_ref, w_ref, b_ref, hist_ref, gum_ref, knobs_ref,
        tok_out, hid_out, log_out,
        lt, gt,
    ):
        # ---- double LN + head matmul (XLA-path staging) ----
        xdt = x_ref[:].astype(dtype)
        h1 = _ln_rows(xdt, ln_ref[0:1], ln_ref[1:2]).astype(dtype)
        hidden = _ln_rows(h1, ln_ref[2:3], ln_ref[3:4]).astype(dtype)
        hid_out[:] = hidden.astype(jnp.float32)
        dot = jnp.dot(hidden, w_ref[:], preferred_element_type=jnp.float32)
        if is_bf16:
            l = (dot.astype(jnp.bfloat16) + b_ref[:].astype(jnp.bfloat16)).astype(
                jnp.float32
            )
        else:
            l = dot + b_ref[:]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, vp), 1)
        l = jnp.where(col < v, l, NEG)

        # ---- stop-token floor (min_audio_tokens) ----
        sb = knobs_ref[0:1, 4:5]
        l = jnp.where((col == stop_tok) & (sb > 0), NEG, l)

        # ---- repetition penalty (CTRL-style, on the hit-mask) ----
        rp = knobs_ref[0:1, 3:4]
        pen = jnp.where(l > 0, l / rp, l * rp)
        l = jnp.where(hist_ref[:] > 0, pen, l)

        # ---- temperature ----
        l = l / jnp.maximum(knobs_ref[0:1, 0:1], 1e-5)

        # ---- transpose l into (vp, 1) via chunked identity dots ----
        for r in range(nch):
            rr = jax.lax.broadcasted_iota(jnp.int32, (RC, vp), 0) + r * RC
            cc = jax.lax.broadcasted_iota(jnp.int32, (RC, vp), 1)
            eye = (cc == rr).astype(jnp.float32)
            lt[r * RC : (r + 1) * RC] = jax.lax.dot_general(
                eye, l, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # ---- pre-top-k softmax (what _mask_logits' cumsum sees) ----
        m = jnp.max(l, axis=1, keepdims=True)
        e = jnp.exp(l - m)
        probs = e / jnp.sum(e, axis=1, keepdims=True)  # (1, vp)

        # ---- one stats pass: per-token greater-count and tie-aware
        #      prefix mass; running kth-candidate min and kept-count ----
        kf = jnp.maximum(knobs_ref[0:1, 1:2], 1.0)  # (1,1) top_k clip ≥ 1
        p = knobs_ref[0:1, 2:3]  # (1,1)
        kth = jnp.full((1, 1), BIG, jnp.float32)
        cnt = jnp.zeros((1, 1), jnp.float32)
        for r in range(nch):
            bc = lt[r * RC : (r + 1) * RC]  # (RC, 1)
            a = jnp.broadcast_to(l, (RC, vp))
            pb = jnp.broadcast_to(probs, (RC, vp))
            mgt = a > bc
            rr = jax.lax.broadcasted_iota(jnp.int32, (RC, vp), 0) + r * RC
            cc = jax.lax.broadcasted_iota(jnp.int32, (RC, vp), 1)
            tie = (a == bc) & (cc > rr)
            gt_c = jnp.sum(mgt.astype(jnp.float32), axis=1, keepdims=True)
            gt[r * RC : (r + 1) * RC] = gt_c
            prefix = jnp.sum(
                jnp.where(mgt | tie, pb, 0.0), axis=1, keepdims=True
            )
            cnt = cnt + jnp.sum(
                (prefix < p).astype(jnp.float32), axis=0, keepdims=True
            )
            cand = jnp.where(gt_c <= kf - 1.0, bc, BIG)
            kth = jnp.minimum(kth, jnp.min(cand, axis=0, keepdims=True))

        # ---- thresholds → masked logits (sequential masking ≡ the XLA
        #      path: values below kth are NEG before the pth compare) ----
        cntc = jnp.maximum(cnt, 1.0)
        pth_cand = jnp.where(gt[:] <= cntc - 1.0, lt[:], BIG)
        pth = jnp.min(pth_cand, axis=0, keepdims=True)  # (1, 1)
        l = jnp.where(l < kth, NEG, l)
        l = jnp.where(l < pth, NEG, l)
        log_out[:] = l

        # ---- draw: argmax(l + gumbel) vs greedy argmax, lowest index ----
        def argmax_row(vals):
            mv = jnp.max(vals, axis=1, keepdims=True)
            return jnp.min(
                jnp.where(vals >= mv, col, vp + 1), axis=1, keepdims=True
            )

        idx_s = argmax_row(l + gum_ref[:])
        idx_g = argmax_row(l)
        ds = knobs_ref[0:1, 5:6]
        # (1,1) store — Mosaic rejects scalar stores to VMEM
        tok_out[:, :] = jnp.where(ds > 0, idx_s, idx_g).astype(jnp.int32)

    call = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, vp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((vp, 1), jnp.float32),  # lt — transposed logits
            pltpu.VMEM((vp, 1), jnp.float32),  # gt — per-token #greater
        ],
        interpret=jax.default_backend() == "cpu",
    )

    def head(x, ln4, head_w, head_b, hist, gum, knobs):
        tok, hidden, logits = call(x, ln4, head_w, head_b, hist, gum, knobs)
        return tok, hidden, logits

    return head


def pack_head(params: dict, cfg: GPTConfig, dtype=jnp.bfloat16):
    """One-time packing of the head leaves into kernel layout:
    (ln4 (4, D) f32, head_w (D, Vp) dtype, head_b (1, Vp) f32)."""
    vp = v_padded(cfg.n_audio_vocab)
    pad = vp - cfg.n_audio_vocab
    ln4 = jnp.stack(
        [params["gpt_lnf_g"], params["gpt_lnf_b"], params["lnf_g"], params["lnf_b"]]
    ).astype(jnp.float32)
    head_w = jnp.pad(params["head_w"].astype(dtype), ((0, 0), (0, pad)))
    head_b = jnp.pad(
        params["head_b"].astype(jnp.float32), (0, pad)
    ).reshape(1, vp)
    return ln4, head_w, head_b
