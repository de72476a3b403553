"""Fused decode-step head: final-LN + vocab logits + per-beam top-k +
logsumexp in ONE Pallas kernel.

The XLA tail of a decode step (layer_norm → (BK, D)×(V, D) logits matmul
→ top_k → logsumexp) costs ~0.61 ms on large-v2 (BENCH.md glue probe):
three separate passes whose traffic is dominated by re-reading the
51865×1280 bf16 embedding and materializing (BK, V) logits in HBM. This
kernel streams the embedding once in auto-pipelined (C, D) chunks and
keeps everything else in VMEM:

    per chunk: logits_c = LN(x) @ emb_c^T + suppress_c
               (pad columns masked by global index)
               → online logsumexp carry (running max + rescaled sum)
               → the chunk's top-k via k× (row-max, argmin-index, mask)
    outputs:   per-chunk top-k values/indices (tiny), running max, sum

The caller finishes with one cheap XLA top_k over the NCH*k per-chunk
candidates — the global top-k of a union is always contained in the
per-chunk top-ks. Static suppress masks fold into the chunk adds; the
timestamp grammar (grammar=True) folds in too — its rules are per-beam
int32 scalars (need_ts, need_text, min_ts) compared against the chunk's
global column ids, so with_timestamps programs keep the fused head
(decoding/beam.py). Grammar mode additionally tracks the timestamp-
region logsumexp and the best text logit online, plus a SECOND per-chunk
candidate set restricted to timestamp columns — whisper's "if total
timestamp probability outweighs the best text token, force a timestamp"
rule (HF WhisperTimeStampLogitsProcessor / openai ApplyTimestampRules)
resolves in XLA by switching to the timestamp-only candidates.

Reference analog: CTranslate2's fused projection+sampling step
(reference main.py:687-693 delegates to it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wis_tpu.models.whisper.config import WhisperConfig

NEG = -1e30
CHUNK = 512
KPAD = 8  # per-chunk candidate slots (top-k padded to a sublane tile)


def build_fused_logits_topk(
    cfg: WhisperConfig,
    *,
    bk: int,
    k: int,
    grammar: bool = False,
    ts_base: int = 0,
    eot: int = 0,
    full_lse: bool = False,
    emb_int8: bool = False,
):
    """Return fn(x (bk, D) f32, ln_g, ln_b (D,), emb (V, D) bf16,
    sup (1, V_pad) f32[, ts_state (bk, 4) i32]) → (cand_val (bk, k) f32,
    cand_tok (bk, k) i32, lse (bk, 1) f32).

    emb_int8=True: `emb` is the per-row int8 QuantLeaf
    (ops/quant.quantize_rows of tok_emb) — the kernel streams HALF the
    embedding bytes (66 vs 133 MB/step on large-v2, the head's dominant
    cost) and applies each row's scale after the chunk dot, identical
    math to the XLA logits tail (models/whisper/model.py).

    grammar=True adds whisper's timestamp grammar as in-kernel masking.
    ts_state columns: [0] need_ts (no plain-text token may follow an
    unpaired timestamp; ids ≥ EOT stay legal), [1] need_text (next token
    must not be a timestamp), [2] min_ts (timestamp ids below this are
    suppressed — the caller bakes the open-pair equality rule into the
    threshold), [3] unused pad. `ts_base`/`eot` are the static token-id
    constants. The timestamp-probability force rule is resolved by the
    XLA tail from the kernel's online region stats.

    full_lse=True computes the logsumexp over the PRE-suppression
    logits (pad columns still excluded) — HF `.generate()` normalizes
    log-probs before its processors mask; the default normalizes over
    the suppressed distribution (OpenAI/CT2 semantics). Candidate
    selection always uses the suppressed values.
    """
    assert k <= KPAD
    D = cfg.n_text_state
    V = cfg.n_vocab
    # int8 halves the block bytes: doubling the chunk keeps VMEM flat
    # while halving the auto-pipelined grid's per-step overhead
    CHUNK = 1024 if emb_int8 else 512
    nch = (V + CHUNK - 1) // CHUNK
    v_pad = nch * CHUNK

    def kernel(x_in, ln_ref, emb_ref, *rest):
        if emb_int8:
            es_ref, sup_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            sup_ref = rest[0]
            rest = rest[1:]
        if grammar:
            ts_ref = rest[0]
            (
                val_out, idx_out, m_out, s_out,
                val2_out, idx2_out, mts_out, sts_out, mtext_out,
                xn, m, sacc, m_ts, s_ts, m_text,
            ) = rest[1:]
        else:
            (val_out, idx_out, m_out, s_out, xn, m, sacc) = rest
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            x32 = x_in[:].astype(jnp.float32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            xn[:] = (
                (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln_ref[0] + ln_ref[1]
            ).astype(jnp.bfloat16)
            m[:] = jnp.full_like(m, NEG)
            sacc[:] = jnp.zeros_like(sacc)
            if grammar:
                m_ts[:] = jnp.full_like(m_ts, NEG)
                s_ts[:] = jnp.zeros_like(s_ts)
                m_text[:] = jnp.full_like(m_text, NEG)

        dot = jax.lax.dot_general(
            xn[:], emb_ref[:].astype(jnp.bfloat16) if emb_int8 else emb_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, CHUNK)
        if emb_int8:
            dot = dot * es_ref[0][None, :]  # per-vocab-row scales
        col = jax.lax.broadcasted_iota(jnp.int32, (bk, CHUNK), 1)
        gcol = col + c * CHUNK
        pad_ok = gcol < V
        raw = jnp.where(pad_ok, dot, NEG)  # pad columns
        logits = jnp.where(pad_ok, dot + sup_ref[0][None, :], NEG)

        if grammar:
            is_ts = gcol >= ts_base  # (bk, CHUNK)
            bad = (
                ((ts_ref[:, 0:1] > 0) & (gcol < eot))
                | ((ts_ref[:, 1:2] > 0) & is_ts)
                | (is_ts & (gcol < ts_ref[:, 2:3]))
            )
            logits = jnp.where(bad, NEG, logits)

        # online logsumexp (pre-suppression logits when full_lse — HF's
        # normalize-then-mask order; see build docstring)
        lse_src = raw if full_lse else logits
        cm = jnp.max(lse_src, axis=1, keepdims=True)  # (bk, 1)
        new_m = jnp.maximum(m[:], cm)
        sacc[:] = sacc[:] * jnp.exp(m[:] - new_m) + jnp.sum(
            jnp.exp(lse_src - new_m), axis=1, keepdims=True
        )
        m[:] = new_m

        def chunk_topk(values, vout, iout):
            v = values
            for j in range(KPAD):
                if j < k:
                    mj = jnp.max(v, axis=1, keepdims=True)  # (bk, 1)
                    ij = jnp.min(
                        jnp.where(v >= mj, col, CHUNK + 1),
                        axis=1, keepdims=True,
                    )  # (bk, 1)
                    vout[0, :, j] = mj[:, 0]
                    iout[0, :, j] = ij[:, 0] + c * CHUNK
                    v = jnp.where(col == ij, NEG, v)
                else:
                    vout[0, :, j] = jnp.full((bk,), NEG, jnp.float32)
                    iout[0, :, j] = jnp.zeros((bk,), jnp.int32)

        # chunk top-k: k × (row-max, lowest-index argmax, mask out)
        chunk_topk(logits, val_out, idx_out)

        if grammar:
            # region stats + timestamp-only candidates for the force rule
            ts_vals = jnp.where(is_ts, logits, NEG)
            text_vals = jnp.where(is_ts, NEG, logits)
            cmt = jnp.max(ts_vals, axis=1, keepdims=True)
            new_mts = jnp.maximum(m_ts[:], cmt)
            # all-masked chunks keep exp contributions at exactly zero
            # (NEG - NEG would exp to 1 per column otherwise)
            w = jnp.where(
                ts_vals > NEG * 0.5, jnp.exp(ts_vals - new_mts), 0.0
            )
            s_ts[:] = s_ts[:] * jnp.exp(m_ts[:] - new_mts) + jnp.sum(
                w, axis=1, keepdims=True
            )
            m_ts[:] = new_mts
            m_text[:] = jnp.maximum(
                m_text[:], jnp.max(text_vals, axis=1, keepdims=True)
            )
            chunk_topk(ts_vals, val2_out, idx2_out)

        @pl.when(c == nch - 1)
        def _():
            m_out[:] = m[:]
            s_out[:] = sacc[:]
            if grammar:
                mts_out[:] = m_ts[:]
                sts_out[:] = s_ts[:]
                mtext_out[:] = m_text[:]

    in_specs = [
        pl.BlockSpec((bk, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((CHUNK, D), lambda c: (c, 0),
                     memory_space=pltpu.VMEM),
    ]
    if emb_int8:
        in_specs.append(
            pl.BlockSpec((1, CHUNK), lambda c: (0, c),
                         memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec((1, CHUNK), lambda c: (0, c), memory_space=pltpu.VMEM)
    )
    if grammar:
        in_specs.append(
            pl.BlockSpec((bk, 4), lambda c: (0, 0), memory_space=pltpu.VMEM)
        )
    out_specs = [
        pl.BlockSpec((1, bk, KPAD), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, KPAD), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, 1), lambda c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, 1), lambda c: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nch, bk, KPAD), jnp.float32),
        jax.ShapeDtypeStruct((nch, bk, KPAD), jnp.int32),
        jax.ShapeDtypeStruct((bk, 1), jnp.float32),
        jax.ShapeDtypeStruct((bk, 1), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((bk, D), jnp.bfloat16),   # xn
        pltpu.VMEM((bk, 1), jnp.float32),    # running max
        pltpu.VMEM((bk, 1), jnp.float32),    # running sumexp
    ]
    if grammar:
        out_specs += [
            pl.BlockSpec((1, bk, KPAD), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, KPAD), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, 1), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, 1), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, 1), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((nch, bk, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((nch, bk, KPAD), jnp.int32),
            jax.ShapeDtypeStruct((bk, 1), jnp.float32),
            jax.ShapeDtypeStruct((bk, 1), jnp.float32),
            jax.ShapeDtypeStruct((bk, 1), jnp.float32),
        ]
        scratch_shapes += [
            pltpu.VMEM((bk, 1), jnp.float32),  # running ts max
            pltpu.VMEM((bk, 1), jnp.float32),  # running ts sumexp
            pltpu.VMEM((bk, 1), jnp.float32),  # running text max
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nch,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )

    def head(x, ln_g, ln_b, emb, sup, ts_state=None):
        """→ (cand_val (bk, k) f32 suppressed logits, cand_tok (bk, k)
        i32, lse (bk, 1) f32) — drop-in for the XLA
        top_k(logits + sup) + logsumexp tail. With emb_int8, `emb` is
        the quantize_rows leaf {"q": (V, D) i8, "s": (V, 1) f32}."""
        ln = jnp.stack([ln_g, ln_b]).astype(jnp.float32)
        if emb_int8:
            args = (x, ln, emb["q"], emb["s"].reshape(1, -1),
                    sup.reshape(1, -1))
        else:
            args = (x, ln, emb, sup.reshape(1, -1))
        if grammar:
            args = args + (ts_state,)
            cv, ci, m, s, cv2, ci2, mts, sts, mtext = call(*args)
        else:
            cv, ci, m, s = call(*args)

        def _pick(cvx, cix):
            flat_v = cvx.transpose(1, 0, 2).reshape(bk, -1)
            flat_i = cix.transpose(1, 0, 2).reshape(bk, -1)
            best, slot = jax.lax.top_k(flat_v, k)
            return best, jnp.take_along_axis(flat_i, slot, axis=1)

        best, tok = _pick(cv, ci)
        lse = m + jnp.log(jnp.maximum(s, 1e-30))
        if grammar:
            # timestamp-probability force rule: when the summed prob of
            # the timestamp region beats the best text token, the legal
            # vocabulary collapses to timestamps
            lse_ts = mts + jnp.log(jnp.maximum(sts, 1e-30))
            force = lse_ts > mtext  # (bk, 1)
            best2, tok2 = _pick(cv2, ci2)
            best = jnp.where(force, best2, best)
            tok = jnp.where(force, tok2, tok)
            if not full_lse:
                lse = jnp.where(force, lse_ts, lse)
        return best, tok, lse

    return head
