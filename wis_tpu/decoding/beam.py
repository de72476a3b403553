"""KV-cached beam-search / greedy decoding under jit.

Replaces CTranslate2's C++ beam-search decoder (reference main.py:687-693:
`whisper_model.generate(features, prompts, beam_size, ...)`) with a single
compiled XLA program per (model, beam, batch-bucket): encoder → cross-KV
precompute → prompt prefill → `lax.while_loop` of single-token steps with
HF/CT2-compatible finished-hypothesis bookkeeping.

TPU-first choices (SURVEY.md §7 "hard parts"):
- **Static shapes everywhere**: batch is padded to a bucket, the token
  budget is a static bound; the *runtime* token cap is a traced scalar in
  the loop condition so short utterances exit early without recompiling.
- **One dispatch per request**: the entire pipeline is one jit program —
  no per-token Python, no host↔device ping-pong (the reference pays a
  Python→C++ boundary per batch, main.py:676-693).
- **Beam state is data, not control flow**: the cache is never resized;
  beams re-parent through gathers (or the ancestry map — see below).
- Greedy (K=1) is a separate static branch of the same builder: stop at
  the first EOT, exactly like HF `greedy_search` / CT2 `beam_size=1`.

Beam semantics (K ≥ 2) — oracle-compatible hypothesis search
------------------------------------------------------------
Finished sequences are stored OUT of the running set and their slots
refilled, matching HF `transformers` `_beam_search` (generation/utils.py,
v4.57: top-2K candidate pool, finished-store merge, early-stop
heuristic with `early_stopping=False`) and OpenAI whisper's
BeamSearchDecoder — validated token-exactly against HF `.generate()` in
tests/test_hf_parity.py:

- each step ranks the top-2K global continuations; the K best that are
  NOT finished (EOT, or the token budget is exhausted) continue as
  running beams;
- candidates that finish within the global top-K are merged into a
  K-slot finished store, scored `sum_logprob / gen_len**length_penalty`
  (gen_len includes the EOT — the same normalization HF applies);
- the loop exits early when every finished slot is filled and the best
  running beam can no longer beat the worst finished score (HF's
  `early_stopping=False` heuristic), or at the token cap, where the
  final top-K candidates fold into the store.

The 2K pool is built from per-beam top-(K+1) candidates: EOT is a single
token, so a beam contributes at most one finished candidate — its
first K non-EOT candidates plus its EOT candidate are all contained in
its own top-(K+1). This keeps the fused logits head's per-chunk
candidate count at K+1 ≤ 8 (ops/fused_logits KPAD).

Suppression + normalization: by default (`renorm_suppressed=True`)
log-probabilities are normalized over the SUPPRESSED distribution —
OpenAI whisper (decoding.py applies logit filters before log_softmax)
and CTranslate2 (disable_tokens pre-softmax) semantics, i.e. what the
reference serves. HF instead normalizes first and then masks;
`renorm_suppressed=False` reproduces that for oracle tests. The two are
identical when no tokens are suppressed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import (
    DecoderCache,
    cross_kv,
    decode_step,
    encode,
    prefill,
)
from wis_tpu.models.whisper.tokenizer import EOT

NEG_INF = -1e30
#: HF beam search's "effectively -inf" gating constant — mirrored so the
#: finished-store merge tie-breaks identically (generation/utils.py)
GATE = -1.0e9


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # (B, K, max_new) int32, EOT-padded
    lengths: jnp.ndarray  # (B, K) int32 — emitted tokens incl. EOT
    scores: jnp.ndarray  # (B, K) f32 — length-normalized logprob
    best: jnp.ndarray  # (B,) int32 — argmax beam per sequence


class _GreedyState(NamedTuple):
    t: jnp.ndarray  # () int32 — tokens emitted so far
    tokens: jnp.ndarray  # (B, 1) int32 — last token
    sum_lp: jnp.ndarray  # (B, 1) f32
    finished: jnp.ndarray  # (B, 1) bool
    out: jnp.ndarray  # (B, 1, max_new) int32
    out_len: jnp.ndarray  # (B, 1) int32
    cache: DecoderCache
    anc: jnp.ndarray  # (B, 1, cache_len) int32 ancestry map (-1 unwritten)
    prev_ts: jnp.ndarray  # (B, 1) bool — last emitted token is a timestamp
    prevprev_ts: jnp.ndarray  # (B, 1) bool
    max_ts: jnp.ndarray  # (B, 1) int32 — highest timestamp token emitted


class _BeamState(NamedTuple):
    t: jnp.ndarray  # () int32 — tokens emitted so far
    tokens: jnp.ndarray  # (B, K) int32 — running beams' last token
    sum_lp: jnp.ndarray  # (B, K) f32 — running accumulated logprobs
    out: jnp.ndarray  # (B, K, max_new) int32 — running histories
    cache: DecoderCache
    anc: jnp.ndarray  # (B, K, cache_len) int32 ancestry map (-1 unwritten)
    prev_ts: jnp.ndarray  # (B, K) bool
    prevprev_ts: jnp.ndarray  # (B, K) bool
    max_ts: jnp.ndarray  # (B, K) int32
    # finished-hypothesis store (sorted best-first by construction)
    fin_out: jnp.ndarray  # (B, K, max_new) int32
    fin_scores: jnp.ndarray  # (B, K) f32 — normalized; GATE = empty slot
    fin_len: jnp.ndarray  # (B, K) int32 — incl. EOT
    fin_mask: jnp.ndarray  # (B, K) bool — slot holds a real hypothesis
    unsat: jnp.ndarray  # (B,) bool — early-stop heuristic not yet satisfied


def _suppress_mask(n_vocab: int, suppress: Tuple[int, ...]) -> np.ndarray:
    m = np.zeros((n_vocab,), dtype=np.float32)
    m[list(suppress)] = NEG_INF
    return m


def build_encode(cfg: WhisperConfig):
    """Jitted encoder + cross-KV precompute: (params, mel) → xa_kv.

    Split from generation so one encoder pass serves transcribe,
    language-detect, and the translate second pass (the reference re-runs
    the CT2 encoder for each generate call; here xa_kv stays resident on
    device, cf. main.py:727-748 reusing `gpu_features`).
    """

    @jax.jit
    def encode_fn(params, mel):
        xa = encode(params, mel, cfg)
        return cross_kv(params, xa, cfg)

    return encode_fn


def build_generate_xa(
    cfg: WhisperConfig,
    *,
    beam_size: int,
    batch: int,
    max_new_tokens: int,
    prompt_len: int,
    suppress_tokens: Tuple[int, ...],
    begin_suppress_tokens: Tuple[int, ...],
    length_penalty: float = 1.0,
    with_timestamps: bool = False,
    ancestry: bool = True,
    fused: bool = False,
    xa_int8: bool = False,
    renorm_suppressed: bool = True,
    eot_id: Optional[int] = None,
    max_initial_ts_index: Optional[int] = 50,
):
    """Return a jitted generate(params, xa_kv, prompt, token_cap) program.

    xa_int8 (fused only): the hoisted cross-attention K/V quantizes to
    per-column int8 before the decode loop (ops/fused_decode.
    quantize_xa_columns) — half the dominant per-step cross-KV stream.
    The scale applies outside the contraction, so it is exact dequant
    semantics over int8-rounded values; rounding noise is the same class
    as the int8 weight quantization production already runs.

    xa_kv: precomputed cross-attention K/V for `batch` windows (from
    build_encode); prompt: (prompt_len,) shared across the batch (the
    reference replicates one prompt per chunk, main.py:688) or
    (batch, prompt_len) per-sequence — per-sequence prompts let the
    dynamic batcher coalesce requests with different languages/tasks
    into one padded TPU batch; token_cap: () int32 runtime cap ≤
    max_new_tokens.

    with_timestamps=True applies whisper's timestamp grammar as in-jit
    masking (a capability the reference never exposes — it always decodes
    with <|notimestamps|>, main.py:656-663): the first emitted token must
    be a timestamp, timestamps come in non-decreasing begin/end pairs,
    and text cannot follow an unpaired timestamp (EOT excepted).

    ancestry=True (default): beam reorders never touch the KV cache —
    each beam always writes its own physical row, the (B, K, cache_len)
    ancestry map records which row holds each logical beam's history,
    and self-attention resolves it at read time (model._self_attn_anc).
    Removes the ~1.7 ms/step full-cache permutation measured on
    large-v2 (BENCH.md). False keeps the physical-reorder path (used by
    equivalence tests).

    fused=True: the per-token decode step runs as ONE Pallas kernel over
    all layers (ops/fused_decode) — int8 weights auto-pipelined, cross-KV
    and the ancestry cache hand-DMA'd in double-buffered head groups —
    removing the ~200-small-ops-per-layer XLA overhead of the scanned
    step. The returned program takes an extra `packed` argument
    (ops.fused_decode.pack_decoder of the same params). The cache is kept
    in kernel layout (L, D, T*BK flat time-major) with T padded to a 128
    multiple; prefill still runs the XLA decoder and the cache is
    transposed once. Coalesced batches (batch > 1) run block-diagonal
    cross-attention over the batch's audio windows inside the kernel.
    Implies ancestry semantics.

    renorm_suppressed=False switches per-step normalization to HF's
    order (log_softmax over the full distribution, masks applied after)
    for oracle parity tests; True (default) is OpenAI/CT2 semantics (see
    module docstring). eot_id overrides the EOT token id (tests use an
    id random weights actually emit to exercise mid-loop finishes).
    """
    from wis_tpu.models.whisper.tokenizer import layout_for_vocab

    # layout-dependent special ids (the v3 vocabulary shifts the
    # task/timestamp block up by one; EOT is layout-invariant)
    _lay = layout_for_vocab(cfg.n_vocab)
    NO_TIMESTAMPS = _lay.no_timestamps
    TIMESTAMP_BASE = _lay.timestamp_base
    eot = EOT if eot_id is None else int(eot_id)

    K, B = beam_size, batch
    BK = B * K
    # per-beam candidate pool: greedy needs only the argmax; beams need
    # K non-EOT + the (single) EOT candidate → K+1 (see module docstring)
    KC = 1 if K == 1 else K + 1
    POOL = 2 * K  # HF beams_to_keep (one EOS token)
    cache_len = prompt_len + max_new_tokens
    if fused:
        from wis_tpu.ops.fused_decode import build_fused_decode_step
        from wis_tpu.ops.fused_logits import build_fused_logits_topk

        # kernel DMA slices want a lane-aligned flat (beam, time) axis
        cache_len = ((cache_len + 127) // 128) * 128
        step_fn = build_fused_decode_step(
            cfg, bk=BK, t_cache=cache_len, s_audio=cfg.n_audio_ctx,
            n_seq=B, xa_int8=xa_int8,
        )
        # the decode tail (LN + logits + top-k + lse) fuses too; the
        # timestamp grammar folds in as per-beam int32 scalars compared
        # against the kernel's global column ids. Two variants — bf16
        # embedding, and per-row int8 (half the head's HBM traffic) —
        # are both constructed (cheap closures); which one traces is
        # decided by the params pytree (quantized trees carry tok_emb_q)
        _head_kw = dict(
            bk=BK, k=KC, grammar=with_timestamps,
            ts_base=TIMESTAMP_BASE, eot=eot,
            full_lse=not renorm_suppressed,
        )
        head_fn = build_fused_logits_topk(cfg, **_head_kw)
        head_fn_q = build_fused_logits_topk(cfg, emb_int8=True, **_head_kw)
        H = cfg.n_text_head
        Dh = cfg.n_text_state // H
        L = cfg.n_text_layer
    base_suppress = tuple(suppress_tokens)
    if with_timestamps:
        base_suppress = base_suppress + (NO_TIMESTAMPS,)
    sup = jnp.asarray(_suppress_mask(cfg.n_vocab, base_suppress))
    begin_extra = tuple(begin_suppress_tokens) + base_suppress
    if with_timestamps:
        # first generated token must be a timestamp, at most
        # max_initial_timestamp (openai default 1.0 s → index 50; HF
        # WhisperTimeStampLogitsProcessor applies the same two begin
        # rules)
        begin_extra = begin_extra + tuple(range(0, TIMESTAMP_BASE))
        if max_initial_ts_index is not None:
            begin_extra = begin_extra + tuple(
                range(TIMESTAMP_BASE + max_initial_ts_index + 1, cfg.n_vocab)
            )
    begin_sup = jnp.asarray(_suppress_mask(cfg.n_vocab, begin_extra))
    is_ts_vec = jnp.arange(cfg.n_vocab) >= TIMESTAMP_BASE  # (V,)

    def _norm_len(t_plus_1):
        """Length-penalty denominator: generated length incl. EOT, the
        normalization HF applies (utils.py `cur_len + 1 -
        decoder_prompt_len`) — and the same convention this repo has
        always reported in GenerateResult.scores."""
        n = t_plus_1.astype(jnp.float32)
        if length_penalty == 1.0:
            return n
        return n ** length_penalty

    def _generate(params, packed, xa_kv, prompt, token_cap):
        dtype = params["decoder"]["tok_emb"].dtype
        cap_eff = jnp.maximum(jnp.minimum(max_new_tokens, token_cap), 1)

        # ---- prefill on batch B ---- #
        cache0 = DecoderCache.zeros(cfg, B, cache_len, dtype)
        if prompt.ndim == 1:
            prompt_b = jnp.broadcast_to(prompt[None, :], (B, prompt_len))
        else:
            prompt_b = prompt
        logits, cache0 = prefill(params, prompt_b, cache0, xa_kv, cfg)
        first_raw = logits[:, -1]  # (B, V) f32
        first_masked = first_raw + begin_sup
        if renorm_suppressed:
            first_lse = jax.scipy.special.logsumexp(
                first_masked, axis=-1, keepdims=True
            )
        else:
            first_lse = jax.scipy.special.logsumexp(
                first_raw, axis=-1, keepdims=True
            )
        first_lp = first_masked - first_lse  # (B, V)

        if fused:
            # kernel layout (L, D, T*BK) flat TIME-MAJOR: heads merged,
            # flat column = t*BK + b*K + k, so each position's BK rows
            # are adjacent — the per-step cache write is ONE contiguous
            # column block on the kernel's aliased pass-through buffers
            def _flat_tmajor(c):  # (L, B, H, Dh, T) → (L, D, T*BK)
                flat = c.reshape(L, B, H * Dh, cache_len).transpose(
                    0, 2, 3, 1
                ).reshape(L, H * Dh, cache_len * B)
                return jnp.repeat(flat, K, axis=-1)

            cache_bk = DecoderCache(
                _flat_tmajor(cache0.k), _flat_tmajor(cache0.v), cache0.pos
            )
            # cross-KV: each sequence's window zero-padded to tile
            # alignment and laid out contiguously along the minor axis
            # (kernel masks pad + other sequences' columns); hoisted out
            # of the decode loop
            s_pad = ((cfg.n_audio_ctx + 127) // 128) * 128
            xa_pad = [(0, 0)] * 4 + [(0, s_pad - cfg.n_audio_ctx)]

            def _flat_xa(xa):  # (L, B, H, Dh, S) → (L, H, Dh, B*S_pad)
                t = jnp.pad(xa.transpose(0, 2, 3, 1, 4), xa_pad)
                return t.reshape(L, H, Dh, B * s_pad)

            xa_k_f = _flat_xa(xa_kv[0])
            xa_v_f = _flat_xa(xa_kv[1])
            xa_s_f = None
            if xa_int8:
                from wis_tpu.ops.fused_decode import quantize_xa_columns

                xa_k_f, xa_v_f, xa_s_f = quantize_xa_columns(xa_k_f, xa_v_f)
        else:
            cache_bk = DecoderCache(
                jnp.repeat(cache0.k, K, axis=1),
                jnp.repeat(cache0.v, K, axis=1),
                cache0.pos,
            )
        # ancestry: prompt positions live in each beam's own (replicated)
        # row; unwritten positions are -1 (masked)
        own_row = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, cache_len)
        )
        anc0 = jnp.where(
            jnp.arange(cache_len)[None, None, :] < prompt_len, own_row, -1
        )

        # ------------------------------------------------------------------
        # Shared per-step computation: run the decoder for the running
        # beams' last tokens and return per-beam candidate continuations.
        # → (cand_val (BK, KC) suppressed values, cand_tok (BK, KC) i32,
        #    lse (BK, 1), cache', anc') — anc' has the current position
        #    marked as own-row (re-parenting happens in the caller).
        # ------------------------------------------------------------------
        def run_step(tokens, cache, anc, prev_ts, prevprev_ts, max_ts):
            if fused:
                # sel from the PRE-update ancestry: the current position
                # is still -1 (excluded, one_hot of a negative is zero)
                # — the step's own K/V join the softmax through the
                # kernel's explicit self column. (BK, T, BK) reshapes
                # straight to the kernel's time-major flat columns
                # (t*BK + row); ancestry is per-sequence, so offsetting
                # by b*K keeps beams inside their own sequence's rows.
                boff = (jnp.arange(B, dtype=jnp.int32) * K)[:, None, None]
                ganc = jnp.where(anc >= 0, anc + boff, -1)
                sel = jax.nn.one_hot(
                    ganc.reshape(BK, cache_len), BK, dtype=jnp.float32
                ).reshape(BK, BK * cache_len)
                dec = params["decoder"]
                x_emb = (
                    jnp.take(dec["tok_emb"], tokens.reshape(BK), axis=0)
                    .astype(jnp.float32)
                    + jnp.take(dec["pos"], cache.pos, axis=0)
                    .astype(jnp.float32)[None]
                )
                # the kernel injects this step's K/V columns into the
                # aliased cache buffers itself — zero XLA-side cache ops
                if xa_int8:
                    x_out, kc_, vc_ = step_fn(
                        packed, x_emb, cache.k, cache.v,
                        xa_k_f, xa_v_f, xa_s_f, sel, cache.pos,
                    )
                else:
                    x_out, kc_, vc_ = step_fn(
                        packed, x_emb, cache.k, cache.v,
                        xa_k_f, xa_v_f, sel, cache.pos,
                    )
                new_cache = DecoderCache(kc_, vc_, cache.pos + 1)
                new_anc = jax.lax.dynamic_update_index_in_dim(
                    anc,
                    jnp.broadcast_to(
                        jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
                    ),
                    cache.pos,
                    axis=2,
                )
                # LN + logits + per-beam top-KC + logsumexp in one Pallas
                # pass over the embedding (ops/fused_logits); the static
                # suppress mask — and the timestamp grammar's per-beam
                # scalars when with_timestamps — fold into the kernel
                dec = params["decoder"]
                ts_state = None
                if with_timestamps:
                    # col 2 is the min legal timestamp id: equality with
                    # the previous timestamp is allowed only while the
                    # pair is open (HF/openai monotonicity rule)
                    min_ts = jnp.where(
                        prev_ts & ~prevprev_ts, max_ts, max_ts + 1
                    )
                    ts_state = jnp.stack(
                        [
                            (prev_ts & ~prevprev_ts)
                            .reshape(BK).astype(jnp.int32),
                            (prev_ts & prevprev_ts)
                            .reshape(BK).astype(jnp.int32),
                            min_ts.reshape(BK),
                            jnp.zeros((BK,), jnp.int32),
                        ],
                        axis=1,
                    )
                if "tok_emb_q" in dec:
                    cand_val, cand_tok, lse = head_fn_q(
                        x_out, dec["ln"]["g"], dec["ln"]["b"],
                        dec["tok_emb_q"], sup, ts_state,
                    )
                else:
                    cand_val, cand_tok, lse = head_fn(
                        x_out, dec["ln"]["g"], dec["ln"]["b"],
                        dec["tok_emb"], sup, ts_state,
                    )
                return cand_val, cand_tok, lse, new_cache, new_anc

            if ancestry:
                # this step writes position cache.pos in each beam's own
                # physical row — record it before attention reads it
                new_anc = jax.lax.dynamic_update_index_in_dim(
                    anc,
                    jnp.broadcast_to(
                        jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
                    ),
                    cache.pos,
                    axis=2,
                )
                logits, new_cache = decode_step(
                    params, tokens.reshape(BK), cache, xa_kv, cfg,
                    anc=new_anc,
                )  # (BK, V) f32
            else:
                new_anc = anc
                logits, new_cache = decode_step(
                    params, tokens.reshape(BK), cache, xa_kv, cfg
                )  # (BK, V) f32

            masked = logits + sup
            if with_timestamps:
                # whisper's timestamp grammar, rule-for-rule the same as
                # HF WhisperTimeStampLogitsProcessor (logits_process.py)
                # and openai-whisper ApplyTimestampRules; parity is
                # pinned in test_hf_parity.py
                vocab_ids = jnp.arange(cfg.n_vocab)
                # unpaired timestamp → no plain-text token (ids < EOT);
                # EOT/specials/timestamps stay legal
                need_ts = (prev_ts & ~prevprev_ts).reshape(BK)[:, None]
                masked = jnp.where(
                    need_ts & (vocab_ids < eot)[None, :], NEG_INF, masked
                )
                # closed pair → next must be text (no timestamp)
                need_text = (prev_ts & prevprev_ts).reshape(BK)[:, None]
                masked = jnp.where(
                    need_text & is_ts_vec[None, :], NEG_INF, masked
                )
                # non-decreasing timestamps: equality allowed only while
                # the pair is open (begin==previous end); strictly
                # increasing otherwise ("avoid <|0.00|> again")
                min_ts = jnp.where(
                    (prev_ts & ~prevprev_ts), max_ts, max_ts + 1
                ).reshape(BK)[:, None]
                masked = jnp.where(
                    is_ts_vec[None, :] & (vocab_ids[None, :] < min_ts),
                    NEG_INF,
                    masked,
                )
                # if the total timestamp probability outweighs the best
                # text token, force a timestamp
                lse_ts = jax.scipy.special.logsumexp(
                    masked[:, TIMESTAMP_BASE:], axis=-1, keepdims=True
                )
                max_text = jnp.max(
                    masked[:, :TIMESTAMP_BASE], axis=-1, keepdims=True
                )
                masked = jnp.where(
                    (lse_ts > max_text) & ~is_ts_vec[None, :],
                    NEG_INF,
                    masked,
                )

            # Per-beam candidate selection: the global top-POOL of
            # sum_lp[k] + lp[k, v] that the search consumes is always
            # contained in the per-beam top-KC (no normalized (B, K·V)
            # tensor is ever materialized or reshaped).
            cand_val, cand_tok = jax.lax.top_k(masked, KC)  # (BK, KC)
            if renorm_suppressed:
                lse = jax.scipy.special.logsumexp(
                    masked, axis=-1, keepdims=True
                )
            else:
                lse = jax.scipy.special.logsumexp(
                    logits, axis=-1, keepdims=True
                )
            return cand_val, cand_tok, lse, new_cache, new_anc

        def reparent_cache(cache, anc, parent):
            """Re-parent running beams after selection. Ancestry/fused:
            the map absorbs the permutation; physical mode gathers rows
            unless the permutation is the identity."""
            if ancestry or fused:
                return cache, jnp.take_along_axis(
                    anc, parent[..., None], axis=1
                )
            global_parent = (
                jnp.arange(B, dtype=jnp.int32)[:, None] * K + parent
            ).reshape(BK)
            # beam parents are frequently the identity — skip the
            # full-cache gather (two ~200 MB copies on large-v2) then
            identity = jnp.array_equal(
                global_parent, jnp.arange(BK, dtype=jnp.int32)
            )
            cache = jax.lax.cond(
                identity,
                lambda c: c,
                lambda c: c.reorder(global_parent),
                cache,
            )
            return cache, anc

        if K == 1:
            return _greedy(
                params, first_lp, cache_bk, anc0, run_step, reparent_cache,
                cap_eff,
            )
        return _beam(
            params, first_lp, cache_bk, anc0, run_step, reparent_cache,
            cap_eff,
        )

    # ------------------------------------------------------------------
    # Greedy (K == 1): argmax each step, stop at the first EOT — HF
    # `greedy_search` / CT2 beam_size=1 semantics (test_hf_parity pins
    # token-exact agreement with HF `.generate(num_beams=1)`).
    # ------------------------------------------------------------------
    def _greedy(params, first_lp, cache_bk, anc0, run_step, reparent, cap_eff):
        top_lp, top_tok = jax.lax.top_k(first_lp, 1)  # (B, 1)
        out = jnp.full((B, 1, max_new_tokens), eot, jnp.int32)
        out = out.at[:, :, 0].set(top_tok)
        state = _GreedyState(
            t=jnp.int32(1),
            tokens=top_tok,
            sum_lp=top_lp,
            finished=top_tok == eot,
            out=out,
            out_len=jnp.ones((B, 1), jnp.int32),
            cache=cache_bk,
            anc=anc0,
            prev_ts=(top_tok >= TIMESTAMP_BASE),
            # a single trailing timestamp at sequence start counts as a
            # CLOSED pair (HF: `penultimate_was_timestamp = len(seq) < 2
            # or ...`) — the initial timestamp is a segment begin and
            # text must follow it
            prevprev_ts=jnp.ones((B, 1), bool),
            max_ts=jnp.maximum(top_tok, TIMESTAMP_BASE),
        )

        def cond(s: _GreedyState):
            return (s.t < cap_eff) & ~jnp.all(s.finished)

        def body(s: _GreedyState) -> _GreedyState:
            cand_val, cand_tok, lse, cache, anc = run_step(
                s.tokens, s.cache, s.anc, s.prev_ts, s.prevprev_ts, s.max_ts
            )
            lp = (cand_val - lse).reshape(B, 1)
            tok = cand_tok.reshape(B, 1).astype(jnp.int32)
            tok = jnp.where(s.finished, eot, tok)
            out = jax.lax.dynamic_update_index_in_dim(
                s.out, tok, s.t, axis=2
            )
            tok_is_ts = tok >= TIMESTAMP_BASE
            return _GreedyState(
                t=s.t + 1,
                tokens=tok,
                sum_lp=s.sum_lp + jnp.where(s.finished, 0.0, lp),
                finished=s.finished | (tok == eot),
                out=out,
                out_len=jnp.where(s.finished, s.out_len, s.out_len + 1),
                cache=cache,
                anc=anc,
                prev_ts=jnp.where(s.finished, s.prev_ts, tok_is_ts),
                prevprev_ts=jnp.where(s.finished, s.prevprev_ts, s.prev_ts),
                max_ts=jnp.where(
                    tok_is_ts & ~s.finished,
                    jnp.maximum(s.max_ts, tok),
                    s.max_ts,
                ),
            )

        s = jax.lax.while_loop(cond, body, state)
        scores = s.sum_lp / _norm_len(s.out_len)
        best = jnp.zeros((B,), jnp.int32)
        return GenerateResult(
            tokens=s.out, lengths=s.out_len, scores=scores, best=best
        )

    # ------------------------------------------------------------------
    # Beam search (K ≥ 2): HF-compatible hypothesis store (see module
    # docstring). `_select` applies one round of HF's candidate
    # processing to a DESC-sorted pool of P global candidates.
    # ------------------------------------------------------------------
    def _beam(params, first_lp, cache_bk, anc0, run_step, reparent, cap_eff):
        fin_out0 = jnp.full((B, K, max_new_tokens), eot, jnp.int32)
        fin0 = (
            fin_out0,
            jnp.full((B, K), GATE, jnp.float32),
            jnp.zeros((B, K), jnp.int32),
            jnp.zeros((B, K), bool),
        )

        def _select(vals, toks, parents, cand_out, t, fin, unsat):
            """One HF `process` round over P sorted candidates.

            vals (B, P) DESC-sorted accumulated logprobs; toks/parents
            (B, P); cand_out (B, P, max_new) candidate histories with
            this step's token written at position t. Returns running
            (sum_lp, tok, parent, out) and the merged finished store.
            """
            P = vals.shape[1]
            hits = (toks == eot) | (t + 1 >= cap_eff)  # (B, P)
            hits_f = hits.astype(jnp.float32)

            # running beams: best K candidates that did NOT finish
            run_vals = vals + hits_f * GATE
            new_lp, rsel = jax.lax.top_k(run_vals, K)
            take = lambda a: jnp.take_along_axis(a, rsel, axis=1)
            new_tok = take(toks)
            new_parent = take(parents)
            new_out = jnp.take_along_axis(cand_out, rsel[..., None], axis=1)

            # finished candidates: hits within the global top-K, gated
            # off once the batch's early-stop heuristic is satisfied
            # (HF _update_finished_beams)
            topmask = (jnp.arange(P) < K)[None, :]
            f = vals / _norm_len(t + 1)
            f = f + (~(hits & topmask)).astype(jnp.float32) * GATE
            f = f + (~unsat).astype(jnp.float32)[:, None] * GATE
            m_scores = jnp.concatenate([fin[1], f], axis=1)  # (B, K+P)
            m_out = jnp.concatenate([fin[0], cand_out], axis=1)
            m_len = jnp.concatenate(
                [fin[2], jnp.broadcast_to((t + 1)[None, None], (B, P))],
                axis=1,
            )
            m_fin = jnp.concatenate([fin[3], hits & topmask], axis=1)
            fin_scores, msel = jax.lax.top_k(m_scores, K)
            mtake = lambda a: jnp.take_along_axis(a, msel, axis=1)
            new_fin = (
                jnp.take_along_axis(m_out, msel[..., None], axis=1),
                fin_scores,
                mtake(m_len),
                mtake(m_fin),
            )

            # early-stop heuristic (HF early_stopping=False): stop a
            # batch when every slot is a real hypothesis and the best
            # running beam can no longer beat the worst of them
            best_possible = new_lp[:, :1] / _norm_len(t + 1)  # (B, 1)
            worst = jnp.where(
                new_fin[3],
                jnp.min(fin_scores, axis=1, keepdims=True),
                GATE,
            )  # (B, K)
            new_unsat = unsat & jnp.any(best_possible > worst, axis=-1)
            return new_lp, new_tok, new_parent, new_out, new_fin, new_unsat

        # ---- init: candidates from the prefill distribution (a single
        # pseudo-beam, like HF's [0, -1e9, ...] score init) ---- #
        vals0, tok0 = jax.lax.top_k(first_lp, KC)  # (B, KC) sorted
        cand_out0 = jnp.full((B, KC, max_new_tokens), eot, jnp.int32)
        cand_out0 = cand_out0.at[:, :, 0].set(tok0)
        unsat_init = jnp.ones((B,), bool)
        sum0, run_tok0, _, out0, fin1, unsat0 = _select(
            vals0,
            tok0.astype(jnp.int32),
            jnp.zeros((B, KC), jnp.int32),
            cand_out0,
            jnp.int32(0),
            fin0,
            unsat_init,
        )
        state = _BeamState(
            t=jnp.int32(1),
            tokens=run_tok0,
            sum_lp=sum0,
            out=out0,
            cache=cache_bk,
            anc=anc0,
            prev_ts=(run_tok0 >= TIMESTAMP_BASE),
            # single trailing timestamp == closed pair (see _GreedyState
            # init): the initial timestamp opens a segment for text
            prevprev_ts=jnp.ones((B, K), bool),
            max_ts=jnp.maximum(run_tok0, TIMESTAMP_BASE),
            fin_out=fin1[0],
            fin_scores=fin1[1],
            fin_len=fin1[2],
            fin_mask=fin1[3],
            unsat=unsat0,
        )

        def cond(s: _BeamState):
            return (s.t < cap_eff) & jnp.any(s.unsat)

        def body(s: _BeamState) -> _BeamState:
            cand_val, cand_tok, lse, cache, anc = run_step(
                s.tokens, s.cache, s.anc, s.prev_ts, s.prevprev_ts, s.max_ts
            )
            cand_lp = (cand_val - lse).reshape(B, K, KC)
            total = s.sum_lp[..., None] + cand_lp  # (B, K, KC)
            vals, idx = jax.lax.top_k(total.reshape(B, K * KC), POOL)
            parent = idx // KC
            tok = jnp.take_along_axis(
                cand_tok.reshape(B, K * KC).astype(jnp.int32), idx, axis=1
            )
            cand_out = jnp.take_along_axis(
                s.out, parent[..., None], axis=1
            )  # (B, POOL, max_new)
            cand_out = jax.lax.dynamic_update_index_in_dim(
                cand_out, tok, s.t, axis=2
            )
            fin = (s.fin_out, s.fin_scores, s.fin_len, s.fin_mask)
            new_lp, new_tok, new_parent, new_out, new_fin, new_unsat = (
                _select(vals, tok, parent, cand_out, s.t, fin, s.unsat)
            )

            cache, anc = reparent(cache, anc, new_parent)
            gather = lambda a: jnp.take_along_axis(a, new_parent, axis=1)
            tok_is_ts = new_tok >= TIMESTAMP_BASE
            return _BeamState(
                t=s.t + 1,
                tokens=new_tok,
                sum_lp=new_lp,
                out=new_out,
                cache=cache,
                anc=anc,
                prev_ts=tok_is_ts,
                prevprev_ts=gather(s.prev_ts),
                max_ts=jnp.where(
                    tok_is_ts,
                    jnp.maximum(gather(s.max_ts), new_tok),
                    gather(s.max_ts),
                ),
                fin_out=new_fin[0],
                fin_scores=new_fin[1],
                fin_len=new_fin[2],
                fin_mask=new_fin[3],
                unsat=new_unsat,
            )

        s = jax.lax.while_loop(cond, body, state)
        # the store is top_k-sorted best-first; argmax kept for the
        # interface contract
        best = jnp.argmax(s.fin_scores, axis=1).astype(jnp.int32)
        return GenerateResult(
            tokens=s.fin_out, lengths=s.fin_len, scores=s.fin_scores,
            best=best,
        )

    if fused:

        @partial(jax.jit, donate_argnums=())
        def generate(params, packed, xa_kv, prompt, token_cap):
            return _generate(params, packed, xa_kv, prompt, token_cap)

    else:

        @partial(jax.jit, donate_argnums=())
        def generate(params, xa_kv, prompt, token_cap):
            return _generate(params, None, xa_kv, prompt, token_cap)

    return generate


def build_generate(
    cfg: WhisperConfig,
    *,
    beam_size: int,
    batch: int,
    max_new_tokens: int,
    prompt_len: int,
    suppress_tokens: Tuple[int, ...],
    begin_suppress_tokens: Tuple[int, ...],
    length_penalty: float = 1.0,
    with_timestamps: bool = False,
    ancestry: bool = True,
    fused: bool = False,
    xa_int8: bool = False,
    renorm_suppressed: bool = True,
    eot_id: Optional[int] = None,
    max_initial_ts_index: Optional[int] = 50,
):
    """End-to-end (params, mel, prompt, token_cap) → GenerateResult,
    composing build_encode + build_generate_xa (two device dispatches;
    xa_kv never leaves the device). With fused=True the signature gains
    a leading `packed` argument after params (see build_generate_xa)."""
    encode_fn = build_encode(cfg)
    gen_fn = build_generate_xa(
        cfg,
        beam_size=beam_size,
        batch=batch,
        max_new_tokens=max_new_tokens,
        prompt_len=prompt_len,
        suppress_tokens=suppress_tokens,
        begin_suppress_tokens=begin_suppress_tokens,
        length_penalty=length_penalty,
        with_timestamps=with_timestamps,
        ancestry=ancestry,
        fused=fused,
        xa_int8=xa_int8,
        renorm_suppressed=renorm_suppressed,
        eot_id=eot_id,
        max_initial_ts_index=max_initial_ts_index,
    )

    if fused:

        def generate(params, packed, mel, prompt, token_cap):
            return gen_fn(params, packed, encode_fn(params, mel), prompt, token_cap)

    else:

        def generate(params, mel, prompt, token_cap):
            return gen_fn(params, encode_fn(params, mel), prompt, token_cap)

    return generate


def trim_tokens(tokens: np.ndarray, length: int) -> np.ndarray:
    """Host-side: cut a beam's token row at its emitted length, dropping
    the trailing EOT if present."""
    row = np.asarray(tokens[:length])
    if length > 0 and row[-1] == EOT:
        row = row[:-1]
    return row
