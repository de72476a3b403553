"""KV-cached beam-search / greedy decoding under jit.

Replaces CTranslate2's C++ beam-search decoder (reference main.py:687-693:
`whisper_model.generate(features, prompts, beam_size, ...)`) with a single
compiled XLA program per (model, beam, batch-bucket): encoder → cross-KV
precompute → prompt prefill → `lax.while_loop` of single-token steps with
early exit once every beam has emitted EOT.

TPU-first choices (SURVEY.md §7 "hard parts"):
- **Static shapes everywhere**: batch is padded to a bucket, the token
  budget is a static bound; the *runtime* token cap is a traced scalar in
  the loop condition so short utterances exit early without recompiling.
- **One dispatch per request**: the entire pipeline is one jit program —
  no per-token Python, no host↔device ping-pong (the reference pays a
  Python→C++ boundary per batch, main.py:676-693).
- **Beam state is data, not control flow**: finished beams are masked to
  propagate EOT with zero score delta; the cache is reordered with a
  batched gather.
- Greedy is the K=1 special case of the same program.

Length normalization follows CTranslate2's default (`length_penalty=1`):
final beam ranking divides summed logprobs by emitted length.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

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


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # (B, K, max_new) int32, EOT-padded
    lengths: jnp.ndarray  # (B, K) int32 — emitted tokens incl. EOT
    scores: jnp.ndarray  # (B, K) f32 — length-normalized logprob
    best: jnp.ndarray  # (B,) int32 — argmax beam per sequence


class _State(NamedTuple):
    t: jnp.ndarray  # () int32 — tokens emitted so far
    tokens: jnp.ndarray  # (B, K) int32 — last token per beam
    sum_lp: jnp.ndarray  # (B, K) f32
    finished: jnp.ndarray  # (B, K) bool
    out: jnp.ndarray  # (B, K, max_new) int32
    out_len: jnp.ndarray  # (B, K) int32
    cache: DecoderCache
    anc: jnp.ndarray  # (B, K, cache_len) int32 ancestry map (-1 unwritten)
    # timestamp-rule carry (unused zeros when with_timestamps=False)
    prev_ts: jnp.ndarray  # (B, K) bool — last emitted token is a timestamp
    prevprev_ts: jnp.ndarray  # (B, K) bool
    max_ts: jnp.ndarray  # (B, K) int32 — highest timestamp token emitted


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
    wbits: int = 8,
):
    """Return a jitted generate(params, xa_kv, prompt, token_cap) program.

    wbits=4 (fused only): the decode kernel streams nibble-packed int4
    weights (PackedDecoder4 from ops.fused_decode.pack_decoder4) —
    halves the per-token weight DMA at a small weight-quantization cost.

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
    """
    from wis_tpu.models.whisper.tokenizer import layout_for_vocab

    # layout-dependent special ids (the v3 vocabulary shifts the
    # task/timestamp block up by one; EOT is layout-invariant)
    _lay = layout_for_vocab(cfg.n_vocab)
    NO_TIMESTAMPS = _lay.no_timestamps
    TIMESTAMP_BASE = _lay.timestamp_base

    K, B = beam_size, batch
    BK = B * K
    cache_len = prompt_len + max_new_tokens
    if fused:
        from wis_tpu.ops.fused_decode import build_fused_decode_step
        from wis_tpu.ops.fused_logits import build_fused_logits_topk

        # kernel DMA slices want a lane-aligned flat (beam, time) axis
        cache_len = ((cache_len + 127) // 128) * 128
        step_fn = build_fused_decode_step(
            cfg, bk=BK, t_cache=cache_len, s_audio=cfg.n_audio_ctx,
            n_seq=B, wbits=wbits,
        )
        # the decode tail (LN + logits + top-k + lse) fuses too; the
        # timestamp grammar folds in as per-beam int32 scalars compared
        # against the kernel's global column ids
        head_fn = build_fused_logits_topk(
            cfg, bk=BK, k=K, grammar=with_timestamps,
            ts_base=TIMESTAMP_BASE, eot=EOT,
        )
        H = cfg.n_text_head
        Dh = cfg.n_text_state // H
        L = cfg.n_text_layer
    base_suppress = tuple(suppress_tokens)
    if with_timestamps:
        base_suppress = base_suppress + (NO_TIMESTAMPS,)
    sup = jnp.asarray(_suppress_mask(cfg.n_vocab, base_suppress))
    begin_extra = tuple(begin_suppress_tokens) + base_suppress
    if with_timestamps:
        # first generated token must be a timestamp
        begin_extra = begin_extra + tuple(range(0, TIMESTAMP_BASE))
    begin_sup = jnp.asarray(_suppress_mask(cfg.n_vocab, begin_extra))
    is_ts_vec = jnp.arange(cfg.n_vocab) >= TIMESTAMP_BASE  # (V,)

    def _generate(params, packed, xa_kv, prompt, token_cap):
        dtype = params["decoder"]["tok_emb"].dtype

        # ---- prefill on batch B ---- #
        cache0 = DecoderCache.zeros(cfg, B, cache_len, dtype)
        if prompt.ndim == 1:
            prompt_b = jnp.broadcast_to(prompt[None, :], (B, prompt_len))
        else:
            prompt_b = prompt
        logits, cache0 = prefill(params, prompt_b, cache0, xa_kv, cfg)
        first_lp = jax.nn.log_softmax(logits[:, -1] + begin_sup, axis=-1)  # (B, V)

        # ---- initial beams: top-K distinct first tokens ---- #
        top_lp, top_tok = jax.lax.top_k(first_lp, K)  # (B, K)
        out = jnp.full((B, K, max_new_tokens), EOT, jnp.int32)
        out = out.at[:, :, 0].set(top_tok)
        finished0 = top_tok == EOT
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
        state = _State(
            t=jnp.int32(1),
            tokens=top_tok,
            sum_lp=top_lp,
            finished=finished0,
            out=out,
            out_len=jnp.ones((B, K), jnp.int32),
            cache=cache_bk,
            anc=anc0,
            prev_ts=(top_tok >= TIMESTAMP_BASE),
            prevprev_ts=jnp.zeros((B, K), bool),
            max_ts=jnp.maximum(top_tok, TIMESTAMP_BASE),
        )

        def cond(s: _State):
            return (s.t < jnp.minimum(max_new_tokens, token_cap)) & ~jnp.all(
                s.finished
            )

        def body(s: _State) -> _State:
            if fused:
                # sel from the PRE-update ancestry: the current position
                # is still -1 (excluded, one_hot of a negative is zero)
                # — the step's own K/V join the softmax through the
                # kernel's explicit self column. (BK, T, BK) reshapes
                # straight to the kernel's time-major flat columns
                # (t*BK + row); ancestry is per-sequence, so offsetting
                # by b*K keeps beams inside their own sequence's rows.
                boff = (jnp.arange(B, dtype=jnp.int32) * K)[:, None, None]
                ganc = jnp.where(s.anc >= 0, s.anc + boff, -1)
                sel = jax.nn.one_hot(
                    ganc.reshape(BK, cache_len), BK, dtype=jnp.float32
                ).reshape(BK, BK * cache_len)
                dec = params["decoder"]
                x_emb = (
                    jnp.take(dec["tok_emb"], s.tokens.reshape(BK), axis=0)
                    .astype(jnp.float32)
                    + jnp.take(dec["pos"], s.cache.pos, axis=0)
                    .astype(jnp.float32)[None]
                )
                # the kernel injects this step's K/V columns into the
                # aliased cache buffers itself — zero XLA-side cache ops
                x_out, kc, vc = step_fn(
                    packed, x_emb, s.cache.k, s.cache.v,
                    xa_k_f, xa_v_f, sel, s.cache.pos,
                )
                cache = DecoderCache(kc, vc, s.cache.pos + 1)
                anc = jax.lax.dynamic_update_index_in_dim(
                    s.anc,
                    jnp.broadcast_to(
                        jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
                    ),
                    s.cache.pos,
                    axis=2,
                )
            elif ancestry:
                # this step writes position cache.pos in each beam's own
                # physical row — record it before attention reads it
                anc = jax.lax.dynamic_update_index_in_dim(
                    s.anc,
                    jnp.broadcast_to(
                        jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
                    ),
                    s.cache.pos,
                    axis=2,
                )
                logits, cache = decode_step(
                    params, s.tokens.reshape(BK), s.cache, xa_kv, cfg, anc=anc
                )  # (BK, V) f32
            else:
                anc = s.anc
                logits, cache = decode_step(
                    params, s.tokens.reshape(BK), s.cache, xa_kv, cfg
                )  # (BK, V) f32
            if fused:
                # LN + logits + per-beam top-K + logsumexp in one Pallas
                # pass over the embedding (ops/fused_logits); the static
                # suppress mask — and the timestamp grammar's per-beam
                # scalars when with_timestamps — fold into the kernel
                dec = params["decoder"]
                ts_state = None
                if with_timestamps:
                    ts_state = jnp.stack(
                        [
                            (s.prev_ts & ~s.prevprev_ts)
                            .reshape(BK).astype(jnp.int32),
                            (s.prev_ts & s.prevprev_ts)
                            .reshape(BK).astype(jnp.int32),
                            s.max_ts.reshape(BK),
                            jnp.zeros((BK,), jnp.int32),
                        ],
                        axis=1,
                    )
                cand_val, cand_tok, lse = head_fn(
                    x_out, dec["ln"]["g"], dec["ln"]["b"],
                    dec["tok_emb"], sup, ts_state,
                )
            else:
                masked = logits + sup

                if with_timestamps:
                    vocab_ids = jnp.arange(cfg.n_vocab)
                    is_eot = vocab_ids == EOT
                    # unpaired timestamp → next must be a timestamp (EOT ok)
                    need_ts = (s.prev_ts & ~s.prevprev_ts).reshape(BK)[:, None]
                    masked = jnp.where(
                        need_ts & ~(is_ts_vec | is_eot)[None, :], NEG_INF, masked
                    )
                    # closed pair → next must be text (or EOT)
                    need_text = (s.prev_ts & s.prevprev_ts).reshape(BK)[:, None]
                    masked = jnp.where(
                        need_text & is_ts_vec[None, :], NEG_INF, masked
                    )
                    # monotonic timestamps
                    below_max = vocab_ids[None, :] < s.max_ts.reshape(BK)[:, None]
                    masked = jnp.where(
                        is_ts_vec[None, :] & below_max, NEG_INF, masked
                    )

                # Two-stage candidate selection: the global top-K of
                # sum_lp[k] + lp[k, v] is always contained in the per-beam
                # top-K, so select K candidates per beam first (one narrow
                # top_k + one logsumexp over the vocab — no normalized
                # (B, K·V) tensor is ever materialized or reshaped).
                cand_val, cand_tok = jax.lax.top_k(masked, K)  # (BK, K)
                lse = jax.scipy.special.logsumexp(
                    masked, axis=-1, keepdims=True
                )
            cand_lp = (cand_val - lse).reshape(B, K, K)
            cand_tok = cand_tok.reshape(B, K, K).astype(jnp.int32)

            # finished beams: a single zero-cost EOT continuation
            fin = s.finished[..., None]  # (B, K, 1)
            first_slot = (jnp.arange(K) == 0)[None, None, :]
            cand_lp = jnp.where(
                fin, jnp.where(first_slot, 0.0, NEG_INF), cand_lp
            )
            cand_tok = jnp.where(fin, EOT, cand_tok)

            total = s.sum_lp[..., None] + cand_lp  # (B, K, K)
            new_lp, idx = jax.lax.top_k(total.reshape(B, K * K), K)
            parent = idx // K
            tok = jnp.take_along_axis(cand_tok.reshape(B, K * K), idx, axis=1)

            gather = lambda a: jnp.take_along_axis(a, parent, axis=1)
            par_finished = gather(s.finished)
            par_len = gather(s.out_len)
            out = jnp.take_along_axis(
                s.out, parent[..., None], axis=1
            )
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(par_finished, EOT, tok), s.t, axis=2
            )
            if ancestry or fused:
                # logical beams re-parent; physical rows never move —
                # the ancestry map absorbs the permutation instead of
                # two full-cache copies
                anc = jnp.take_along_axis(anc, parent[..., None], axis=1)
            else:
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
            tok_is_ts = tok >= TIMESTAMP_BASE
            return _State(
                t=s.t + 1,
                tokens=tok,
                sum_lp=new_lp,
                finished=par_finished | (tok == EOT),
                out=out,
                out_len=jnp.where(par_finished, par_len, par_len + 1),
                cache=cache,
                anc=anc,
                prev_ts=jnp.where(par_finished, gather(s.prev_ts), tok_is_ts),
                prevprev_ts=jnp.where(
                    par_finished, gather(s.prevprev_ts), gather(s.prev_ts)
                ),
                max_ts=jnp.where(
                    tok_is_ts & ~par_finished,
                    jnp.maximum(gather(s.max_ts), tok),
                    gather(s.max_ts),
                ),
            )

        s = jax.lax.while_loop(cond, body, state)

        # CT2-style length normalization: sum_lp / len^penalty
        norm = jnp.maximum(s.out_len.astype(jnp.float32), 1.0) ** length_penalty
        scores = s.sum_lp / norm
        best = jnp.argmax(scores, axis=1).astype(jnp.int32)
        return GenerateResult(tokens=s.out, lengths=s.out_len, scores=scores, best=best)

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
