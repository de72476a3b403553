"""XTTS GPT — conditioned audio-token decoder in JAX.

The reference's TTS is Coqui XTTS v2 reached through torch/DeepSpeed in a
sidecar container (reference xtts/main.py:25-49, 149-156:
`model.inference_stream`). Its core is a GPT-2-style decoder that emits
discrete audio codes conditioned on a speaker prefix + text tokens:

    [gpt_cond_latent (N_cond, D)] [text tokens] [START_AUDIO] → audio codes

TPU-native design mirrors the Whisper decoder machinery: stacked layers
under `lax.scan`, preallocated KV cache, and a **chunked decode program**
— one compiled program emits `chunk` tokens per dispatch (the streaming
granularity, default 20 as in the reference's stream_chunk_size,
xtts/main.py:243), with temperature / top-k / top-p / repetition-penalty
sampling executed on-device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.ops.quant import qmatmul


@dataclass(frozen=True)
class GPTConfig:
    n_layer: int = 30
    n_head: int = 16
    d_model: int = 1024
    n_text_vocab: int = 6681
    n_audio_vocab: int = 1026  # 1024 codes + start + stop
    max_text_tokens: int = 402
    max_audio_tokens: int = 605
    max_cond_len: int = 32  # gpt_cond_latent rows
    start_audio_token: int = 1024
    stop_audio_token: int = 1025


def _ln(x, g, b):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + 1e-5)) * g + b).astype(x.dtype)


class GPTCache(NamedTuple):
    k: jnp.ndarray  # (L, B, H, T_max, Dh)
    v: jnp.ndarray
    pos: jnp.ndarray  # () int32

    @classmethod
    def zeros(cls, cfg: GPTConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.n_layer, batch, cfg.n_head, max_len, cfg.d_model // cfg.n_head)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))


def gpt_pass(
    params: Dict,
    x: jnp.ndarray,  # (B, T, D) input embeddings
    pos_offset: jnp.ndarray,
    cache: GPTCache,
    cfg: GPTConfig,
) -> Tuple[jnp.ndarray, GPTCache]:
    """Run T embedded positions through the decoder, updating the cache.
    Returns final hidden states (B, T, D) (pre-head) and the new cache."""
    b, t, d = x.shape
    h = cfg.n_head
    dh = d // h
    max_len = cache.k.shape[3]
    dtype = cache.k.dtype

    key_pos = jnp.arange(max_len)[None, :]
    query_pos = (pos_offset + jnp.arange(t))[:, None]
    mask = (key_pos <= query_pos)[None, None]

    def block(x, scanned):
        blk, ck, cv = scanned
        hdn = _ln(x, blk["ln1_g"], blk["ln1_b"])
        # q/k/v are separate leaves (split from GPT2's packed c_attn at
        # conversion) so Megatron column-sharding slices whole heads —
        # a contiguous slice of the packed (D, 3D) matrix would mix the
        # three projections (parallel/mesh.py xtts_gpt_param_specs).
        # qmatmul transparently takes bf16 or int8 {"q","s"} leaves
        # (quant.quantize_gpt_params): the chunked decode is weight-
        # stream-bound, so int8 halves its HBM traffic.
        q = qmatmul(hdn, blk["q_w"]) + blk["q_b"]
        k_new = qmatmul(hdn, blk["k_w"]) + blk["k_b"]
        v_new = qmatmul(hdn, blk["v_w"]) + blk["v_b"]
        reshape = lambda a: a.reshape(b, t, h, dh).transpose(0, 2, 1, 3)  # noqa: E731
        q, k_new, v_new = reshape(q), reshape(k_new), reshape(v_new)
        ck = jax.lax.dynamic_update_slice(ck, k_new.astype(dtype), (0, 0, pos_offset, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_new.astype(dtype), (0, 0, pos_offset, 0))
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, ck, preferred_element_type=jnp.float32
        ) * (dh ** -0.5)
        scores = jnp.where(mask, scores, -1e30)
        w = jax.nn.softmax(scores, axis=-1).astype(cv.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w, cv)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + (qmatmul(ctx, blk["proj_w"]) + blk["proj_b"]).astype(x.dtype)
        hdn = _ln(x, blk["ln2_g"], blk["ln2_b"])
        ff = jax.nn.gelu(
            qmatmul(hdn, blk["mlp_w1"]) + blk["mlp_b1"], approximate=True
        )
        x = x + (qmatmul(ff, blk["mlp_w2"]) + blk["mlp_b2"]).astype(x.dtype)
        return x, (ck, cv)

    x, (nk, nv) = jax.lax.scan(block, x, (params["blocks"], cache.k, cache.v))
    # Coqui XTTS applies TWO final LayerNorms: GPT2Model's internal ln_f
    # (gpt.gpt.ln_f — part of last_hidden_state) and then the model's own
    # final_norm (coqui TTS xtts/gpt.py `self.final_norm(enc)`)
    x = _ln(x, params["gpt_lnf_g"], params["gpt_lnf_b"])
    x = _ln(x, params["lnf_g"], params["lnf_b"])
    return x, GPTCache(nk, nv, cache.pos)


def embed_prompt(
    params: Dict,
    cond_latent: jnp.ndarray,  # (B, N_cond, D)
    text_tokens: jnp.ndarray,  # (B, T_text) int32
    cfg: GPTConfig,
) -> jnp.ndarray:
    """Build the GPT input prefix: conditioning latents ++ embedded text
    ++ START_AUDIO embedding. Text/audio have separate positional tables
    (XTTS layout)."""
    dtype = params["text_emb"].dtype
    t_text = text_tokens.shape[1]
    text = jnp.take(params["text_emb"], text_tokens, axis=0)
    text = text + params["text_pos"][:t_text][None].astype(dtype)
    start = jnp.take(
        params["audio_emb"],
        jnp.full((text_tokens.shape[0], 1), cfg.start_audio_token, jnp.int32),
        axis=0,
    )
    start = start + params["audio_pos"][0][None, None].astype(dtype)
    return jnp.concatenate([cond_latent.astype(dtype), text, start], axis=1)


def _mask_logits(
    logits: jnp.ndarray,  # (B, V) f32
    prev_tokens: jnp.ndarray,  # (B, T_hist) int32 — for repetition penalty
    temperature: jnp.ndarray,
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
) -> jnp.ndarray:
    """Apply the HF logits-processor stack Coqui's generate uses —
    RepetitionPenalty → Temperature → TopK → TopP, same staging order —
    returning logits with masked entries at -1e30 (oracle-tested against
    transformers' processors in test_xtts_gpt_oracle.py)."""
    v = logits.shape[-1]
    # repetition penalty (CTRL-style): divide positive logits / multiply
    # negative by the penalty for every previously-emitted token
    hist = jax.nn.one_hot(prev_tokens, v, dtype=jnp.float32).sum(axis=1) > 0
    penalized = jnp.where(
        logits > 0, logits / repetition_penalty, logits * repetition_penalty
    )
    logits = jnp.where(hist, penalized, logits)
    logits = logits / jnp.maximum(temperature, 1e-5)

    # top-k: mask everything below the k-th logit (k traced via threshold)
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    k_idx = jnp.clip(top_k - 1, 0, v - 1)
    kth = jnp.take_along_axis(
        sorted_desc, jnp.full((logits.shape[0], 1), k_idx), axis=-1
    )
    logits = jnp.where(logits < kth, -1e30, logits)

    # top-p (nucleus): mask tokens beyond cumulative prob p
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    cutoff_count = jnp.sum(cum - probs_sorted < top_p, axis=-1, keepdims=True)
    pth = jnp.take_along_axis(
        sorted_desc, jnp.clip(cutoff_count - 1, 0, v - 1), axis=-1
    )
    return jnp.where(logits < pth, -1e30, logits)


def _sample_token(
    logits: jnp.ndarray,  # (B, V) f32
    prev_tokens: jnp.ndarray,  # (B, T_hist) int32 — for repetition penalty
    key: jnp.ndarray,
    temperature: jnp.ndarray,
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    repetition_penalty: jnp.ndarray,
    do_sample: jnp.ndarray,
    cfg: GPTConfig,
) -> jnp.ndarray:
    """On-device sampling with the reference's parameter surface
    (xtts/main.py:243-325: temperature, top_k, top_p, repetition_penalty,
    do_sample). All params are traced scalars — no recompiles per knob."""
    logits = _mask_logits(
        logits, prev_tokens, temperature, top_k, top_p, repetition_penalty
    )
    sampled = jax.random.categorical(key, logits, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(do_sample, sampled, greedy).astype(jnp.int32)


def build_prefill(cfg: GPTConfig, batch: int, cond_len: int, text_len: int, max_len: int):
    """Jitted prefix pass: embeds conditioning + text, fills the cache,
    returns (cache, last hidden state)."""

    @jax.jit
    def prefill(params, cond_latent, text_tokens):
        dtype = params["text_emb"].dtype
        cache = GPTCache.zeros(cfg, batch, max_len, dtype)
        x = embed_prompt(params, cond_latent, text_tokens, cfg)
        hidden, cache = gpt_pass(params, x, jnp.int32(0), cache, cfg)
        cache = cache._replace(pos=jnp.int32(cond_len + text_len + 1))
        return hidden[:, -1], cache

    return prefill


def run_decode_chunk(
    params,
    last_token,  # (B,) int32; start_audio_token for the first chunk
    cache: GPTCache,
    history,  # (B, max_audio) int32 token history (for rep. penalty)
    hist_len,  # () int32
    key,
    temperature,
    top_k,
    top_p,
    repetition_penalty,
    do_sample,
    min_tokens=0,
    *,
    cfg: GPTConfig,
    chunk: int,
    batch: int,
):
    """Traceable chunked decode body: emit `chunk` audio tokens.

    Returns (tokens (B, chunk), latents (B, chunk, D), cache, history,
    hist_len, done). Latents are the final hidden states for the emitted
    positions — the HiFi-GAN vocoder input (XTTS decodes from GPT
    latents, not codes). Shared by `build_decode_chunk` (standalone
    program) and the model's fused decode+vocode streaming program."""
    dtype = params["text_emb"].dtype

    def audio_embed(tok, pos):
        e = jnp.take(params["audio_emb"], tok, axis=0)
        # mode="clip": when generation runs to the max_audio_tokens cap,
        # the final token's position (hist_len+1) can reach the table
        # edge; jnp.take's default under jit is fill-with-NaN, which
        # poisoned the last chunk (Coqui sizes the real table with +2
        # headroom rows, mirrored in random_gpt)
        pos_emb = jnp.take(params["audio_pos"], pos, axis=0, mode="clip")
        return (e + pos_emb).astype(dtype)

    def step(carry, i):
        tok, cache, history, hist_len, key, done = carry
        audio_pos = hist_len + 1  # +1: start token occupies audio pos 0
        x = audio_embed(tok, audio_pos)[:, None, :]
        hidden, cache = gpt_pass(params, x, cache.pos, cache, cfg)
        cache = cache._replace(pos=cache.pos + 1)
        logits = (
            hidden[:, 0] @ params["head_w"] + params["head_b"]
        ).astype(jnp.float32)
        # minimum-length floor: the stop token is masked while fewer than
        # min_tokens audio tokens have been emitted (0 = inert). The
        # benchmark uses this the way the ASR rows use token budgets —
        # random weights stop immediately; real weights speak the text.
        v = logits.shape[-1]
        stop_blocked = hist_len < min_tokens
        logits = jnp.where(
            (jnp.arange(v) == cfg.stop_audio_token)[None] & stop_blocked,
            -1e30,
            logits,
        )
        key, sub = jax.random.split(key)
        nxt = _sample_token(
            logits, history, sub, temperature, top_k, top_p,
            repetition_penalty, do_sample, cfg,
        )
        nxt = jnp.where(done, cfg.stop_audio_token, nxt)
        done = done | (nxt == cfg.stop_audio_token)
        history = jax.lax.dynamic_update_index_in_dim(
            history, nxt, hist_len, axis=1
        )
        return (nxt, cache, history, hist_len + 1, key, done), (nxt, hidden[:, 0])

    done0 = jnp.zeros((batch,), bool)
    (tok, cache, history, hist_len, key, done), (tokens, latents) = jax.lax.scan(
        step,
        (last_token, cache, history, hist_len, key, done0),
        jnp.arange(chunk),
    )
    return (
        tokens.transpose(1, 0),  # (B, chunk)
        latents.transpose(1, 0, 2),  # (B, chunk, D)
        cache,
        history,
        hist_len,
        done,
    )


def build_decode_chunk(cfg: GPTConfig, batch: int, chunk: int, max_len: int):
    """Jitted chunked decode: emit `chunk` audio tokens in one dispatch.
    (The streaming path uses the model's fused decode+vocode program
    instead — one dispatch per chunk including the vocoder.)"""
    del max_len  # cache shapes come from the cache argument itself
    return jax.jit(
        partial(run_decode_chunk, cfg=cfg, chunk=chunk, batch=batch),
        donate_argnums=(2,),
    )


# --------------------------------------------------------------------------- #
# Fused-kernel chunk decode (ops/fused_gpt.py): the same chunk program
# with the per-token layer scan replaced by ONE Pallas launch per token
# --------------------------------------------------------------------------- #
def flatten_gpt_cache(cache: GPTCache, t_pad: int):
    """GPTCache (L, B, H, T, Dh) → the fused kernel's flat TIME-MAJOR
    (L, D, t_pad*B) bf16 layout (flat column = t*B + row, heads merged
    into D), zero-padded — or truncated, when a cache-length bucket
    smaller than the prefill cache's T is selected; only the prefix
    (≤ t_pad by bucket construction) holds data — to the lane-aligned
    t_pad."""
    L, B, H, T, Dh = cache.k.shape
    keep = min(T, t_pad)

    def fl(c):
        flat = c.transpose(0, 2, 4, 3, 1).reshape(L, H * Dh, T * B)
        return jnp.pad(
            flat[:, :, : keep * B], ((0, 0), (0, 0), (0, (t_pad - keep) * B))
        ).astype(jnp.bfloat16)

    return fl(cache.k), fl(cache.v)


def run_decode_chunk_fused(
    params,
    packed,  # ops.fused_gpt.PackedGPT
    step_fn,  # ops.fused_gpt.build_fused_gpt_step(...) closure
    last_token,  # (B,) int32
    kc,  # (L, D, B*t_pad) bf16 flat time-major cache (kernel layout)
    vc,
    pos,  # () int32 — next cache column to write (prefix len + emitted)
    history,  # (B, max_audio) int32
    hist_len,  # () int32
    key,
    temperature,
    top_k,
    top_p,
    repetition_penalty,
    do_sample,
    min_tokens=0,
    head_packed=None,  # (ln4, head_w, head_b) from fused_gpt_head.pack_head
    *,
    cfg: GPTConfig,
    chunk: int,
    batch: int,
    head_fn=None,  # ops.fused_gpt_head.build_fused_gpt_head(...) closure
):
    """run_decode_chunk with the 30-layer scan replaced by the fused
    Pallas step (all layers, one launch, in-place aliased cache). Same
    sampling staging and PRNG order, so given equal logits the emitted
    tokens match the XLA path (equality-tested in test_fused_gpt.py).

    With `head_fn`/`head_packed` (batch 1 only), the whole per-token
    epilogue — double LN, audio head, stop floor, repetition penalty,
    temperature, top-k/top-p, categorical draw — runs in a second Pallas
    launch (ops/fused_gpt_head.py). The repetition penalty then reads a
    carried (1, V_pad) hit-mask initialized from `history` at chunk
    entry and updated incrementally — identical masking to
    _mask_logits' per-step one-hot, ~620k fewer one-hot elements per
    token (kernel-vs-epilogue equality in test_fused_gpt_head.py)."""
    dtype = params["text_emb"].dtype
    BKT = kc.shape[-1]
    if head_fn is not None:
        assert batch == 1, "fused sampling head is single-stream (bk=1)"
        from wis_tpu.ops.fused_gpt_head import v_padded

        v = cfg.n_audio_vocab
        vp = v_padded(v)
        ln4, head_w, head_b = head_packed
        hist_mask0 = (
            jax.nn.one_hot(history, vp, dtype=jnp.float32).sum(axis=1) > 0
        ).astype(jnp.float32)
    else:
        hist_mask0 = jnp.zeros((batch, 1), jnp.float32)  # inert carry

    def audio_embed(tok, pos_a):
        e = jnp.take(params["audio_emb"], tok, axis=0)
        pos_emb = jnp.take(params["audio_pos"], pos_a, axis=0, mode="clip")
        return e + pos_emb

    def step(carry, i):
        tok, kc, vc, pos, history, hist_mask, hist_len, key, done = carry
        audio_pos = hist_len + 1  # +1: start token occupies audio pos 0
        x = audio_embed(tok, audio_pos).astype(jnp.float32)  # (B, D)
        col = jax.lax.broadcasted_iota(jnp.int32, (batch, BKT), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (batch, BKT), 0)
        sel = ((col // batch < pos) & (col % batch == row)).astype(
            jnp.float32
        )
        xh, kc, vc = step_fn(packed, x, kc, vc, sel, pos)
        key, sub = jax.random.split(key)
        stop_blocked = hist_len < min_tokens
        if head_fn is not None:
            gum = jnp.pad(
                jax.random.gumbel(sub, (1, v), jnp.float32),
                ((0, 0), (0, vp - v)),
            )
            knobs = jnp.stack(
                [
                    jnp.float32(temperature),
                    top_k.astype(jnp.float32),
                    jnp.float32(top_p),
                    jnp.float32(repetition_penalty),
                    stop_blocked.astype(jnp.float32),
                    do_sample.astype(jnp.float32),
                    jnp.float32(0.0),
                    jnp.float32(0.0),
                ]
            ).reshape(1, 8)
            tok_out, hidden32, _ = head_fn(
                xh, ln4, head_w, head_b, hist_mask, gum, knobs
            )
            hidden = hidden32.astype(dtype)
            nxt = tok_out[:, 0]
        else:
            # GPT2 ln_f + XTTS final_norm in XLA (one-row epilogue), with
            # the XLA path's exact dtype staging (bf16 between the LNs)
            h1 = _ln(xh.astype(dtype), params["gpt_lnf_g"], params["gpt_lnf_b"])
            hidden = _ln(h1, params["lnf_g"], params["lnf_b"])
            logits = (hidden @ params["head_w"] + params["head_b"]).astype(
                jnp.float32
            )
            nv = logits.shape[-1]
            logits = jnp.where(
                (jnp.arange(nv) == cfg.stop_audio_token)[None] & stop_blocked,
                -1e30,
                logits,
            )
            nxt = _sample_token(
                logits, history, sub, temperature, top_k, top_p,
                repetition_penalty, do_sample, cfg,
            )
        nxt = jnp.where(done, cfg.stop_audio_token, nxt)
        done = done | (nxt == cfg.stop_audio_token)
        history = jax.lax.dynamic_update_index_in_dim(
            history, nxt, hist_len, axis=1
        )
        if head_fn is not None:
            hist_mask = jnp.maximum(
                hist_mask, jax.nn.one_hot(nxt, vp, dtype=jnp.float32)
            )
        return (
            nxt, kc, vc, pos + 1, history, hist_mask, hist_len + 1, key, done
        ), (nxt, hidden)

    done0 = jnp.zeros((batch,), bool)
    (tok, kc, vc, pos, history, _, hist_len, key, done), (tokens, latents) = (
        jax.lax.scan(
            step,
            (last_token, kc, vc, pos, history, hist_mask0, hist_len, key, done0),
            jnp.arange(chunk),
        )
    )
    return (
        tokens.transpose(1, 0),  # (B, chunk)
        latents.transpose(1, 0, 2),  # (B, chunk, D)
        kc,
        vc,
        pos,
        history,
        hist_len,
        done,
    )


# --------------------------------------------------------------------------- #
# Random init
# --------------------------------------------------------------------------- #
def random_gpt(cfg: GPTConfig, seed: int = 0, dtype=jnp.bfloat16) -> Dict:
    rng = np.random.default_rng(seed)
    L, D, F = cfg.n_layer, cfg.d_model, 4 * cfg.d_model

    def dense(*shape, scale=None):
        scale = scale or 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[0])
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale, dtype)

    return {
        "text_emb": dense(cfg.n_text_vocab, D, scale=0.02),
        "text_pos": dense(cfg.max_text_tokens, D, scale=0.02),
        "audio_emb": dense(cfg.n_audio_vocab, D, scale=0.02),
        # +2 headroom rows like Coqui's LearnedPositionEmbeddings
        # (max_mel_tokens + 2): the start token occupies position 0, so
        # the cap-th generated token indexes max_audio_tokens + 1
        "audio_pos": dense(cfg.max_audio_tokens + 2, D, scale=0.02),
        "blocks": {
            "ln1_g": jnp.ones((L, D), jnp.float32),
            "ln1_b": jnp.zeros((L, D), jnp.float32),
            "q_w": dense(L, D, D),
            "q_b": jnp.zeros((L, D), dtype),
            "k_w": dense(L, D, D),
            "k_b": jnp.zeros((L, D), dtype),
            "v_w": dense(L, D, D),
            "v_b": jnp.zeros((L, D), dtype),
            "proj_w": dense(L, D, D),
            "proj_b": jnp.zeros((L, D), dtype),
            "ln2_g": jnp.ones((L, D), jnp.float32),
            "ln2_b": jnp.zeros((L, D), jnp.float32),
            "mlp_w1": dense(L, D, F),
            "mlp_b1": jnp.zeros((L, F), dtype),
            "mlp_w2": dense(L, F, D),
            "mlp_b2": jnp.zeros((L, D), dtype),
        },
        "gpt_lnf_g": jnp.ones(D, jnp.float32),
        "gpt_lnf_b": jnp.zeros(D, jnp.float32),
        "lnf_g": jnp.ones(D, jnp.float32),
        "lnf_b": jnp.zeros(D, jnp.float32),
        "head_w": dense(D, cfg.n_audio_vocab),
        "head_b": jnp.zeros(cfg.n_audio_vocab, dtype),
    }
