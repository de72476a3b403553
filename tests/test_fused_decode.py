"""Fused decode-step kernel tests (ops/fused_decode.py).

Runs in Pallas interpret mode on the CPU mesh; the TPU bring-up is
exercised by scripts/probe_fused_decode.py and the production beam path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import DecoderCache, decode_step
from wis_tpu.models.whisper.weights import random_params
from wis_tpu.ops.fused_decode import (
    build_fused_decode_step,
    fused_decode_step_reference,
    pack_decoder,
)
from wis_tpu.ops.quant import quantize_whisper_params

CFG = WhisperConfig(
    name="micro-fused-step",
    n_audio_state=128,
    n_audio_head=2,
    n_audio_layer=2,
    n_text_state=128,
    n_text_head=2,
    n_text_layer=2,
)
D = CFG.n_text_state
H = CFG.n_text_head
DH = D // H
L = CFG.n_text_layer
BK = 2
T = 128
S = 128


def _setup(seed=0, n_written=7):
    rng = np.random.default_rng(seed)
    params = random_params(CFG, seed=seed, dtype=jnp.bfloat16)
    params = quantize_whisper_params(params)
    packed = pack_decoder(params, CFG)

    x_emb = jnp.asarray(rng.standard_normal((BK, D)) * 0.3, jnp.float32)
    k_cache = jnp.zeros((L, H, DH, BK, T), jnp.bfloat16)
    v_cache = jnp.zeros((L, H, DH, BK, T), jnp.bfloat16)
    fill_k = rng.standard_normal((L, H, DH, BK, n_written)) * 0.3
    fill_v = rng.standard_normal((L, H, DH, BK, n_written)) * 0.3
    k_cache = k_cache.at[..., :n_written].set(jnp.asarray(fill_k, jnp.bfloat16))
    v_cache = v_cache.at[..., :n_written].set(jnp.asarray(fill_v, jnp.bfloat16))
    xa_k = jnp.asarray(rng.standard_normal((L, H, DH, S)) * 0.3, jnp.bfloat16)
    xa_v = jnp.asarray(rng.standard_normal((L, H, DH, S)) * 0.3, jnp.bfloat16)

    # ancestry: each beam's first n_written positions in a random row;
    # sel in the kernel's TIME-MAJOR flat order (column = t*BK + row)
    anc = rng.integers(0, BK, (BK, T))
    anc[:, n_written:] = -1
    sel = np.zeros((BK, T, BK), np.float32)
    for b in range(BK):
        for s in range(n_written):
            sel[b, s, anc[b, s]] = 1.0
    sel = jnp.asarray(sel.reshape(BK, BK * T))
    return params, packed, x_emb, k_cache, v_cache, xa_k, xa_v, sel, anc


def _tmajor(cache5):  # (L, H, DH, BK, T) → flat time-major (L, D, T*BK)
    return cache5.transpose(0, 1, 2, 4, 3).reshape(L, D, BK * T)


def test_kernel_matches_reference():
    n_written = 7
    (params, packed, x_emb, k_cache, v_cache, xa_k, xa_v, sel, _) = _setup(
        n_written=n_written
    )
    step = build_fused_decode_step(CFG, bk=BK, t_cache=T, s_audio=S)
    kc_flat = _tmajor(k_cache)
    vc_flat = _tmajor(v_cache)
    x_out, kc_out, vc_out = jax.jit(step)(
        packed, x_emb, kc_flat, vc_flat, xa_k, xa_v, sel,
        jnp.int32(n_written),
    )
    x_ref, kc_ref, vc_ref = fused_decode_step_reference(
        CFG, packed, x_emb, kc_flat, vc_flat, xa_k, xa_v, sel,
        pos=n_written,
    )
    np.testing.assert_allclose(
        np.asarray(x_out), np.asarray(x_ref), rtol=2e-2, atol=2e-2
    )
    # the kernel injected this step's K/V columns at pos*BK in place and
    # streamed every slab back — all other columns must be bit-identical
    np.testing.assert_allclose(
        np.asarray(kc_out, np.float32), np.asarray(kc_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(vc_out, np.float32), np.asarray(vc_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    untouched = np.ones(BK * T, bool)
    untouched[n_written * BK : (n_written + 1) * BK] = False
    np.testing.assert_array_equal(
        np.asarray(kc_out, np.float32)[:, :, untouched],
        np.asarray(kc_flat, np.float32)[:, :, untouched],
    )


def test_reference_matches_model_decode_step():
    """The packed-form math must agree with the production XLA decoder
    (model._decoder_pass with ancestry) on logits and the written K/V
    column, up to f32-vs-bf16 residual accumulation."""
    (params, packed, x_emb, k_cache, v_cache, xa_k, xa_v, sel, anc) = _setup()
    n_written = 7

    # model path: cache layout (L, BK, H, Dh, T), anc includes own pos
    k_model = k_cache.transpose(0, 3, 1, 2, 4)
    v_model = v_cache.transpose(0, 3, 1, 2, 4)
    cache = DecoderCache(
        k_model, v_model, jnp.int32(n_written)
    )
    anc_model = np.array(anc)
    anc_model[:, n_written] = np.arange(BK)  # own row at current pos
    anc_model = jnp.asarray(anc_model[None], jnp.int32)  # (1, BK, T)

    # calling the decoder pass with a crafted embedding
    # directly is not exposed; pick
    # a real token and recompute x_emb to match.
    dec = params["decoder"]
    tok = jnp.asarray([5, 9], jnp.int32)
    x_emb = (
        jnp.take(dec["tok_emb"], tok, axis=0).astype(jnp.float32)
        + dec["pos"][n_written].astype(jnp.float32)[None]
    )

    logits_model, cache2 = decode_step(
        params, tok, cache, (xa_k[:, None], xa_v[:, None]), CFG, anc=anc_model
    )

    x_ref, k_ref, v_ref = fused_decode_step_reference(
        CFG, packed, x_emb, _tmajor(k_cache), _tmajor(v_cache),
        xa_k, xa_v, sel,
    )
    xn = (
        (x_ref - jnp.mean(x_ref, -1, keepdims=True))
        * jax.lax.rsqrt(jnp.var(x_ref, -1, keepdims=True) + 1e-5)
        * dec["ln"]["g"] + dec["ln"]["b"]
    )
    logits_ref = jnp.einsum(
        "bd,vd->bv", xn.astype(jnp.bfloat16), dec["tok_emb"],
        preferred_element_type=jnp.float32,
    )
    lm = np.asarray(logits_model)
    lr = np.asarray(logits_ref)
    # same argmax and high correlation (bf16 vs f32 residual paths)
    np.testing.assert_array_equal(lm.argmax(-1), lr.argmax(-1))
    corr = np.corrcoef(lm.ravel(), lr.ravel())[0, 1]
    assert corr > 0.999, corr

    # the K/V column the model wrote must match the kernel's outputs
    k_col = np.asarray(cache2.k[:, :, :, :, n_written], np.float32)
    # (L, BK, H, Dh) -> (L, H, BK, Dh)
    k_col = k_col.transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        k_col, np.asarray(k_ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_fused_generate_matches_xla_beam_path():
    """The production beam program with fused=True (interpret-mode kernel
    on CPU) must decode the same tokens as the XLA ancestry path on the
    micro config."""
    from wis_tpu.decoding.beam import build_generate_xa

    cfg = WhisperConfig(
        name="micro-fused-gen",
        n_audio_state=D, n_audio_head=H, n_audio_layer=L,
        n_text_state=D, n_text_head=H, n_text_layer=L,
        n_audio_ctx=S,
    )
    rng = np.random.default_rng(3)
    params = quantize_whisper_params(random_params(cfg, seed=3, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    xa_k = jnp.asarray(rng.standard_normal((L, 1, H, DH, S)) * 0.3, jnp.bfloat16)
    xa_v = jnp.asarray(rng.standard_normal((L, 1, H, DH, S)) * 0.3, jnp.bfloat16)
    prompt = jnp.asarray([1, 2, 3], jnp.int32)

    # restrict the vocab to a handful of candidates: random-weight logits
    # are near-uniform over 51k ids, so f32-vs-bf16 residual noise could
    # flip top-k choices; over 6 candidates the gaps are wide and both
    # paths must make identical search decisions (kernel numerics
    # themselves are pinned by test_kernel_matches_reference)
    allowed = {100, 200, 300, 400, 500, 600}
    sup = tuple(i for i in range(cfg.n_vocab) if i not in allowed)
    kw = dict(
        beam_size=2, batch=1, max_new_tokens=6, prompt_len=3,
        suppress_tokens=sup, begin_suppress_tokens=(),
    )
    gen_f = build_generate_xa(cfg, **kw, fused=True)
    gen_x = build_generate_xa(cfg, **kw, ancestry=True)
    rf = gen_f(params, packed, (xa_k, xa_v), prompt, jnp.int32(6))
    rx = gen_x(params, (xa_k, xa_v), prompt, jnp.int32(6))
    np.testing.assert_array_equal(np.asarray(rf.tokens), np.asarray(rx.tokens))
    np.testing.assert_array_equal(np.asarray(rf.best), np.asarray(rx.best))
    np.testing.assert_allclose(
        np.asarray(rf.scores), np.asarray(rx.scores), rtol=5e-2, atol=5e-2
    )


def test_fused_generate_batch2_matches_xla():
    """Coalesced batch (B=2) through the fused kernel: block-diagonal
    cross-attention over two audio windows must decode each sequence
    exactly as the XLA ancestry path does."""
    from wis_tpu.decoding.beam import build_generate_xa

    cfg = WhisperConfig(
        name="micro-fused-b2",
        n_audio_state=D, n_audio_head=H, n_audio_layer=L,
        n_text_state=D, n_text_head=H, n_text_layer=L,
        n_audio_ctx=S,
    )
    B = 2
    rng = np.random.default_rng(17)
    params = quantize_whisper_params(random_params(cfg, seed=17, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    # two DIFFERENT windows — cross-window leakage would change tokens
    xa_k = jnp.asarray(rng.standard_normal((L, B, H, DH, S)) * 0.3, jnp.bfloat16)
    xa_v = jnp.asarray(rng.standard_normal((L, B, H, DH, S)) * 0.3, jnp.bfloat16)
    prompt = jnp.asarray([[1, 2, 3], [3, 1, 2]], jnp.int32)  # per-row prompts

    allowed = {100, 200, 300, 400, 500, 600}
    sup = tuple(i for i in range(cfg.n_vocab) if i not in allowed)
    kw = dict(
        beam_size=2, batch=B, max_new_tokens=6, prompt_len=3,
        suppress_tokens=sup, begin_suppress_tokens=(),
    )
    rf = build_generate_xa(cfg, **kw, fused=True)(
        params, packed, (xa_k, xa_v), prompt, jnp.int32(6)
    )
    rx = build_generate_xa(cfg, **kw, ancestry=True)(
        params, (xa_k, xa_v), prompt, jnp.int32(6)
    )
    np.testing.assert_array_equal(np.asarray(rf.tokens), np.asarray(rx.tokens))
    np.testing.assert_array_equal(np.asarray(rf.best), np.asarray(rx.best))
    np.testing.assert_allclose(
        np.asarray(rf.scores), np.asarray(rx.scores), rtol=5e-2, atol=5e-2
    )


def test_fused_generate_with_timestamps_matches_xla():
    """with_timestamps through the fused path (grammar inside
    ops/fused_logits) must make the same search decisions as the XLA
    grammar masks."""
    from wis_tpu.decoding.beam import build_generate_xa
    from wis_tpu.models.whisper.tokenizer import TIMESTAMP_BASE

    cfg = WhisperConfig(
        name="micro-fused-ts",
        n_audio_state=D, n_audio_head=H, n_audio_layer=L,
        n_text_state=D, n_text_head=H, n_text_layer=L,
        n_audio_ctx=S,
    )
    rng = np.random.default_rng(11)
    params = quantize_whisper_params(random_params(cfg, seed=11, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    xa_k = jnp.asarray(rng.standard_normal((L, 1, H, DH, S)) * 0.3, jnp.bfloat16)
    xa_v = jnp.asarray(rng.standard_normal((L, 1, H, DH, S)) * 0.3, jnp.bfloat16)
    prompt = jnp.asarray([1, 2, 3], jnp.int32)

    # narrow candidate set spanning text and timestamp ids so every
    # grammar rule fires (first token must be a ts; pairs alternate)
    allowed = {100, 200, 300, TIMESTAMP_BASE + 40, TIMESTAMP_BASE + 80,
               TIMESTAMP_BASE + 120}
    sup = tuple(i for i in range(cfg.n_vocab) if i not in allowed)
    kw = dict(
        beam_size=2, batch=1, max_new_tokens=8, prompt_len=3,
        suppress_tokens=sup, begin_suppress_tokens=(),
        with_timestamps=True,
    )
    rf = build_generate_xa(cfg, **kw, fused=True)(
        params, packed, (xa_k, xa_v), prompt, jnp.int32(8)
    )
    rx = build_generate_xa(cfg, **kw, ancestry=True)(
        params, (xa_k, xa_v), prompt, jnp.int32(8)
    )
    np.testing.assert_array_equal(np.asarray(rf.tokens), np.asarray(rx.tokens))
    np.testing.assert_array_equal(np.asarray(rf.best), np.asarray(rx.best))
    # grammar held: first token is a timestamp
    assert (np.asarray(rf.tokens)[0, :, 0] >= TIMESTAMP_BASE).all()


def test_fused_generate_greedy():
    """K=1 greedy through the fused kernel (bk=1 shapes)."""
    from wis_tpu.decoding.beam import build_generate_xa

    cfg = WhisperConfig(
        name="micro-fused-greedy",
        n_audio_state=D, n_audio_head=H, n_audio_layer=L,
        n_text_state=D, n_text_head=H, n_text_layer=L,
        n_audio_ctx=S,
    )
    rng = np.random.default_rng(5)
    params = quantize_whisper_params(random_params(cfg, seed=5, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    xa_k = jnp.asarray(rng.standard_normal((L, 1, H, DH, S)) * 0.3, jnp.bfloat16)
    xa_v = jnp.asarray(rng.standard_normal((L, 1, H, DH, S)) * 0.3, jnp.bfloat16)
    prompt = jnp.asarray([1, 2, 3], jnp.int32)
    kw = dict(
        beam_size=1, batch=1, max_new_tokens=4, prompt_len=3,
        suppress_tokens=(), begin_suppress_tokens=(),
    )
    rf = build_generate_xa(cfg, **kw, fused=True)(
        params, packed, (xa_k, xa_v), prompt, jnp.int32(4)
    )
    rx = build_generate_xa(cfg, **kw, ancestry=True)(
        params, (xa_k, xa_v), prompt, jnp.int32(4)
    )
    np.testing.assert_array_equal(np.asarray(rf.tokens), np.asarray(rx.tokens))


def test_pack_decoder_shapes():
    params = quantize_whisper_params(random_params(CFG, seed=1))
    packed = pack_decoder(params, CFG)
    assert packed.w.shape == (L, 14, D, D)
    assert packed.s.shape == (L, 14, 1, D)
    assert packed.b.shape == (L, 14, 1, D)
    assert packed.ln.shape == (L, 6, D)


def test_fused_generate_asymmetric_v3_decoder():
    """Turbo/distil-style config (deep encoder, shallow decoder, v3
    51866-token vocab) through the production fused path: the kernel,
    packer, and logits head are sized by n_text_layer/n_vocab alone."""
    from wis_tpu.decoding.beam import build_generate_xa

    cfg = WhisperConfig(
        name="micro-fused-turbo",
        n_mels=128,
        n_vocab=51866,
        n_audio_state=D, n_audio_head=H, n_audio_layer=4,
        n_text_state=D, n_text_head=H, n_text_layer=1,
        n_audio_ctx=S,
    )
    Lt = cfg.n_text_layer
    rng = np.random.default_rng(23)
    params = quantize_whisper_params(random_params(cfg, seed=23, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    assert packed.w.shape == (Lt, 14, D, D)
    xa_k = jnp.asarray(rng.standard_normal((Lt, 1, H, DH, S)) * 0.3, jnp.bfloat16)
    xa_v = jnp.asarray(rng.standard_normal((Lt, 1, H, DH, S)) * 0.3, jnp.bfloat16)
    prompt = jnp.asarray([1, 2, 3], jnp.int32)

    allowed = {100, 200, 300, 400, 500, 600}
    sup = tuple(i for i in range(cfg.n_vocab) if i not in allowed)
    kw = dict(
        beam_size=2, batch=1, max_new_tokens=5, prompt_len=3,
        suppress_tokens=sup, begin_suppress_tokens=(),
    )
    rf = build_generate_xa(cfg, **kw, fused=True)(
        params, packed, (xa_k, xa_v), prompt, jnp.int32(5)
    )
    rx = build_generate_xa(cfg, **kw, ancestry=True)(
        params, (xa_k, xa_v), prompt, jnp.int32(5)
    )
    np.testing.assert_array_equal(np.asarray(rf.tokens), np.asarray(rx.tokens))
    np.testing.assert_array_equal(np.asarray(rf.best), np.asarray(rx.best))


# --------------------------------------------------------------------- #
# int4 alias (the int4 decode weight stream was removed in round 3 —
# measured perf-neutral in round 2, BENCH.md §int4; the RTN quantizer
# itself stays in ops/quant.py and settings.quant="int4" aliases int8)
# --------------------------------------------------------------------- #
def test_quant_int4_setting_aliases_int8():
    from wis_tpu.ops.fused_decode import PackedDecoder
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    settings = APISettings(
        max_decode_tokens=4,
        batch_buckets=["1"],
        warmup_iterations=0,
        whisper_model_default="tiny",
        quant="int4",
        fused_decode="on",
    )
    eng = WhisperEngine(ModelRegistry(settings), settings)
    rng = np.random.default_rng(31)
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    res = eng.transcribe(audio, model="tiny", beam_size=1)
    assert isinstance(res.text, str)
    loaded = eng.registry.get("tiny")
    assert isinstance(eng._packed_decoder(loaded), PackedDecoder)


def test_kernel_xa_int8_matches_reference():
    """xa_int8 kernel vs the mirror running the identical scaled-dot
    math, plus closeness to the bf16 cross-KV output (quant noise only)."""
    from wis_tpu.ops.fused_decode import quantize_xa_columns

    n_written = 7
    (params, packed, x_emb, k_cache, v_cache, xa_k, xa_v, sel, _) = _setup(
        n_written=n_written
    )
    kc_flat = _tmajor(k_cache)
    vc_flat = _tmajor(v_cache)
    qk, qv, xa_s = quantize_xa_columns(xa_k, xa_v)
    step = build_fused_decode_step(
        CFG, bk=BK, t_cache=T, s_audio=S, xa_int8=True
    )
    x_out, kc_out, vc_out = jax.jit(step)(
        packed, x_emb, kc_flat, vc_flat, qk, qv, xa_s, sel,
        jnp.int32(n_written),
    )
    x_ref, kc_ref, vc_ref = fused_decode_step_reference(
        CFG, packed, x_emb, kc_flat, vc_flat, qk, qv, sel,
        pos=n_written, xa_s=xa_s,
    )
    np.testing.assert_allclose(
        np.asarray(x_out), np.asarray(x_ref), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(kc_out, np.float32), np.asarray(kc_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # int8 cross-KV stays within quant noise of the bf16 stream
    x_full, _, _ = fused_decode_step_reference(
        CFG, packed, x_emb, kc_flat, vc_flat, xa_k, xa_v, sel,
        pos=n_written,
    )
    np.testing.assert_allclose(
        np.asarray(x_out), np.asarray(x_full), rtol=0.1, atol=0.1
    )


def test_generate_xa_int8_close_to_bf16():
    """The full fused beam program with xa_int8 produces scores within
    quant noise of the bf16-stream program (tokens may legitimately
    differ on random micro weights when candidates are near-ties, so the
    contract is score closeness on the same forced prefix)."""
    from wis_tpu.decoding.beam import build_generate_xa, build_encode

    params = quantize_whisper_params(
        random_params(CFG, seed=5, dtype=jnp.bfloat16)
    )
    packed = pack_decoder(params, CFG)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(
        rng.standard_normal((1, CFG.n_mels, 2 * CFG.n_audio_ctx)) * 0.3,
        jnp.float32,
    )
    xa_kv = build_encode(CFG)(params, mel)
    prompt = jnp.asarray([3, 7], jnp.int32)
    kw = dict(
        beam_size=2, batch=1, max_new_tokens=6, prompt_len=2,
        suppress_tokens=(), begin_suppress_tokens=(),
    )
    r8 = build_generate_xa(CFG, fused=True, xa_int8=True, **kw)(
        params, packed, xa_kv, prompt, jnp.int32(6)
    )
    rb = build_generate_xa(CFG, fused=True, **kw)(
        params, packed, xa_kv, prompt, jnp.int32(6)
    )
    np.testing.assert_allclose(
        np.asarray(r8.scores), np.asarray(rb.scores), rtol=0.15, atol=0.15
    )
