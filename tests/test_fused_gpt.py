"""Fused XTTS-GPT decode-step kernel tests (ops/fused_gpt.py).

Runs in Pallas interpret mode on the CPU mesh; the TPU bring-up is
exercised by scripts/probe_fused_gpt.py and the streaming TTS path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.models.xtts.gpt import (
    GPTConfig,
    build_prefill,
    flatten_gpt_cache,
    random_gpt,
    run_decode_chunk,
    run_decode_chunk_fused,
)
from wis_tpu.ops.fused_gpt import (
    NC,
    PackedGPT,
    build_fused_gpt_step,
    fused_gpt_step_reference,
    pack_gpt,
)
from wis_tpu.ops.quant import quantize_gpt_params

CFG = GPTConfig(
    n_layer=2,
    n_head=4,
    d_model=128,
    n_text_vocab=64,
    n_audio_vocab=36,
    max_text_tokens=16,
    max_audio_tokens=24,
    start_audio_token=34,
    stop_audio_token=35,
)
D = CFG.d_model
H = CFG.n_head
DH = D // H
L = CFG.n_layer
BK = 1
T = 128  # t_cache: BK * T must be lane-aligned


def _setup(seed=0, n_written=7):
    rng = np.random.default_rng(seed)
    params = quantize_gpt_params(random_gpt(CFG, seed=seed, dtype=jnp.bfloat16))
    packed = pack_gpt(params, CFG)

    x_emb = jnp.asarray(rng.standard_normal((BK, D)) * 0.3, jnp.float32)
    k_cache = jnp.zeros((L, D, BK * T), jnp.bfloat16)
    v_cache = jnp.zeros((L, D, BK * T), jnp.bfloat16)
    fill_k = rng.standard_normal((L, D, n_written * BK)) * 0.3
    fill_v = rng.standard_normal((L, D, n_written * BK)) * 0.3
    k_cache = k_cache.at[..., : n_written * BK].set(
        jnp.asarray(fill_k, jnp.bfloat16)
    )
    v_cache = v_cache.at[..., : n_written * BK].set(
        jnp.asarray(fill_v, jnp.bfloat16)
    )
    col = np.arange(BK * T)[None, :]
    row = np.arange(BK)[:, None]
    sel = ((col // BK < n_written) & (col % BK == row)).astype(np.float32)
    return params, packed, x_emb, k_cache, v_cache, jnp.asarray(sel), n_written


def test_pack_gpt_layout():
    params = quantize_gpt_params(random_gpt(CFG, seed=0, dtype=jnp.bfloat16))
    packed = pack_gpt(params, CFG)
    assert packed.w.shape == (L, NC, D, D)
    assert packed.s.shape == (L, NC, 1, D)
    assert packed.b.shape == (L, NC, 1, D)
    assert packed.ln.shape == (L, 4, D)
    assert packed.w.dtype == jnp.int8


def test_kernel_matches_reference_mirror():
    """One fused step (interpret mode) vs the pure-XLA mirror: hidden
    state and the injected cache columns agree."""
    params, packed, x_emb, kc, vc, sel, pos = _setup()
    step = build_fused_gpt_step(CFG, bk=BK, t_cache=T)
    x_out, kc_out, vc_out = step(packed, x_emb, kc, vc, sel, jnp.int32(pos))
    x_ref, kc_ref, vc_ref = fused_gpt_step_reference(
        CFG, packed, x_emb, kc, vc, sel, pos
    )
    np.testing.assert_allclose(
        np.asarray(x_out), np.asarray(x_ref), rtol=2e-2, atol=2e-2
    )
    # this step's K/V columns landed at pos*BK + row on both paths
    np.testing.assert_allclose(
        np.asarray(kc_out[:, :, pos * BK : (pos + 1) * BK], np.float32),
        np.asarray(kc_ref[:, :, pos * BK : (pos + 1) * BK], np.float32),
        rtol=3e-2, atol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(vc_out[:, :, pos * BK : (pos + 1) * BK], np.float32),
        np.asarray(vc_ref[:, :, pos * BK : (pos + 1) * BK], np.float32),
        rtol=3e-2, atol=3e-2,
    )
    # untouched columns pass through the alias unchanged
    np.testing.assert_array_equal(
        np.asarray(kc_out[:, :, (pos + 1) * BK :], np.float32),
        np.asarray(kc[:, :, (pos + 1) * BK :], np.float32),
    )


def test_fused_chunk_matches_xla_chunk_greedy():
    """Full chunk program: prefill (shared) → run_decode_chunk_fused vs
    run_decode_chunk, greedy. Tokens match exactly; latents match within
    kernel numerics."""
    cond_len, text_len, chunk = 2, 4, 6
    max_len = cond_len + text_len + 1 + CFG.max_audio_tokens
    params = quantize_gpt_params(random_gpt(CFG, seed=1, dtype=jnp.bfloat16))
    packed = pack_gpt(params, CFG)

    prefill = build_prefill(
        CFG, batch=1, cond_len=cond_len, text_len=text_len, max_len=max_len
    )
    rng = np.random.default_rng(3)
    cond = jnp.asarray(
        rng.standard_normal((1, cond_len, D)) * 0.1, jnp.float32
    )
    text = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
    _, cache = prefill(params, cond, text)

    args = dict(
        history=jnp.zeros((1, CFG.max_audio_tokens), jnp.int32),
        hist_len=jnp.int32(0),
        key=jax.random.PRNGKey(0),
        temperature=jnp.float32(1.0),
        top_k=jnp.int32(5),
        top_p=jnp.float32(0.9),
        repetition_penalty=jnp.float32(2.0),
        do_sample=jnp.bool_(False),
    )
    last = jnp.full((1,), CFG.start_audio_token, jnp.int32)

    tok_x, lat_x, _, _, _, done_x = run_decode_chunk(
        params, last, cache, args["history"], args["hist_len"], args["key"],
        args["temperature"], args["top_k"], args["top_p"],
        args["repetition_penalty"], args["do_sample"],
        cfg=CFG, chunk=chunk, batch=1,
    )

    kc, vc = flatten_gpt_cache(cache, T)
    step_fn = build_fused_gpt_step(CFG, bk=1, t_cache=T)
    tok_f, lat_f, _, _, _, _, _, done_f = run_decode_chunk_fused(
        params, packed, step_fn, last, kc, vc, cache.pos,
        args["history"], args["hist_len"], args["key"],
        args["temperature"], args["top_k"], args["top_p"],
        args["repetition_penalty"], args["do_sample"],
        cfg=CFG, chunk=chunk, batch=1,
    )
    np.testing.assert_array_equal(np.asarray(tok_f), np.asarray(tok_x))
    np.testing.assert_array_equal(np.asarray(done_f), np.asarray(done_x))
    np.testing.assert_allclose(
        np.asarray(lat_f, np.float32), np.asarray(lat_x, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_fused_chunk_sampled_runs_and_respects_min_tokens():
    """Sampled decode through the fused path: finite latents, tokens in
    range, and the stop token blocked below the min_audio_tokens floor
    (sampling draws may differ from the XLA path within kernel numerics,
    so this is a behavioral test, not an equality test)."""
    cond_len, text_len, chunk = 2, 4, 8
    max_len = cond_len + text_len + 1 + CFG.max_audio_tokens
    params = quantize_gpt_params(random_gpt(CFG, seed=2, dtype=jnp.bfloat16))
    packed = pack_gpt(params, CFG)
    prefill = build_prefill(
        CFG, batch=1, cond_len=cond_len, text_len=text_len, max_len=max_len
    )
    cond = jnp.zeros((1, cond_len, D), jnp.float32)
    text = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    _, cache = prefill(params, cond, text)
    kc, vc = flatten_gpt_cache(cache, T)
    step_fn = build_fused_gpt_step(CFG, bk=1, t_cache=T)
    tok, lat, _, _, _, _, hist_len, done = run_decode_chunk_fused(
        params, packed, step_fn,
        jnp.full((1,), CFG.start_audio_token, jnp.int32),
        kc, vc, cache.pos,
        jnp.zeros((1, CFG.max_audio_tokens), jnp.int32), jnp.int32(0),
        jax.random.PRNGKey(7), jnp.float32(0.8), jnp.int32(8),
        jnp.float32(0.9), jnp.float32(2.0), jnp.bool_(True),
        jnp.int32(chunk),  # min_tokens = chunk: no stop inside this chunk
        cfg=CFG, chunk=chunk, batch=1,
    )
    tok = np.asarray(tok)
    assert tok.shape == (1, chunk)
    assert (tok >= 0).all() and (tok < CFG.n_audio_vocab).all()
    assert not (tok == CFG.stop_audio_token).any()
    assert np.isfinite(np.asarray(lat, np.float32)).all()
    assert int(hist_len) == chunk


def test_model_stream_fused_matches_xla(monkeypatch):
    """End-to-end streaming equality: XTTSModel with XTTS_FUSED=1 (fused
    Pallas chunk program, interpret mode on CPU) yields the same greedy
    audio stream as XTTS_FUSED=0 (XLA scan path)."""
    import jax.numpy as jnp

    from wis_tpu.models.xtts.hifigan import HiFiGANConfig
    from wis_tpu.models.xtts.model import XTTSConfig, XTTSModel

    micro = XTTSConfig(
        gpt=GPTConfig(
            n_layer=2, n_head=2, d_model=32, n_text_vocab=256,
            n_audio_vocab=68, max_text_tokens=32, max_audio_tokens=40,
            start_audio_token=66, stop_audio_token=67,
        ),
        vocoder=HiFiGANConfig(
            in_dim=32, cond_dim=16, upsample_initial=32,
            upsample_rates=(4, 2), upsample_kernels=(8, 4),
            resblock_kernels=(3,), resblock_dilations=((1, 3),),
            gpt_code_stride=16,
        ),
        text_buckets=(8, 16, 32),
        cond_len=4,
        left_context_frames=2,
    )
    rng = np.random.default_rng(5)
    latent = rng.standard_normal((4, 32)).astype(np.float32) * 0.1
    speaker = rng.standard_normal(16).astype(np.float32)
    kwargs = dict(
        stream_chunk_size=8, overlap_wav_len=16, do_sample=False, seed=3,
        min_audio_tokens=16,
    )

    monkeypatch.setenv("XTTS_FUSED", "0")
    m_xla = XTTSModel(cfg=micro, dtype=jnp.float32)
    chunks_xla = list(
        m_xla.inference_stream("hello world", "en", latent, speaker, **kwargs)
    )
    monkeypatch.setenv("XTTS_FUSED", "1")
    m_fused = XTTSModel(cfg=micro, dtype=jnp.float32)
    assert m_fused.gpt_packed is not None
    chunks_fused = list(
        m_fused.inference_stream("hello world", "en", latent, speaker, **kwargs)
    )
    assert len(chunks_fused) == len(chunks_xla) and len(chunks_xla) > 0
    for cf, cx in zip(chunks_fused, chunks_xla):
        assert cf.shape == cx.shape
        np.testing.assert_allclose(cf, cx, rtol=5e-2, atol=5e-2)
