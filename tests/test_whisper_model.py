"""Whisper JAX model correctness tests.

No pretrained weights are available offline, so correctness is established
structurally: KV-cache/incremental decoding must agree with full prefill,
beam-1 must agree with a manual greedy rollout, and the cache reorder must
be a faithful batch permutation. These invariants pin down the decoder
math that CTranslate2 provided in the reference (main.py:341-443).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wis_tpu.decoding.beam import build_generate, trim_tokens
from wis_tpu.decoding.detect import build_detect_language, lang_index_to_code
from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import (
    DecoderCache,
    cross_kv,
    decode_step,
    encode,
    prefill,
)
from wis_tpu.models.whisper.tokenizer import EOT, SOT, build_prompt
from wis_tpu.models.whisper.weights import random_params

CFG = WhisperConfig(
    name="micro",
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def params():
    # f32 for tight numeric comparisons on CPU
    return random_params(CFG, seed=0, dtype=jnp.float32)


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)


def test_encoder_shapes(params, mel):
    xa = encode(params, mel, CFG)
    assert xa.shape == (1, CFG.n_audio_ctx, CFG.n_audio_state)
    assert jnp.isfinite(xa).all()


def test_prefill_matches_incremental(params, mel):
    """logits(prefill [t0..t3]) == logits from step-by-step decode."""
    xa = encode(params, mel, CFG)
    xa_kv = cross_kv(params, xa, CFG)
    tokens = jnp.asarray([[SOT, 100, 200, 300]], jnp.int32)

    cache_a = DecoderCache.zeros(CFG, 1, 8, jnp.float32)
    logits_full, _ = prefill(params, tokens, cache_a, xa_kv, CFG)

    cache_b = DecoderCache.zeros(CFG, 1, 8, jnp.float32)
    logits_inc = []
    first, cache_b = prefill(params, tokens[:, :1], cache_b, xa_kv, CFG)
    logits_inc.append(first[:, -1])
    for i in range(1, 4):
        step_logits, cache_b = decode_step(
            params, tokens[:, i], cache_b, xa_kv, CFG
        )
        logits_inc.append(step_logits)

    np.testing.assert_allclose(
        np.asarray(logits_full[0]),
        np.asarray(jnp.stack(logits_inc, axis=1)[0]),
        atol=1e-4,
    )


def test_cache_reorder_is_permutation(params, mel):
    xa = encode(params, jnp.tile(mel, (2, 1, 1)), CFG)
    xa_kv = cross_kv(params, xa, CFG)
    cache = DecoderCache.zeros(CFG, 2, 4, jnp.float32)
    toks = jnp.asarray([[SOT], [100]], jnp.int32)
    _, cache = prefill(params, toks, cache, xa_kv, CFG)
    swapped = cache.reorder(jnp.asarray([1, 0]))
    np.testing.assert_array_equal(np.asarray(swapped.k[:, 0]), np.asarray(cache.k[:, 1]))
    np.testing.assert_array_equal(np.asarray(swapped.v[:, 1]), np.asarray(cache.v[:, 0]))


def _manual_greedy(params, mel, prompt, n_steps):
    xa = encode(params, mel, CFG)
    xa_kv = cross_kv(params, xa, CFG)
    cache = DecoderCache.zeros(CFG, 1, prompt.shape[0] + n_steps, jnp.float32)
    logits, cache = prefill(params, prompt[None], cache, xa_kv, CFG)
    seq = []
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    seq.append(int(tok[0]))
    for _ in range(n_steps - 1):
        logits, cache = decode_step(params, tok, cache, xa_kv, CFG)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        seq.append(int(tok[0]))
    return seq


def test_beam1_equals_manual_greedy(params, mel):
    prompt = jnp.asarray(build_prompt("en", "transcribe"), jnp.int32)
    n_steps = 6
    gen = build_generate(
        CFG,
        beam_size=1,
        batch=1,
        max_new_tokens=n_steps,
        prompt_len=4,
        suppress_tokens=(),
        begin_suppress_tokens=(),
    )
    result = gen(params, mel, prompt, jnp.int32(n_steps))
    manual = _manual_greedy(params, mel, prompt, n_steps)
    got = list(np.asarray(result.tokens[0, 0]))
    # compare up to the first EOT in the manual rollout
    for g, m in zip(got, manual):
        assert g == m
        if m == EOT:
            break


def test_beam_search_basic(params, mel):
    prompt = jnp.asarray(build_prompt("en", "transcribe"), jnp.int32)
    gen = build_generate(
        CFG,
        beam_size=3,
        batch=1,
        max_new_tokens=8,
        prompt_len=4,
        suppress_tokens=(1, 2, 3),
        begin_suppress_tokens=(220,),
    )
    result = gen(params, mel, prompt, jnp.int32(8))
    assert result.tokens.shape == (1, 3, 8)
    assert result.scores.shape == (1, 3)
    # beams sorted by construction? not guaranteed — but best is argmax
    assert int(result.best[0]) == int(np.argmax(np.asarray(result.scores[0])))
    # suppressed tokens never emitted
    emitted = set(np.asarray(result.tokens).ravel().tolist())
    assert not emitted & {1, 2, 3}
    # scores are finite, lengths within budget
    assert np.isfinite(np.asarray(result.scores)).all()
    assert (np.asarray(result.lengths) <= 8).all()


def test_token_cap_early_exit(params, mel):
    prompt = jnp.asarray(build_prompt("en", "transcribe"), jnp.int32)
    gen = build_generate(
        CFG,
        beam_size=2,
        batch=1,
        max_new_tokens=16,
        prompt_len=4,
        suppress_tokens=(),
        begin_suppress_tokens=(),
    )
    capped = gen(params, mel, prompt, jnp.int32(3))
    assert (np.asarray(capped.lengths) <= 3 + 1).all()


def test_batched_generate(params):
    rng = np.random.default_rng(7)
    mel2 = jnp.asarray(rng.standard_normal((2, 80, 3000)), jnp.float32)
    prompt = jnp.asarray(build_prompt("en", "transcribe"), jnp.int32)
    gen = build_generate(
        CFG,
        beam_size=2,
        batch=2,
        max_new_tokens=5,
        prompt_len=4,
        suppress_tokens=(),
        begin_suppress_tokens=(),
    )
    result = gen(params, mel2, prompt, jnp.int32(5))
    assert result.tokens.shape == (2, 2, 5)
    # each sequence decodes independently: running sequence 0 alone matches
    gen1 = build_generate(
        CFG,
        beam_size=2,
        batch=1,
        max_new_tokens=5,
        prompt_len=4,
        suppress_tokens=(),
        begin_suppress_tokens=(),
    )
    solo = gen1(params, mel2[:1], prompt, jnp.int32(5))
    np.testing.assert_array_equal(
        np.asarray(solo.tokens[0]), np.asarray(result.tokens[0])
    )


def test_detect_language(params, mel):
    detect = build_detect_language(CFG)
    idx, prob = detect(params, mel)
    assert idx.shape == (1,)
    code = lang_index_to_code(int(idx[0]))
    assert len(code) in (2, 3)
    assert 0.0 <= float(prob[0]) <= 1.0


def test_trim_tokens():
    row = np.asarray([5, 6, EOT, EOT])
    np.testing.assert_array_equal(trim_tokens(row, 3), [5, 6])
    np.testing.assert_array_equal(trim_tokens(row, 2), [5, 6])


def test_ancestry_decode_matches_physical_reorder():
    """The ancestry-indirect beam decode (no cache permutation) must
    produce exactly the tokens/lengths/best of the physical-reorder
    path — the permutation is absorbed by the selection mask, not the
    math."""
    import jax.numpy as jnp
    import numpy as np

    from wis_tpu.decoding.beam import build_generate
    from wis_tpu.models.whisper.config import WhisperConfig
    from wis_tpu.models.whisper.tokenizer import build_prompt
    from wis_tpu.models.whisper.weights import random_params

    cfg = WhisperConfig(
        name="micro-anc",
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )
    params = random_params(cfg, seed=3, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((2, cfg.n_mels, 3000)) * 0.1, jnp.float32)
    prompt = jnp.asarray(build_prompt("en", "transcribe"), jnp.int32)

    kw = dict(
        beam_size=3, batch=2, max_new_tokens=8, prompt_len=prompt.shape[0],
        suppress_tokens=(), begin_suppress_tokens=(),
    )
    r_anc = build_generate(cfg, **kw, ancestry=True)(params, mel, prompt, jnp.int32(8))
    r_phys = build_generate(cfg, **kw, ancestry=False)(params, mel, prompt, jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(r_anc.tokens), np.asarray(r_phys.tokens))
    np.testing.assert_array_equal(np.asarray(r_anc.lengths), np.asarray(r_phys.lengths))
    np.testing.assert_array_equal(np.asarray(r_anc.best), np.asarray(r_phys.best))
    np.testing.assert_allclose(
        np.asarray(r_anc.scores), np.asarray(r_phys.scores), rtol=1e-4, atol=1e-5
    )


def test_ancestry_greedy_matches():
    """K=1 greedy is the degenerate ancestry case (identity map)."""
    import jax.numpy as jnp
    import numpy as np

    from wis_tpu.decoding.beam import build_generate
    from wis_tpu.models.whisper.config import WhisperConfig
    from wis_tpu.models.whisper.tokenizer import build_prompt
    from wis_tpu.models.whisper.weights import random_params

    cfg = WhisperConfig(
        name="micro-anc-g",
        n_audio_state=64,
        n_audio_head=2,
        n_audio_layer=2,
        n_text_state=64,
        n_text_head=2,
        n_text_layer=2,
    )
    params = random_params(cfg, seed=5, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.standard_normal((1, cfg.n_mels, 3000)) * 0.1, jnp.float32)
    prompt = jnp.asarray(build_prompt("en", "transcribe"), jnp.int32)
    kw = dict(
        beam_size=1, batch=1, max_new_tokens=6, prompt_len=prompt.shape[0],
        suppress_tokens=(), begin_suppress_tokens=(),
    )
    r_anc = build_generate(cfg, **kw, ancestry=True)(params, mel, prompt, jnp.int32(6))
    r_phys = build_generate(cfg, **kw, ancestry=False)(params, mel, prompt, jnp.int32(6))
    np.testing.assert_array_equal(np.asarray(r_anc.tokens), np.asarray(r_phys.tokens))
