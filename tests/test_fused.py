"""Fused single-dispatch ASR program tests (decoding/fused.py): packing,
on-device language detect feeding the prompt, fused translate pass."""

import jax.numpy as jnp
import numpy as np
import pytest

from wis_tpu.decoding.fused import (
    build_asr_program,
    pack_ctl,
    packed_width,
    unpack_asr_result,
)
from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.tokenizer import LANG_BASE, TRANSCRIBE, build_prompt
from wis_tpu.models.whisper.weights import random_params

CFG = WhisperConfig(
    name="micro-fused",
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)
MAX_NEW = 6
BEAM = 2


@pytest.fixture(scope="module")
def params():
    return random_params(CFG, seed=0, dtype=jnp.float32)


def _audio_i16(batch=1, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, 480000)) * 0.05 * 32767).astype(np.int16)


def _prompts(batch=1):
    return np.tile(
        np.asarray([build_prompt("en", "transcribe")], np.int32), (batch, 1)
    )


def _ctl(prompts, cap, mask=None):
    m = np.ones(prompts.shape[0], np.int32) if mask is None else np.asarray(mask, np.int32)
    return jnp.asarray(pack_ctl(prompts, m, cap))


def test_plain_program_packs_correctly(params):
    prog = build_asr_program(
        CFG, beam_size=BEAM, batch=1, max_new_tokens=MAX_NEW, prompt_len=4,
        suppress_tokens=(), begin_suppress_tokens=(),
    )
    packed = np.asarray(
        prog(params, jnp.asarray(_audio_i16()), _ctl(_prompts(), MAX_NEW))
    )
    assert packed.shape == (1, packed_width(BEAM, MAX_NEW))
    tokens, lengths, best, lang_idx, lang_prob = unpack_asr_result(
        packed, BEAM, MAX_NEW
    )
    assert tokens.shape == (1, BEAM, MAX_NEW)
    assert (lengths <= MAX_NEW).all()
    assert 0 <= best[0] < BEAM
    assert lang_idx[0] == -1  # detect off


def test_detect_variant_sets_language(params):
    prog = build_asr_program(
        CFG, beam_size=BEAM, batch=1, max_new_tokens=MAX_NEW, prompt_len=4,
        suppress_tokens=(), begin_suppress_tokens=(), detect_language=True,
    )
    packed = np.asarray(
        prog(params, jnp.asarray(_audio_i16(seed=1)), _ctl(_prompts(), MAX_NEW))
    )
    _, _, _, lang_idx, lang_prob = unpack_asr_result(packed, BEAM, MAX_NEW)
    assert 0 <= lang_idx[0] < 99
    assert 0.0 <= lang_prob[0] <= 1.001


def test_translate_variant_packs_both_passes(params):
    prog = build_asr_program(
        CFG, beam_size=BEAM, batch=1, max_new_tokens=MAX_NEW, prompt_len=4,
        suppress_tokens=(), begin_suppress_tokens=(), translate=True,
    )
    packed = np.asarray(
        prog(params, jnp.asarray(_audio_i16(seed=2)), _ctl(_prompts(), MAX_NEW))
    )
    w = packed_width(BEAM, MAX_NEW)
    assert packed.shape == (1, 2 * w)
    main = unpack_asr_result(packed[:, :w], BEAM, MAX_NEW)
    tr = unpack_asr_result(packed[:, w:], BEAM, MAX_NEW)
    assert main[0].shape == tr[0].shape


def test_detect_matches_split_pipeline(params):
    """The fused detect must agree with the standalone detect program."""
    from wis_tpu.audio.mel import _log_mel_jax
    from wis_tpu.decoding.beam import build_encode
    from wis_tpu.decoding.detect import build_detect_language_xa

    audio = _audio_i16(seed=3)
    enc = build_encode(CFG)
    mel = _log_mel_jax(jnp.asarray(audio, jnp.float32) / 32768.0)
    xa_kv = enc(params, mel)
    detect = build_detect_language_xa(CFG)
    idx_ref, _ = detect(params, xa_kv)

    prog = build_asr_program(
        CFG, beam_size=1, batch=1, max_new_tokens=2, prompt_len=4,
        suppress_tokens=(), begin_suppress_tokens=(), detect_language=True,
    )
    packed = np.asarray(
        prog(params, jnp.asarray(audio), _ctl(_prompts(), 2))
    )
    _, _, _, lang_idx, _ = unpack_asr_result(packed, 1, 2)
    assert int(lang_idx[0]) == int(idx_ref[0])


def test_batched_fused(params):
    prog = build_asr_program(
        CFG, beam_size=BEAM, batch=2, max_new_tokens=MAX_NEW, prompt_len=4,
        suppress_tokens=(), begin_suppress_tokens=(),
    )
    packed = np.asarray(
        prog(params, jnp.asarray(_audio_i16(2, seed=4)), _ctl(_prompts(2), MAX_NEW))
    )
    assert packed.shape == (2, packed_width(BEAM, MAX_NEW))

def test_detect_mask_protects_forced_rows(params):
    """A detect batch with a masked-off row must leave that row's prompt
    language untouched (ADVICE round 1: the detect program used to
    overwrite prompt[:,1] for EVERY coalesced row) and report its
    lang_idx as -1."""
    audio = _audio_i16(2, seed=5)
    prompts = _prompts(2)
    prompts[1, 1] = LANG_BASE + 3  # forced non-detected language, row 1
    prog = build_asr_program(
        CFG, beam_size=BEAM, batch=2, max_new_tokens=MAX_NEW, prompt_len=4,
        suppress_tokens=(), begin_suppress_tokens=(), detect_language=True,
    )
    packed = np.asarray(
        prog(params, jnp.asarray(audio), _ctl(prompts, MAX_NEW, [1, 0]))
    )
    tokens, _, _, lang_idx, lang_prob = unpack_asr_result(packed, BEAM, MAX_NEW)
    assert lang_idx[0] >= 0  # detect applied to row 0
    assert lang_idx[1] == -1  # masked row reports no detection
    assert lang_prob[1] == 0.0

    # the masked row must decode exactly as the non-detect program would
    plain = build_asr_program(
        CFG, beam_size=BEAM, batch=2, max_new_tokens=MAX_NEW, prompt_len=4,
        suppress_tokens=(), begin_suppress_tokens=(),
    )
    packed_ref = np.asarray(
        plain(params, jnp.asarray(audio), _ctl(prompts, MAX_NEW))
    )
    tokens_ref, *_ = unpack_asr_result(packed_ref, BEAM, MAX_NEW)
    np.testing.assert_array_equal(tokens[1], tokens_ref[1])


def test_chunked_program_matches_host_windows(params):
    """chunked=True extracts the 22 s / 14 s-step windows ON DEVICE from
    one contiguous segment; output must be bit-identical to the plain
    program fed the same windows extracted on the host (chunk_iter +
    pad_or_trim semantics, engine long-form path)."""
    from wis_tpu.audio.chunking import CHUNK_LEN, STRIDE_LEFT, STRIDE_RIGHT
    from wis_tpu.audio.mel import N_SAMPLES

    batch = 3
    step = CHUNK_LEN - STRIDE_LEFT - STRIDE_RIGHT
    n_samp = (batch - 1) * step + CHUNK_LEN
    rng = np.random.default_rng(11)
    long_audio = (rng.standard_normal(n_samp) * 0.05 * 32767).astype(np.int16)

    chunked = build_asr_program(
        CFG, beam_size=BEAM, batch=batch, max_new_tokens=MAX_NEW,
        prompt_len=4, suppress_tokens=(), begin_suppress_tokens=(),
        chunked=True, n_samples=n_samp,
    )
    packed_c = np.asarray(
        chunked(params, jnp.asarray(long_audio), _ctl(_prompts(batch), MAX_NEW))
    )

    windows = np.zeros((batch, N_SAMPLES), np.int16)
    for w in range(batch):
        seg = long_audio[w * step : w * step + CHUNK_LEN]
        windows[w, : seg.shape[0]] = seg
    plain = build_asr_program(
        CFG, beam_size=BEAM, batch=batch, max_new_tokens=MAX_NEW,
        prompt_len=4, suppress_tokens=(), begin_suppress_tokens=(),
    )
    packed_h = np.asarray(
        plain(params, jnp.asarray(windows), _ctl(_prompts(batch), MAX_NEW))
    )
    np.testing.assert_array_equal(packed_c, packed_h)
