"""Word-level alignment (decoding/align.py): DTW, word grouping, the
teacher-forced alignment program, and the engine/server surface."""

import numpy as np
import pytest

from wis_tpu.decoding.align import (
    default_alignment_heads,
    dtw_path,
    split_word_tokens,
    words_from_alignment,
)
from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.tokenizer import EOT, WhisperTokenizer


def test_dtw_diagonal():
    """A sharply diagonal attention matrix aligns token i to its own
    frame band, and the path is monotonic in both axes."""
    T, S = 4, 12
    m = np.full((T, S), -1.0)
    for i in range(T):
        m[i, i * 3 : (i + 1) * 3] = 1.0
    ti, si = dtw_path(m)
    assert (np.diff(ti) >= 0).all() and (np.diff(si) >= 0).all()
    assert ti[0] == 0 and si[0] == 0
    assert ti[-1] == T - 1 and si[-1] == S - 1
    # each token's frames lie inside its band
    for r in range(T):
        frames = si[ti == r]
        assert frames.min() >= r * 3 and frames.max() < (r + 1) * 3


def test_split_word_tokens_placeholder_vocab():
    # placeholder tokenizer renders i%7==0 as space-prefixed ("Ġt{i}")
    tok = WhisperTokenizer()
    ids = [7, 8, 9, 14, 15]  # word1=[7,8,9], word2=[14,15]
    groups = split_word_tokens(tok, ids)
    assert groups == [[7, 8, 9], [14, 15]]
    # no-space languages split every token
    assert split_word_tokens(tok, ids, language="zh") == [[i] for i in ids]


def test_words_from_alignment_synthetic():
    prompt_len = 3
    tokens = [7, 8, 14, EOT]  # two words then EOT
    seq_len = 10
    S = 20
    matrix = np.zeros((seq_len, S), np.float32)
    # token rows at positions 3,4,5: words at frames [2..5], [6..9], [10..15]
    matrix[3, 2:6] = 1.0
    matrix[4, 6:10] = 1.0
    matrix[5, 10:16] = 1.0
    probs = np.full(seq_len, 0.5, np.float32)
    words = words_from_alignment(
        WhisperTokenizer(), tokens, matrix, probs, prompt_len,
        n_frames=16, language="en",
    )
    assert len(words) == 2
    w1, w2 = words
    assert w1["start"] == pytest.approx(0.04, abs=0.05)
    assert w1["end"] <= w2["start"] + 1e-6
    assert w2["end"] == pytest.approx(16 * 0.02, abs=0.1)
    for w in words:
        assert set(w) == {"word", "start", "end", "probability"}
        assert 0.0 <= w["probability"] <= 1.0


def test_align_program_shapes():
    import jax.numpy as jnp

    from wis_tpu.decoding.align import build_align_program
    from wis_tpu.models.whisper.model import cross_kv, encode
    from wis_tpu.models.whisper.weights import random_params

    cfg = WhisperConfig(
        name="micro-align",
        n_audio_state=64, n_audio_head=2, n_audio_layer=2,
        n_text_state=64, n_text_head=2, n_text_layer=2,
        n_audio_ctx=32,
    )
    params = random_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, cfg.n_mels, 64)), jnp.float32)
    xa = encode(params, mel, cfg)
    xa_kv = cross_kv(params, xa, cfg)
    seq_len = 12
    heads = default_alignment_heads(cfg)
    prog = build_align_program(cfg, seq_len=seq_len, heads=heads)
    tokens = jnp.asarray([[1, 2, 3, 5, 6, 7, EOT, EOT, EOT, EOT, EOT, EOT]],
                         jnp.int32)
    matrix, probs = prog(params, xa_kv, tokens, jnp.int32(7))
    matrix = np.asarray(matrix)
    probs = np.asarray(probs)
    assert matrix.shape == (seq_len, cfg.n_audio_ctx)
    assert probs.shape == (seq_len,)
    # masked-out (pad) rows contribute nothing
    assert np.abs(matrix[7:]).max() == 0.0
    assert np.isfinite(matrix).all()
    assert ((probs >= 0) & (probs <= 1)).all()


def test_engine_word_timestamps():
    """End-to-end: transcribe(word_timestamps=True) returns structured,
    time-monotonic words on the tiny model (random weights — content is
    meaningless, mechanics are exact)."""
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    settings = APISettings(
        max_decode_tokens=6,
        decode_token_buckets=["6"],
        batch_buckets=["1"],
        warmup_iterations=0,
        whisper_model_default="tiny",
    )
    eng = WhisperEngine(ModelRegistry(settings), settings)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    res = eng.transcribe(
        audio, model="tiny", beam_size=1, max_tokens=6, word_timestamps=True
    )
    assert res.words is not None
    for w in res.words:
        assert w["end"] >= w["start"] >= 0.0
        assert w["end"] <= 1.5  # inside the (padded) 1 s audio + slack
    starts = [w["start"] for w in res.words]
    assert starts == sorted(starts)
