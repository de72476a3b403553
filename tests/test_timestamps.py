"""Timestamp-constrained decoding tests.

The reference only ever decodes with <|notimestamps|> (main.py:656-663);
this capability applies whisper's timestamp grammar in-jit. With random
weights the *content* is noise, but the grammar is mechanically
verifiable: first token is a timestamp, timestamps are non-decreasing,
text never follows an unpaired timestamp, and segments parse.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wis_tpu.decoding.beam import build_generate, trim_tokens
from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.tokenizer import (
    EOT,
    TIMESTAMP_BASE,
    WhisperTokenizer,
    build_prompt,
    parse_segments,
)
from wis_tpu.models.whisper.weights import random_params

CFG = WhisperConfig(
    name="micro-ts",
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def ts_rollout():
    params = random_params(CFG, seed=11, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)
    prompt = jnp.asarray(
        build_prompt("en", "transcribe", notimestamps=False), jnp.int32
    )
    gen = build_generate(
        CFG,
        beam_size=2,
        batch=1,
        max_new_tokens=12,
        prompt_len=3,
        suppress_tokens=(),
        begin_suppress_tokens=(220, EOT),
        with_timestamps=True,
    )
    result = gen(params, mel, prompt, jnp.int32(12))
    k = int(result.best[0])
    return trim_tokens(
        np.asarray(result.tokens[0, k]), int(result.lengths[0, k])
    )


def test_first_token_is_timestamp(ts_rollout):
    assert len(ts_rollout) > 0
    assert ts_rollout[0] >= TIMESTAMP_BASE


def test_timestamps_monotonic(ts_rollout):
    ts = [t for t in ts_rollout if t >= TIMESTAMP_BASE]
    assert all(a <= b for a, b in zip(ts, ts[1:]))


def test_no_text_after_unpaired_timestamp(ts_rollout):
    # walk the grammar exactly as HF's WhisperTimeStampLogitsProcessor
    # states it: a trailing timestamp whose predecessor is also a
    # timestamp (or which starts the sequence — `len(seq) < 2` counts as
    # paired) closes a segment, so text follows; a timestamp after text
    # is a segment end, so no plain-text token may follow it
    for i, t in enumerate(ts_rollout):
        if i == 0:
            continue
        last_ts = ts_rollout[i - 1] >= TIMESTAMP_BASE
        penult_ts = i < 2 or ts_rollout[i - 2] >= TIMESTAMP_BASE
        is_ts = t >= TIMESTAMP_BASE
        if last_ts and penult_ts:
            assert not is_ts
        if last_ts and not penult_ts:
            assert t >= EOT  # no plain text (ids < EOT)


def test_parse_segments_roundtrip():
    tok = WhisperTokenizer()
    t = lambda s: TIMESTAMP_BASE + int(s / 0.02)  # noqa: E731
    ids = [t(0.0), 100, 200, t(1.5), t(1.5), 300, t(2.0), EOT]
    segments = parse_segments(tok, ids)
    assert len(segments) == 2
    assert segments[0]["start"] == 0.0 and segments[0]["end"] == 1.5
    assert segments[1]["start"] == 1.5 and segments[1]["end"] == 2.0
    assert segments[0]["text"]


def test_engine_timestamps_path():
    from wis_tpu.runtime.engine import WhisperEngine
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    s = APISettings(max_decode_tokens=8, whisper_model_default="tiny")
    engine = WhisperEngine(ModelRegistry(s), s)
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    res = engine.transcribe(audio, model="tiny", beam_size=1, timestamps=True)
    assert res.segments is not None
    for seg in res.segments:
        assert set(seg) == {"start", "end", "text"}
        assert seg["end"] >= seg["start"] >= 0.0
