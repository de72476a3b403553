"""Dynamic batcher tests: coalescing, mixed languages/tasks, futures."""

import numpy as np
import pytest

from wis_tpu.audio.mel import SAMPLE_RATE
from wis_tpu.runtime.batcher import ASRRequest, InferenceExecutor
from wis_tpu.runtime.engine import WhisperEngine
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.settings import APISettings


@pytest.fixture(scope="module")
def engine():
    settings = APISettings(
        max_decode_tokens=6,
        batch_buckets=["1", "2", "4"],
        batch_window_s=0.05,
        whisper_model_default="tiny",
    )
    return WhisperEngine(ModelRegistry(settings), settings)


def _audio(seconds: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(seconds * SAMPLE_RATE)) * 0.05).astype(
        np.float32
    )


def test_coalesced_matches_request_count(engine):
    reqs = [
        ASRRequest(audio=_audio(1.0, i), model="tiny", beam_size=1)
        for i in range(3)
    ]
    results = engine.transcribe_coalesced(reqs)
    assert len(results) == 3
    for r, res in zip(reqs, results):
        assert res.audio_duration_ms == 1000
        assert isinstance(res.text, str)


def test_coalesced_mixed_language_and_task(engine):
    reqs = [
        ASRRequest(audio=_audio(1.0, 1), model="tiny", beam_size=1,
                   force_language="de"),
        ASRRequest(audio=_audio(1.0, 2), model="tiny", beam_size=1,
                   detect_language=True),
        ASRRequest(audio=_audio(1.0, 3), model="tiny", beam_size=1,
                   translate=True),
    ]
    results = engine.transcribe_coalesced(reqs)
    assert results[0].language == "de"
    assert len(results[1].language) in (2, 3)
    assert results[2].translation is not None


def test_executor_concurrent_submissions(engine):
    execr = InferenceExecutor(engine)
    futures = [
        execr.submit(
            ASRRequest(audio=_audio(0.5, 10 + i), model="tiny", beam_size=1)
        )
        for i in range(4)
    ]
    results = [f.result(timeout=120) for f in futures]
    assert len(results) == 4
    assert all(r.audio_duration_ms == 500 for r in results)
    execr.shutdown()


def test_executor_long_request_solo(engine):
    execr = InferenceExecutor(engine)
    res = execr.submit_sync(
        ASRRequest(audio=_audio(35.0, 42), model="tiny", beam_size=1)
    )
    assert res.audio_duration_ms == 35_000
    execr.shutdown()


def test_executor_error_propagates(engine):
    execr = InferenceExecutor(engine)
    bad = ASRRequest(audio=_audio(0.5, 0), model="doesnotexist", beam_size=1)
    with pytest.raises(KeyError):
        execr.submit_sync(bad)
    execr.shutdown()


def test_coalesced_timestamps_kept(engine):
    """Two concurrent ?timestamps=true requests coalesce (same batch_key)
    and must still return segments — the round-1 coalesced path silently
    dropped them (ADVICE: engine.py transcribe_coalesced never forwarded
    timestamps)."""
    reqs = [
        ASRRequest(audio=_audio(1.0, 20 + i), model="tiny", beam_size=1,
                   timestamps=True)
        for i in range(2)
    ]
    results = engine.transcribe_coalesced(reqs)
    for res in results:
        assert res.segments is not None


def test_coalesced_per_row_max_tokens(engine):
    """A request's explicit token budget is honored per-row even when the
    batch decodes to the largest cap in it: identical audio rows decode
    identical tokens, so the capped row's text must be a decode-prefix of
    the uncapped row's."""
    audio = _audio(1.0, 30)
    capped, uncapped = engine.transcribe_coalesced([
        ASRRequest(audio=audio, model="tiny", beam_size=1, max_tokens=2),
        ASRRequest(audio=audio, model="tiny", beam_size=1, max_tokens=6),
    ])
    assert len(capped.text) <= len(uncapped.text)


def test_coalesced_fused_matches_xla(engine):
    """A coalesced batch through the fused kernel (fused_decode="on",
    interpret mode on CPU, block-diagonal cross-attention) must decode
    each row exactly as the XLA path does.

    The candidate vocabulary is restricted to a handful of ids (via the
    model tokenizer's suppress list, which the engine folds into every
    program): random-weight logits are near-uniform over 51k ids, and
    the kernel's f32-residual/bf16-dot mix vs the XLA path (plus
    AOT-cache entries compiled on other hosts) can flip near-tie top-k
    picks — the same determinism device the kernel-level tests use."""
    settings = APISettings(
        max_decode_tokens=6,
        batch_buckets=["1", "2", "4"],
        batch_window_s=0.05,
        whisper_model_default="tiny",
        fused_decode="on",
    )
    fused_engine = WhisperEngine(ModelRegistry(settings), settings)
    allowed = {100, 200, 300, 400, 500, 600}
    from wis_tpu.models.whisper.tokenizer import EOT

    sup = tuple(i for i in range(EOT) if i not in allowed)
    for eng in (fused_engine, engine):
        tok = eng.registry.get("tiny").tokenizer
        tok.suppress_tokens = sup
    # the shared XLA engine may hold programs built with the default
    # suppress list — force rebuilds under the restricted one
    engine._programs.clear()
    try:
        reqs = [
            ASRRequest(audio=_audio(1.0, 50 + i), model="tiny", beam_size=2)
            for i in range(3)
        ]
        got = fused_engine.transcribe_coalesced(reqs)
        want = engine.transcribe_coalesced(reqs)
        assert any(
            k[2] > 1 and k[8] is True for k in fused_engine._programs
        ), "expected a fused batch>1 program"
        for g, w in zip(got, want):
            assert g.text == w.text

        # mixed detect/translate through the fused B>1 variants
        mixed = [
            ASRRequest(audio=_audio(1.0, 60), model="tiny", beam_size=1,
                       detect_language=True),
            ASRRequest(audio=_audio(1.0, 61), model="tiny", beam_size=1,
                       translate=True),
        ]
        got_d = fused_engine.transcribe_coalesced([mixed[0], mixed[0]])
        want_d = engine.transcribe_coalesced([mixed[0], mixed[0]])
        assert got_d[0].language == want_d[0].language
        got_t = fused_engine.transcribe_coalesced([mixed[1], mixed[1]])
        want_t = engine.transcribe_coalesced([mixed[1], mixed[1]])
        assert got_t[0].translation == want_t[0].translation
    finally:
        # the shared `engine` fixture outlives this test
        from wis_tpu.models.whisper.tokenizer import DEFAULT_SUPPRESS_TOKENS

        engine.registry.get("tiny").tokenizer.suppress_tokens = (
            DEFAULT_SUPPRESS_TOKENS
        )
        engine._programs.clear()


def test_coalesced_detect_does_not_clobber_forced_language(engine):
    """Detect and forced-language requests coalesce; the per-row detect
    mask keeps the forced row's language (reported and decoded)."""
    results = engine.transcribe_coalesced([
        ASRRequest(audio=_audio(1.0, 40), model="tiny", beam_size=1,
                   detect_language=True),
        ASRRequest(audio=_audio(1.0, 41), model="tiny", beam_size=1,
                   force_language="fr"),
    ])
    assert results[1].language == "fr"
    assert len(results[0].language) in (2, 3)
