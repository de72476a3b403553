"""WhisperEngine pipeline tests (reference do_whisper semantics,
main.py:554-770), on random-weight tiny over the CPU test mesh."""

import numpy as np
import pytest

from wis_tpu.audio.mel import SAMPLE_RATE
from wis_tpu.runtime.engine import WhisperEngine, _normalize_language
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.settings import APISettings


@pytest.fixture(scope="module")
def engine():
    settings = APISettings(
        max_decode_tokens=8,
        batch_buckets=["1", "2", "4"],
        concurrent_gpu_chunks=4,
        warmup_iterations=1,
        whisper_model_default="tiny",
    )
    return WhisperEngine(ModelRegistry(settings), settings)


def _audio(seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(seconds * SAMPLE_RATE)) * 0.05).astype(
        np.float32
    )


def test_transcribe_short(engine):
    res = engine.transcribe(_audio(1.0), model="tiny", beam_size=1)
    assert res.audio_duration_ms == 1000
    assert isinstance(res.text, str)
    assert res.language == "en"
    assert res.infer_time_ms > 0
    assert set(res.timings) >= {"features", "asr_dispatch", "decode_text"}


def test_transcribe_beam(engine):
    res = engine.transcribe(_audio(1.0), model="tiny", beam_size=2)
    assert isinstance(res.text, str)
    # program key: (model, beam, batch, prompt_len, detect, translate)
    assert any(k[1] == 2 for k in engine._programs)


def test_long_mode_beam_override(engine):
    # ≥ 12 s activates long mode: requested beam is overridden to
    # long_beam_size (reference main.py:582-586)
    engine.transcribe(_audio(12.5, seed=1), model="tiny", beam_size=1)
    assert any(k[1] == engine.settings.long_beam_size for k in engine._programs)


def test_chunked_long_form(engine):
    res = engine.transcribe(_audio(70.0, seed=2), model="tiny", beam_size=1)
    assert res.audio_duration_ms == 70_000
    assert isinstance(res.text, str)


def test_detect_language(engine):
    res = engine.transcribe(
        _audio(1.0, seed=3), model="tiny", beam_size=1, detect_language=True
    )
    assert len(res.language) in (2, 3)


def test_force_language(engine):
    res = engine.transcribe(
        _audio(1.0, seed=4), model="tiny", beam_size=1, force_language="de"
    )
    assert res.language == "de"


def test_translate(engine):
    res = engine.transcribe(
        _audio(1.0, seed=5), model="tiny", beam_size=1, translate=True
    )
    assert res.translation is not None
    assert isinstance(res.translation, str)


def test_truncation_when_chunking_disabled():
    settings = APISettings(
        max_decode_tokens=4,
        support_chunking=False,
        whisper_model_default="tiny",
    )
    engine = WhisperEngine(ModelRegistry(settings), settings)
    res = engine.transcribe(_audio(31.0, seed=6), model="tiny", beam_size=1)
    assert res.audio_duration_ms == 31_000


def test_unknown_model_rejected(engine):
    with pytest.raises(KeyError):
        engine.transcribe(_audio(0.5), model="nonexistent")


def test_normalize_language():
    assert _normalize_language("<|en|>") == "en"
    assert _normalize_language("en") == "en"


def test_program_cache_reuse(engine):
    n_before = len(engine._programs)
    engine.transcribe(_audio(1.0, seed=7), model="tiny", beam_size=1)
    assert len(engine._programs) == n_before


def test_empty_audio(engine):
    res = engine.transcribe(np.zeros(0, np.float32), model="tiny", beam_size=1)
    assert res.audio_duration_ms == 0
    assert isinstance(res.text, str)


def test_exactly_30s_single_window(engine):
    res = engine.transcribe(_audio(30.0, seed=8), model="tiny", beam_size=1)
    assert res.audio_duration_ms == 30_000


def test_just_over_30s_chunks(engine):
    res = engine.transcribe(_audio(30.5, seed=9), model="tiny", beam_size=1)
    assert res.audio_duration_ms == 30_500
    assert isinstance(res.text, str)


def test_max_tokens_cap(engine):
    res = engine.transcribe(_audio(1.0, seed=10), model="tiny", beam_size=1,
                            max_tokens=2)
    assert isinstance(res.text, str)


def test_decode_bucket_selection():
    # default-settings engine (no model load needed for bucket logic)
    e = WhisperEngine(settings=APISettings())
    # short audio defaults to the short bucket; explicit caps steer
    assert e._decode_bucket(3840, None) == 96
    assert e._decode_bucket(3840, 32) == 96
    assert e._decode_bucket(3840, 150) == 224  # explicit big cap escalates
    # long audio always uses the full bucket
    assert e._decode_bucket(29000, None) == 224
    assert e._decode_bucket(29000, 32) == 224


def test_fused_decode_engine_path():
    """fused_decode="on" routes batch-1 programs through the all-layers
    Pallas kernel (interpret mode on CPU); results keep engine semantics
    and the program key records the fused variant."""
    settings = APISettings(
        max_decode_tokens=4,
        decode_token_buckets=["4"],
        batch_buckets=["1"],
        warmup_iterations=0,
        whisper_model_default="tiny",
        fused_decode="on",
    )
    eng = WhisperEngine(ModelRegistry(settings), settings)
    res = eng.transcribe(_audio(1.0), model="tiny", beam_size=2, max_tokens=4)
    assert isinstance(res.text, str)
    assert res.audio_duration_ms == 1000
    assert any(k[8] is True for k in eng._programs)  # fused program compiled


def test_int16_audio_accepted_natively(engine):
    """int16 PCM in == float32 PCM out, bit-identically: the device
    program consumes int16, so feeding the integer samples directly
    (FLAC/WAV/s16 WS frames) must produce exactly the tokens the
    float path produces for the same underlying samples."""
    rng = np.random.default_rng(21)
    i16 = (rng.standard_normal(int(1.5 * SAMPLE_RATE)) * 0.05 * 32767).astype(
        np.int16
    )
    f32 = i16.astype(np.float32) / 32768.0
    res_i = engine.transcribe(i16, model="tiny", beam_size=1)
    res_f = engine.transcribe(f32, model="tiny", beam_size=1)
    assert res_i.text == res_f.text
    assert res_i.audio_duration_ms == res_f.audio_duration_ms == 1500


def test_int16_audio_chunked(engine):
    rng = np.random.default_rng(22)
    i16 = (rng.standard_normal(40 * SAMPLE_RATE) * 0.05 * 32767).astype(
        np.int16
    )
    f32 = i16.astype(np.float32) / 32768.0
    res_i = engine.transcribe(i16, model="tiny", beam_size=1)
    res_f = engine.transcribe(f32, model="tiny", beam_size=1)
    assert res_i.text == res_f.text


def test_steady_state_latency(engine):
    """The pipelined serving-latency probe: runs the exact request
    program K times back-to-back and subtracts the live no-op RTT —
    the bench's tunnel-invariant span (bench.py headline rows)."""
    # the probe must reuse the program key transcribe() compiles for the
    # identical request — a divergent key would cost the driver a fresh
    # remote compile per bench row (ADVICE r4: snapshot the cache AFTER
    # transcribe but BEFORE the probe, so the assertion can actually
    # catch a key mismatch, not just probe-vs-probe idempotence)
    engine.transcribe(_audio(1.0), model="tiny", beam_size=1, max_tokens=4)
    keys_before = set(engine._programs)
    ss = engine.steady_state_latency(
        _audio(1.0), model="tiny", beam_size=1, max_tokens=4,
        iters=2, repeats=1,
    )
    assert ss["iters"] == 2
    assert ss["device_ms"] >= 0.0
    assert ss["wall_ms"] > 0.0
    assert set(engine._programs) == keys_before


def test_steady_state_latency_batch(engine):
    ss = engine.steady_state_latency(
        _audio(1.0), model="tiny", beam_size=1, max_tokens=4,
        iters=2, repeats=1, batch=4,
    )
    assert ss["device_ms"] >= 0.0


def test_warmup_compiles_coalesced_bucket():
    """Server boot must pre-compile the dynamic batcher's top coalesced
    bucket — the first load wave otherwise pays its compile while
    clients queue (BENCH.md round-5 loadtest cold-start)."""
    s = APISettings(
        whisper_model_default="tiny",
        max_decode_tokens=4,
        decode_token_buckets=["4"],
        batch_buckets=["1", "2"],
        warmup_iterations=1,
    )
    eng = WhisperEngine(ModelRegistry(s), s)
    eng.warmup()
    batches = {k[2] for k in eng._programs if isinstance(k, tuple) and len(k) > 2}
    assert 2 in batches  # the coalesced top bucket
    assert 1 in batches  # the single-request programs


def test_xa_quant_none_disables_int8_cross_kv():
    s = APISettings(
        whisper_model_default="tiny",
        max_decode_tokens=4,
        decode_token_buckets=["4"],
        batch_buckets=["1"],
        xa_quant="none",
        fused_decode="on",
    )
    eng = WhisperEngine(ModelRegistry(s), s)
    assert not eng._xa_int8()
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(SAMPLE_RATE) * 0.05).astype(np.float32)
    res = eng.transcribe(audio, model="tiny", beam_size=1, max_tokens=2)
    assert res.language
