"""Reference bug-fix parity (SURVEY.md 'known reference quirks').

The reference has several latent crashes the TPU build intentionally
fixes rather than replicates; these tests pin the fixed behavior.
"""

import numpy as np
import pytest

from wis_tpu.audio.mel import SAMPLE_RATE
from wis_tpu.runtime.engine import WhisperEngine
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.settings import APISettings


@pytest.fixture(scope="module")
def engine():
    s = APISettings(
        max_decode_tokens=4,
        batch_buckets=["1", "2", "4"],
        whisper_model_default="tiny",
    )
    return WhisperEngine(ModelRegistry(s), s)


def _audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(seconds * SAMPLE_RATE)) * 0.05).astype(
        np.float32
    )


def test_unknown_model_is_keyerror_not_unbound(engine):
    """reference main.py:564-573: unknown model string crashes with
    UnboundLocalError; here it's a typed error the API maps to 400."""
    with pytest.raises(KeyError):
        engine.transcribe(_audio(0.5), model="enormous")


def test_translate_works_with_chunking(engine):
    """reference main.py:729: `len(total_chunk_count)` on an int raises
    whenever translate=True with chunked audio; here translate runs a
    fused second pass over every window and LCS-merges."""
    res = engine.transcribe(
        _audio(35.0, seed=1), model="tiny", beam_size=1, translate=True
    )
    assert res.translation is not None
    assert res.audio_duration_ms == 35_000


def test_long_mode_overrides_requested_beam(engine):
    """reference main.py:582-586: ≥12 s silently overrides the requested
    beam with long_beam_size — documented and preserved."""
    engine.transcribe(_audio(12.5, seed=2), model="tiny", beam_size=1)
    # program cache key: (model, beam, ...) — long beam was used
    assert any(
        k[1] == engine.settings.long_beam_size for k in engine._programs
    )


def test_language_name_and_code_both_accepted():
    """check_language accepts names and codes (reference main.py:550-551
    only accepts codes; the registry aliases are a superset)."""
    from wis_tpu.languages import check_language, to_language_code

    assert check_language("de") and check_language("german")
    assert to_language_code("GERMAN") == "de"
    with pytest.raises(ValueError):
        to_language_code("klingon")
