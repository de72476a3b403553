"""Settings + language registry tests (reference settings.py, wis/languages.py)."""

import numpy as np

from wis_tpu.languages import LANGUAGES, check_language, to_language_code
from wis_tpu.settings import APISettings, _coerce, _settings_from_env


def test_language_registry_complete():
    assert len(LANGUAGES) == 99
    assert LANGUAGES["en"] == "english"
    assert check_language("en") and check_language("english")
    assert check_language("haitian creole")
    assert not check_language("xx") and not check_language("")
    assert to_language_code("CASTILIAN") == "es"
    assert to_language_code("zh") == "zh"


def test_settings_defaults():
    s = APISettings()
    assert s.beam_size == 1
    assert s.long_beam_size == 3
    assert s.long_beam_size_threshold == 12000
    assert s.whisper_model_default == "medium"
    assert s.sv_threshold == 0.75
    # capped at 4 by default: batch-8 measured latency-negative on v5e
    # (BENCH.md round 5); throughput deployments re-add "8" via env
    assert s.batch_bucket_list() == [1, 2, 4]


def test_settings_env_override(monkeypatch):
    monkeypatch.setenv("BEAM_SIZE", "5")
    monkeypatch.setenv("SUPPORT_CHUNKING", "false")
    monkeypatch.setenv("WHISPER_MODEL_DEFAULT", "large")
    s = _settings_from_env()
    assert s.beam_size == 5
    assert s.support_chunking is False
    assert s.whisper_model_default == "large"


def test_coerce_types():
    assert _coerce("true", bool) is True
    assert _coerce("0", bool) is False
    assert _coerce("42", int) == 42
    assert _coerce("a, b", list) == ["a", "b"]
    assert _coerce('["x","y"]', list) == ["x", "y"]
