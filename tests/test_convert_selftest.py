"""Converter selftest harness (wis_tpu/utils/selftest.py; VERDICT r4 #5).

CI keeps this fast by exercising the harness at the SMALLEST real size
(tiny — still the true transformers key layout and true dims for that
checkpoint). The full-dims runs (`wisctl convert-model --selftest
large-v2 | xtts`) are the operator/driver verb; their round-5 results
are recorded in BENCH.md.
"""

import numpy as np

from wis_tpu.utils.selftest import whisper_selftest


def test_whisper_tiny_selftest_full_dims():
    report = whisper_selftest("tiny", forward=True)
    assert report["model"] == "tiny"
    # true tiny architecture: 4+4 layers, 384 d_model ≈ 37.8 M params
    assert 35_000_000 < report["params"] < 40_000_000
    assert report["encoder_out"] == (1, 1500, 384)


def test_synthetic_hf_layout_matches_converter_contract():
    """The synthetic checkpoint must carry every key params_from_hf
    reads — a drift in transformers' serialization shows up here."""
    from wis_tpu.models.whisper.config import WHISPER_CONFIGS
    from wis_tpu.utils.selftest import synthetic_hf_whisper

    sd = synthetic_hf_whisper(WHISPER_CONFIGS["tiny"])
    assert "model.encoder.conv1.weight" in sd
    assert "model.decoder.embed_tokens.weight" in sd
    assert sd["model.decoder.embed_tokens.weight"].shape == (51865, 384)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
