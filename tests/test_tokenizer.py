"""Whisper tokenizer tests: special-token layout, prompt building, BPE
decode/encode with a synthetic vocabulary, HF-file loading."""

import json

import pytest

from wis_tpu.models.whisper.tokenizer import (
    EOT,
    LANG_TOKEN,
    N_VOCAB,
    NO_TIMESTAMPS,
    SOT,
    TIMESTAMP_BASE,
    TRANSCRIBE,
    TRANSLATE,
    WhisperTokenizer,
    build_prompt,
)


def test_special_token_layout():
    """Public multilingual-v2 vocabulary constants."""
    assert EOT == 50257 and SOT == 50258
    assert LANG_TOKEN["en"] == 50259
    assert LANG_TOKEN["zh"] == 50260  # registry order defines ids
    assert TRANSLATE == 50358 and TRANSCRIBE == 50359
    assert NO_TIMESTAMPS == 50363 and TIMESTAMP_BASE == 50364
    assert N_VOCAB == 51865
    # 99 languages exactly fill [50259, 50358)
    assert len(LANG_TOKEN) == 99
    assert max(LANG_TOKEN.values()) == 50357


def test_build_prompt():
    assert build_prompt("en", "transcribe") == [SOT, 50259, TRANSCRIBE, NO_TIMESTAMPS]
    assert build_prompt("de", "translate") == [
        SOT, LANG_TOKEN["de"], TRANSLATE, NO_TIMESTAMPS,
    ]
    assert build_prompt("en", "transcribe", notimestamps=False) == [
        SOT, 50259, TRANSCRIBE,
    ]
    # unknown language falls back to en
    assert build_prompt("zz")[1] == LANG_TOKEN["en"]


def test_placeholder_decode_skips_specials():
    tok = WhisperTokenizer()
    text = tok.decode([SOT, 100, 200, EOT])
    assert "<|" not in text and text
    with_special = tok.decode([SOT, 100, EOT], skip_special=False)
    assert "<|startoftranscript|>" in with_special
    assert "<|endoftext|>" in with_special


def test_all_special_ids_cover_timestamps():
    tok = WhisperTokenizer()
    ids = tok.all_special_ids
    assert EOT in ids and SOT in ids and TIMESTAMP_BASE in ids
    assert 50256 not in ids  # base vocab is not special


def test_bpe_with_synthetic_vocab(tmp_path):
    """vocab.json + merges.txt loading and byte-level BPE round-trip."""
    # GPT-2 byte-level: "hi" -> tokens "h","i" merge to "hi"
    vocab = {"h": 0, "i": 1, "hi": 2, "Ġ": 3, "Ġhi": 4}
    merges = ["h i", "Ġ hi"]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges))
    tok = WhisperTokenizer.from_dir(str(tmp_path))
    assert tok.vocab is not None
    ids = tok.encode("hi hi")
    assert ids == [2, 4]  # "hi", " hi"
    assert tok.decode(ids) == "hi hi"


def test_generation_config_overrides_suppress(tmp_path):
    (tmp_path / "generation_config.json").write_text(
        json.dumps({"suppress_tokens": [1, 2, 3], "begin_suppress_tokens": [220]})
    )
    tok = WhisperTokenizer.from_dir(str(tmp_path))
    assert tok.suppress_tokens == (1, 2, 3)
    assert tok.begin_suppress_tokens == (220,)


def test_timestamp_rendering():
    tok = WhisperTokenizer()
    text = tok.decode([TIMESTAMP_BASE, TIMESTAMP_BASE + 100], skip_special=False)
    assert "<|0.00|>" in text and "<|2.00|>" in text
