"""XTTS text preprocessing (models/xtts/textnorm.py).

The reference's TTS stack runs Coqui's cleaner pipeline before BPE
(quotes, lowercase, number/abbreviation/symbol expansion, whitespace);
these tests pin the from-scratch re-implementation's contract for the
covered languages and the graceful pass-through for the rest.
"""

import pytest

from wis_tpu.models.xtts.textnorm import (
    num_de,
    num_en,
    num_es,
    num_fr,
    ord_en,
    preprocess_text,
)


@pytest.mark.parametrize(
    "n,words",
    [
        (0, "zero"),
        (7, "seven"),
        (15, "fifteen"),
        (42, "forty-two"),
        (100, "one hundred"),
        (101, "one hundred one"),
        (999, "nine hundred ninety-nine"),
        (1000, "one thousand"),
        (2026, "two thousand twenty-six"),
        (1_000_000, "one million"),
        (1_234_567, "one million two hundred thirty-four thousand five hundred sixty-seven"),
        (-5, "minus five"),
    ],
)
def test_num_en(n, words):
    assert num_en(n) == words


@pytest.mark.parametrize(
    "n,words",
    [(1, "first"), (2, "second"), (3, "third"), (5, "fifth"),
     (9, "ninth"), (12, "twelfth"), (20, "twentieth"),
     (21, "twenty-first"), (100, "one hundredth"), (13, "thirteenth")],
)
def test_ord_en(n, words):
    assert ord_en(n) == words


@pytest.mark.parametrize(
    "n,words",
    [(16, "dieciséis"), (21, "veintiuno"), (31, "treinta y uno"),
     (100, "cien"), (101, "ciento uno"), (500, "quinientos"),
     (1000, "mil"), (2001, "dos mil uno"), (1_000_000, "un millón")],
)
def test_num_es(n, words):
    assert num_es(n) == words


@pytest.mark.parametrize(
    "n,words",
    [(17, "dix-sept"), (21, "vingt et un"), (71, "soixante et onze"),
     (75, "soixante-quinze"), (80, "quatre-vingts"),
     (81, "quatre-vingt-un"), (91, "quatre-vingt-onze"),
     (100, "cent"), (200, "deux cents"), (201, "deux cent un"),
     (1000, "mille"), (1_000_000, "un million")],
)
def test_num_fr(n, words):
    assert num_fr(n) == words


@pytest.mark.parametrize(
    "n,words",
    [(1, "eins"), (16, "sechzehn"), (21, "einundzwanzig"),
     (30, "dreißig"), (101, "einhunderteins"),
     (1000, "eintausend"), (2024, "zweitausendvierundzwanzig")],
)
def test_num_de(n, words):
    assert num_de(n) == words


def test_preprocess_english_sentence():
    out = preprocess_text(
        'Dr. Smith paid $1.50 on the 3rd of May, 2024 & left a 25% tip.',
        "en",
    )
    assert out == (
        "doctor smith paid one dollar and fifty cents on the third of "
        "may, two thousand twenty-four and left a twenty-five percent tip."
    )


def test_preprocess_decimal_and_cents_only():
    assert preprocess_text("Pi is 3.14", "en") == "pi is three point one four"
    assert preprocess_text("$0.50", "en") == "fifty cents"


def test_preprocess_comma_grouped_number():
    assert preprocess_text("1,234 items", "en") == (
        "one thousand two hundred thirty-four items"
    )


def test_preprocess_french():
    assert preprocess_text("J'ai 80 ans.", "fr") == "j'ai quatre-vingts ans."
    assert preprocess_text("100 % vrai", "fr") == "cent pour cent vrai"


def test_preprocess_uncovered_language_passthrough():
    # digits stay; language-independent steps still apply
    assert preprocess_text('"白日依山尽" 123', "zh-cn") == "白日依山尽 123"


def test_preprocess_turkish_dotted_i():
    assert preprocess_text("İstanbul", "tr").startswith("istanbul")


def test_quotes_and_whitespace():
    assert preprocess_text('  "hello"   world  ', "en") == "hello world"
