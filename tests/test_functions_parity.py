"""Golden parity tests for the scalar layer.

Every assertion here mirrors an inline golden from the reference's own
test suite (/root/reference/tests/unit/*) so the match/non-match
semantics are pinned bit-for-bit (FIXTURES.md §4). Pure Python — no
SparkSession — so they run in milliseconds.
"""

from __future__ import annotations

import pytest

from comparador_de_registros_spark.functions.fuzzy import (
    jaccard_ratio,
    levenshtein,
    token_set_ratio,
)
from comparador_de_registros_spark.functions.normalize import (
    minusculo_sem_acento,
    padroniza,
)
from comparador_de_registros_spark.functions.phonetic import soundex
from comparador_de_registros_spark.functions.address import parse_address, tokenize_address
from comparador_de_registros_spark.functions.scores import (
    score_address,
    score_date,
    score_locality,
    score_name,
    score_number,
    score_text,
)


# --- util goldens (tests/unit/test_util.py) -------------------------------

def test_minusculo_sem_acento():
    assert minusculo_sem_acento(" ÁÉÍ ÓÚ ") == "aei ou"


def test_padroniza_stopwords_and_suffix():
    assert padroniza("  João da Silva Jr.  ") == "joao silva"


def test_padroniza_blank():
    assert padroniza("   ") == ""


def test_padroniza_single_suffix_removal():
    # only ONE suffix stripped (util.py:60-63 breaks after first hit)
    assert padroniza("a filho neto") == "a filho"
    assert padroniza("maria das dores bisneto") == "maria dores"


def test_soundex_goldens():
    assert soundex("bruno") == "B650"
    assert soundex("") == "0000"
    # digit-leading strings: first char through, nothing coded after
    assert soundex("19900101") == "1000"


# --- nomes goldens (tests/unit/test_comparators_nomes.py) -----------------

NOME_MAPS = (
    {"ana": 1, "joao": 2000},
    {"m": 2, "maria": 3},
    {"silva": 1001, "souza": 10},
)


def test_name_with_freq_maps_and_abbreviations():
    s = score_name("ana m silva", "ana maria silva", NOME_MAPS)
    assert s[0] == 1.0
    assert s[1] == 1.0
    assert s[2] == pytest.approx(2 / 3)
    assert s[3] == pytest.approx(2 / 3)
    assert s[4] == pytest.approx(-1 / 3)
    assert s[5] != 0.0
    assert s[6] == pytest.approx(1 / 3 * 0.5)
    assert sum(s) > 3


def test_name_without_abbreviation_bonus():
    s = score_name(
        "ana m silva", "ana maria silva",
        ({"ana": 1}, {"maria": 1}, {"silva": 1}),
        include_abbreviations=False,
    )
    assert s[6] == 0.0


def test_name_without_freq_maps():
    s = score_name("ana", "ana", None)
    assert s[0] == 1.0
    assert s[3] == 0.0 and s[4] == 0.0


def test_name_blank_is_all_zero():
    assert score_name("", "ana", None) == (0.0,) * 7


def test_name_common_penalty():
    s = score_name(
        "ana maria silva", "ana maria silva",
        ({"ana": 5000}, {"maria": 4000}, {"silva": 8000}),
    )
    assert s[4] < 0


# --- texto goldens (tests/unit/test_comparators_texto.py) -----------------

def test_text_identical_with_freq_bias():
    s = score_text("ana maria", "ana maria", {"ana": 4, "maria": 3})
    assert s[0] == 1.0 and s[1] == 1.0
    assert s[2] == pytest.approx(1.0)
    assert s[3] == pytest.approx(1.0)
    assert s[4] == pytest.approx(0.0)
    assert s[5] == pytest.approx(0.8)
    assert s[6] == 0.0
    assert sum(s) == pytest.approx(4.8, rel=1e-3)


def test_text_date_like_skips_freq():
    s = score_text("20200101", "20200101", {})
    assert s[3] == 0.0 and s[4] == 0.0
    assert sum(s) >= 3


def test_text_empty():
    assert score_text("", "qualquer", {}) == (0.0,) * 7


def test_text_rare_and_common_balance():
    s = score_text("unico comum", "comum", {"unico": 1, "comum": 5000})
    assert s[3] > 0 and s[4] < 0


# --- data goldens (tests/unit/test_comparators_data.py) -------------------

@pytest.mark.parametrize(
    "d1,d2,hot",
    [
        ("20200101", "20200101", 0),
        ("20200101", "20200102", 1),
        ("20200112", "20200121", 2),  # reversed day
        ("20211201", "20212101", 3),  # reversed month
        ("20200101", "20020101", 4),  # year anagram
    ],
)
def test_date_criteria_one_hot(d1, d2, hot):
    s = score_date(d1, d2)
    assert s[hot] == 1.0
    assert sum(s) == 1.0


# --- localidade goldens (tests/unit/test_comparators_localidade.py) -------

def test_locality_equal():
    assert score_locality("SP1234", "SP1234") == (1.0, 0.0, 1.0, 0.0)


def test_locality_similar():
    s = score_locality("SP1234", "SQ1235")
    assert s[1] == 0.5 and s[3] == 0.8
    assert sum(s) == pytest.approx(1.3)


def test_locality_bad_length():
    assert score_locality("SP123", "SP1234") == (0.0,) * 4


def test_locality_distance_two():
    s = score_locality("SP1234", "SP1256")
    assert s[0] == 1.0 and s[3] == 0.5
    assert sum(s) == pytest.approx(1.5)


def test_locality_soundex_non_numeric():
    s = score_locality("SPAXQX", "SPAZXZ")
    assert s[0] == 1.0 and s[3] == 0.4
    assert sum(s) > 1.3


# --- logradouro goldens (tests/unit/test_comparators_logradouro*.py) ------

def test_address_tokenize_and_parse():
    tokens = tokenize_address("Rua dos Andradas, nº 123 - Bl A")
    assert tokens[:2] == ["rua", "andradas"]
    assert "123" in tokens and "bloco" in tokens

    parsed = parse_address("Rua dos Andradas, nº 123 - Bl A")
    assert parsed.via == "rua andradas"
    assert parsed.numero == "123"
    assert parsed.complemento_tokens[-1] == "a"
    assert "123" in parsed.all_tokens


def test_address_sem_numero_and_multi_numbers():
    parsed = parse_address("Av Brasil s/n bloco 4 apto 501")
    assert parsed.numero == "sn"
    assert "4" in parsed.complemento_tokens
    assert "501" in parsed.complemento_tokens
    assert "semnumero" not in parsed.via_tokens


def test_address_single_letter_after_marker():
    parsed = parse_address("Rua Alpha bloco B casa C")
    assert "b" in parsed.complemento_tokens
    assert "c" in parsed.complemento_tokens


def test_address_equivalents_and_stopwords():
    tokens = tokenize_address("Rua de Teste n 123 ap 4")
    assert "numero" in tokens and "apto" in tokens and "de" not in tokens


def test_address_exact_match_scores():
    s = score_address("Rua das Flores 123 Bloco A", "Rua das Flores 123 Bloco A")
    assert s[0] == 1.0
    assert s[1] == pytest.approx(0.8)
    assert s[2] == 1.0
    assert s[5] == pytest.approx(0.5)
    assert sum(s) > 3


def test_address_sem_numero_partial():
    s = score_address("Rua das Flores SN", "Rua das Flores s/n")
    assert s[2] == 1.0  # both parse to numero == "sn"... see note below
    assert sum(s) > 1


def test_similarity_helpers():
    t = ["rua", "andradas", "123"]
    assert token_set_ratio(t, t) == 1.0
    assert jaccard_ratio(t, t) == 1.0
    assert token_set_ratio(t, t[:2]) < 1.0
    assert jaccard_ratio(t, t[:2]) < 1.0


# --- numeros goldens (tests/unit/test_comparators_numeros.py) -------------

def test_number_exact():
    s = score_number("2020", "2020")
    assert s[0] == 1.0
    assert sum(s) >= 3.5


def test_number_integer_proximity():
    s = score_number("2020", "2021")
    assert s[1] > 0
    assert s[3] == 1.0
    assert sum(s) > 1.0


def test_number_locale_floats():
    s = score_number("10,50", "10.5")
    assert s[0] == 1.0
    assert s[2] == 1.0
    assert sum(s) >= 3.5


def test_levenshtein_basic():
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("", "ab") == 2
    assert levenshtein("kitten", "sitting") == 3
