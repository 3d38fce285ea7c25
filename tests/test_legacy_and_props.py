"""Legacy processar-equivalent tests (mirroring the reference's
functional tier) + hypothesis property tests for the normalization and
fuzzy layers."""

from __future__ import annotations

import glob
import os

import pytest
from hypothesis import given, settings, strategies as st

from comparador_de_registros_spark.functions.fuzzy import (
    _lcs_len_dp,
    indel_ratio,
    levenshtein,
)
from comparador_de_registros_spark.functions.normalize import padroniza, padroniza_col
from comparador_de_registros_spark.functions.phonetic import soundex
from comparador_de_registros_spark.operators.legacy import (
    FREQ_TABLES,
    legacy_spec,
    processar,
    write_export_csv,
)
from comparador_de_registros_spark.sources.catalog import ParquetCatalog

ROWS = [
    # exact-ish match row vs clear non-match (functional test_processar)
    ("Ana Silva", "Maria Silva", "19900101", "Ana Silva", "Maria Silva", "19900101"),
    ("Carlos Souza", "Patricia Souza", "19851231", "Joana Lima", "", "19700505"),
]
COLS = ["nome1", "mae1", "nasc1", "nome2", "mae2", "nasc2"]


@pytest.fixture(scope="module")
def legacy_result(spark, tmp_path_factory):
    catalog = ParquetCatalog(str(tmp_path_factory.mktemp("legacy")))
    df = spark.createDataFrame(ROWS, COLS)
    scored = processar(
        spark, df, catalog,
        name_cols=("nome1", "nome2"),
        mother_cols=("mae1", "mae2"),
        birth_cols=("nasc1", "nasc2"),
    )
    return catalog, scored


def test_exact_match_outscores(spark, legacy_result):
    _, scored = legacy_result
    rows = scored.collect()
    notas = {r["nome1"]: r["nota_final"] for r in rows}
    assert notas["Ana Silva"] > notas["Carlos Souza"]
    # sorted desc
    assert rows[0]["nome1"] == "Ana Silva"


def test_freq_cache_created_and_reused(spark, legacy_result):
    catalog, _ = legacy_result
    for t in FREQ_TABLES:
        assert catalog.exists(t), t


def test_empty_guard_zeroes_mother_block(spark, legacy_result):
    _, scored = legacy_result
    row = {r["nome1"]: r for r in scored.collect()}["Carlos Souza"]
    # mae2 empty -> the whole mother block is zero (legacy guard)
    for c in legacy_spec(("a", "b"), ("c", "d"), ("e", "f")).pairs[1].criterion_columns():
        assert row[c] == 0.0


def test_export_csv_sink(spark, legacy_result, tmp_path):
    _, scored = legacy_result
    spec = legacy_spec(("nome1", "nome2"), ("mae1", "mae2"), ("nasc1", "nasc2"))
    out = str(tmp_path / "export")
    write_export_csv(scored, spec, out, sep=";")
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    content = open(files[0]).read()
    assert ";" in content and "nota_final" in content.splitlines()[0]
    # pt-BR comma decimals in the data rows
    assert any("," in line.split(";")[-1] for line in content.splitlines()[1:])


# --- property tests (pure python; hypothesis) ------------------------------

TEXT_ALPHABET = st.characters(
    codec="utf-8", categories=("L", "N", "P", "Z"), max_codepoint=0x2FF
)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=TEXT_ALPHABET, max_size=60))
def test_padroniza_idempotent_and_clean(s):
    p = padroniza(s)
    assert padroniza(p) == p  # idempotent
    assert p == p.strip()
    for ch in p:
        assert ch.islower() or ch.isdigit() or ch == " "


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30), st.text(max_size=30))
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=25), st.text(max_size=25))
def test_indel_ratio_bounds_and_symmetry(a, b):
    r = indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == indel_ratio(b, a)
    if a == b:
        assert r == 100.0


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=20), st.text(max_size=20))
def test_lcs_consistent_with_indel(a, b):
    lcs = _lcs_len_dp(a, b)
    assert lcs <= min(len(a), len(b))
    # indel distance identity: d = |a|+|b|-2*lcs >= levenshtein-ish bound
    assert len(a) + len(b) - 2 * lcs >= levenshtein(a, b)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F), max_size=20))
def test_soundex_shape(s):
    import unicodedata

    code = soundex(s)
    assert code == soundex(s)  # deterministic (cached path included)
    if not s:
        assert code == "0000"
    else:
        assert len(code) == 4
        assert code[0] == unicodedata.normalize("NFKD", s).upper()[0]
        assert all(c in "0123456" for c in code[1:])


def test_padroniza_col_property_parity(spark):
    """Randomized Spark-vs-Python padroniza parity over a generated
    corpus (the fixed-sample test lives in test_compare_engine)."""
    import random

    rng = random.Random(42)
    pieces = [
        "joão", "da", "séra", "Jr.", "nº", "MARIA-JOSÉ", "d'ávila", "ção",
        "123", "filho", "neto", "  ", "ß", "œuf", "ÀÉÎÕÜ", "x", "",
    ]
    samples = [
        " ".join(rng.choices(pieces, k=rng.randint(0, 8))) for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["v"])
    got = [r["p"] for r in df.select(padroniza_col("v").alias("p")).collect()]
    assert got == [padroniza(s) for s in samples]


def test_spec_from_openreclink_header():
    from comparador_de_registros_spark.plans.spec import (
        FieldType,
        spec_from_openreclink_header,
    )

    cols = [
        "id", "R_NOME", "C_NOME", "R_DT_NASC", "C_DT_NASC",
        "R_LOGRADOURO", "C_LOGRADOURO", "R_SOLO",  # unpaired -> dropped
    ]
    spec = spec_from_openreclink_header(cols)
    assert [(p.left, p.right, p.field_type, p.name) for p in spec.pairs] == [
        ("R_NOME", "C_NOME", FieldType.NAME, "nome"),
        ("R_DT_NASC", "C_DT_NASC", FieldType.DATE, "dt_nasc"),
        ("R_LOGRADOURO", "C_LOGRADOURO", FieldType.ADDRESS, "logradouro"),
    ]
    spec2 = spec_from_openreclink_header(
        cols, type_overrides={"nome": FieldType.TEXT}
    )
    assert spec2.pairs[0].field_type == FieldType.TEXT
