"""Spark-side pair-scoring engine tests.

Mirrors the reference's integration/functional tier
(/root/reference/tests/integration/test_processar_generico.py,
/root/reference/tests/functional/test_processar.py) plus a row-level
parity sweep: the Spark engine must agree with the pure-Python golden
scorers on every fixture row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from comparador_de_registros_spark.functions.normalize import padroniza, padroniza_col
from comparador_de_registros_spark.functions import scores as S
from comparador_de_registros_spark.operators.compare import (
    build_freq_artifacts,
    score_pairs,
    to_export,
)
from comparador_de_registros_spark.operators import freq as freq_ops
from comparador_de_registros_spark.plans.spec import (
    ComparePair,
    CompareSpec,
    FieldType,
    infer_field_type,
)

ROWS = [
    # (nome_a, nome_b, local_a, local_b, log_a, log_b, data_a, data_b,
    #  txt_a, txt_b, num_a, num_b)
    ("Ana Maria da Silva", "Ana M. Silva", "SP1234", "SP1234",
     "Rua das Flores, nº 123 - Bl A", "R. das Flores 123 bloco A",
     "19900101", "19900102", "ana maria", "ana maria", "10,50", "10.5"),
    ("Carlos Souza", "Carla Souza", "SP1234", "SQ1235",
     "Av Brasil s/n bloco 4", "Avenida Brasil sn bl 4",
     "20200112", "20200121", "unico comum", "comum", "2020", "2021"),
    ("João da Silva Jr.", "Joao Silva", "RJ9999", "RJ9999",
     "Rua A 10", "Rua A 10",
     "20211201", "20212101", "", "qualquer", "", "5"),
    ("", "Maria", "XX12", "XX12",
     "", "", "2020", "2020", "20200101", "20200101", "1.234,56", "1234.56"),
]
COLS = [
    "nome_a", "nome_b", "local_a", "local_b", "log_a", "log_b",
    "data_a", "data_b", "txt_a", "txt_b", "num_a", "num_b",
]

SPEC = CompareSpec(
    pairs=(
        ComparePair("nome_a", "nome_b", FieldType.NAME, "paciente"),
        ComparePair("local_a", "local_b", FieldType.LOCALITY, "local"),
        ComparePair("log_a", "log_b", FieldType.ADDRESS, "endereco"),
        ComparePair("data_a", "data_b", FieldType.DATE, "nascimento"),
        ComparePair("txt_a", "txt_b", FieldType.TEXT, "obs"),
        ComparePair("num_a", "num_b", FieldType.NUMBER, "valor"),
    )
)


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(ROWS, COLS)


@pytest.fixture(scope="module")
def scored(pairs_df):
    return score_pairs(pairs_df, SPEC)


def test_padroniza_col_matches_python(spark):
    samples = [
        "  João da Silva Jr.  ", "ÁÉÍ ÓÚ", "Maria das Dores Bisneto",
        "a filho neto", "", "   ", "José-Carlos d'Ávila", "ß æ straße",
        "O'Neil Mc Donald", "número 42!", "ção çedilha",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["v"])
    got = [r["p"] for r in df.select(padroniza_col("v").alias("p")).collect()]
    assert got == [padroniza(s) for s in samples]


def test_engine_matches_python_scorers_rowwise(scored, pairs_df):
    freq = build_freq_artifacts(pairs_df, SPEC)
    rows = {tuple(r[c] for c in COLS): r for r in scored.collect()}
    for raw in ROWS:
        got = rows[raw]
        d = dict(zip(COLS, raw))
        expected = {}
        n1, n2 = padroniza(d["nome_a"]), padroniza(d["nome_b"])
        for name, s in zip(
            SPEC.pairs[0].criterion_columns(),
            S.score_name(n1, n2, freq.get("paciente")),
        ):
            expected[name] = s
        for name, s in zip(
            SPEC.pairs[1].criterion_columns(),
            S.score_locality(padroniza(d["local_a"]), padroniza(d["local_b"])),
        ):
            expected[name] = s
        for name, s in zip(
            SPEC.pairs[2].criterion_columns(),
            S.score_address(padroniza(d["log_a"]), padroniza(d["log_b"])),
        ):
            expected[name] = s
        for name, s in zip(
            SPEC.pairs[3].criterion_columns(),
            S.score_date(padroniza(d["data_a"]), padroniza(d["data_b"])),
        ):
            expected[name] = s
        for name, s in zip(
            SPEC.pairs[4].criterion_columns(),
            S.score_text(padroniza(d["txt_a"]), padroniza(d["txt_b"]), freq.get("obs")),
        ):
            expected[name] = s
        for name, s in zip(
            SPEC.pairs[5].criterion_columns(),
            S.score_number(d["num_a"], d["num_b"]),
        ):
            expected[name] = s
        for name, val in expected.items():
            assert got[name] == pytest.approx(val, abs=1e-9), (raw[0], name)
        assert got[SPEC.total_column] == pytest.approx(sum(expected.values()), abs=1e-8)


def test_exact_match_outscores_non_match(scored):
    # functional tier semantics (test_processar.py): identical pair wins
    rows = scored.select("nome_a", "nota_final").collect()
    notas = {r["nome_a"]: r["nota_final"] for r in rows}
    assert notas["Ana Maria da Silva"] > notas["Carlos Souza"]


def test_export_formatting_and_sort(scored):
    out = to_export(scored, SPEC)
    rows = out.collect()
    # sorted desc by numeric nota
    raw = [r for r in scored.collect()]
    raw.sort(key=lambda r: r["nota_final"], reverse=True)
    assert [r["nome_a"] for r in rows] == [r["nome_a"] for r in raw]
    # comma-decimal rendering
    assert all("," in r["nota_final"] for r in rows)


def test_flat_token_freq(spark):
    df = spark.createDataFrame(
        [("ana maria", "ana"), ("maria clara", "ana maria")], ["a", "b"]
    )
    freq = freq_ops.collect_flat_map(freq_ops.flat_token_freq(df, "a", "b"))
    assert freq == {"ana": 3, "maria": 3, "clara": 1}


def test_positional_name_freq_single_token_counts_twice(spark):
    df = spark.createDataFrame([("ana", ""), ("ana maria silva", "")], ["a", "b"])
    first, middle, last = freq_ops.collect_positional_maps(
        freq_ops.positional_name_freq(df, "a", "b")
    )
    # single-token "ana" counts as first AND last (freqBuilder.py:21-28)
    assert first == {"ana": 2}
    assert last == {"ana": 1, "silva": 1}
    assert middle == {"maria": 1}


def test_infer_field_type():
    assert infer_field_type("R_NOME_PACIENTE") == FieldType.NAME
    assert infer_field_type("dt_nasc") == FieldType.DATE
    assert infer_field_type("logradouro") == FieldType.ADDRESS
    assert infer_field_type("cod_municipio") == FieldType.LOCALITY
    assert infer_field_type("observacao") == FieldType.TEXT


def test_normalize_tipo_code_reference_parity():
    """Conflict-resolution rules ported verbatim from gui.py:401-424:
    E alias, L-vs-C/M disambiguation, C fallbacks, T->M promotion."""
    from comparador_de_registros_spark.plans.spec import (
        guess_tipo_code,
        normalize_tipo_code,
    )

    # guess table priority (gui.py:336-347)
    assert guess_tipo_code("logradouro_residencia") == "L"
    assert guess_tipo_code("cod_municipio") == "C"
    assert guess_tipo_code("dt_nasc") == "D"
    assert guess_tipo_code("qtd_filhos") == "M"
    assert guess_tipo_code("observacao") == "T"
    # bare E always means L
    assert normalize_tipo_code("E", "whatever") == "L"
    # declared L on a locality-looking column -> C; numeric-looking -> M
    assert normalize_tipo_code("L", "cod_ibge") == "C"
    assert normalize_tipo_code("L", "valor_total") == "M"
    assert normalize_tipo_code("L", "rua_casa") == "L"
    # declared C keeps C/L guesses, promotes M, else falls back to T
    assert normalize_tipo_code("C", "cod_municipio") == "C"
    assert normalize_tipo_code("C", "endereco") == "L"
    assert normalize_tipo_code("C", "idade") == "M"
    assert normalize_tipo_code("C", "observacao") == "T"
    # declared T on a numeric-looking column is promoted to M
    assert normalize_tipo_code("T", "num_prontuario") == "M"
    assert normalize_tipo_code("T", "observacao") == "T"
    # M and other codes pass through; empty stays empty
    assert normalize_tipo_code("M", "observacao") == "M"
    assert normalize_tipo_code("N", "qtd_filhos") == "N"
    assert normalize_tipo_code("", "qtd_filhos") == ""
    # FieldType integration
    assert FieldType.parse_with_context("L", "cod_ibge") == FieldType.LOCALITY
    assert FieldType.parse_with_context("T", "valor_total") == FieldType.NUMBER


def test_join_freq_strategy_matches_broadcast(spark):
    """The join-based frequency path (no driver collect — the 10^12-turn
    scale alternative to broadcast dicts) must score identically to the
    broadcast path on every fixture row, including the single-token
    first-AND-last lookup quirk and tokens missing from a positional
    map."""
    df = spark.createDataFrame(ROWS, COLS)
    cols = SPEC.criterion_columns() + [SPEC.total_column]
    b = {
        tuple(r[c] for c in COLS): [r[c] for c in cols]
        for r in score_pairs(df, SPEC).collect()
    }
    j = {
        tuple(r[c] for c in COLS): [r[c] for c in cols]
        for r in score_pairs(df, SPEC, freq_strategy="join").collect()
    }
    assert b.keys() == j.keys()
    for k in b:
        assert b[k] == pytest.approx(j[k], abs=1e-12), (k, b[k], j[k])


def test_join_freq_path_is_partition_order_agnostic(spark):
    """The join-back key is a content hash of the compared columns, so
    the frequency maps attach to the right rows regardless of source
    partitioning / row order (a monotonically_increasing_id key would
    silently diverge between the lookups branch and the main branch on
    such sources)."""
    import random

    base = spark.createDataFrame(ROWS, COLS)
    cols = SPEC.criterion_columns() + [SPEC.total_column]
    want = {
        tuple(r[c] for c in COLS): [r[c] for c in cols]
        for r in score_pairs(base, SPEC, freq_strategy="join").collect()
    }
    shuffled_rows = list(ROWS)
    random.Random(3).shuffle(shuffled_rows)
    # round-robin repartition makes row->partition assignment depend on
    # input order; a different order per branch recomputation is the
    # failure mode the content-hash key closes
    scrambled = spark.createDataFrame(shuffled_rows, COLS).repartition(7)
    got = {
        tuple(r[c] for c in COLS): [r[c] for c in cols]
        for r in score_pairs(scrambled, SPEC, freq_strategy="join").collect()
    }
    assert want.keys() == got.keys()
    for k in want:
        assert want[k] == pytest.approx(got[k], abs=1e-12), k
