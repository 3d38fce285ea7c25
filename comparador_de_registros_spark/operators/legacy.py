"""Legacy fixed-layout entry point — the Spark analogue of ``processar``.

The reference's original path (/root/reference/src/comparaRegistros.py:
85-160) takes a paired CSV with a fixed 6-column layout (patient name,
mother name, birth date — for records A and B), builds/loads six cached
positional frequency tables (patient/mother x first/middle/last,
freqBuilder.py:42-97), and scores each row with empty-field guards
(names both non-empty, dates both length 8).

Differences from the generic engine (SURVEY.md §3.2, normative):
* empty guards ARE applied (processar_generico has none);
* the frequency maps come from a persistent cache keyed by the input,
  rebuilt only when missing — here a catalog checkpoint table per
  (person, part), mirroring the reference's six CSV files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from comparador_de_registros_spark.operators import freq as freq_ops
from comparador_de_registros_spark.operators.compare import score_pairs, to_export
from comparador_de_registros_spark.plans.spec import (
    ComparePair,
    CompareSpec,
    FieldType,
)
from comparador_de_registros_spark.sources.catalog import Catalog

FREQ_TABLES = ("freq_paciente", "freq_mae")  # positional 3-maps each


def build_or_load_freq(
    spark: SparkSession,
    catalog: Catalog,
    pairs_df: DataFrame,
    name_cols: tuple[str, str],
    mother_cols: tuple[str, str],
) -> dict[str, list[dict[str, int]]]:
    """The ``build_if_missing`` analogue: positional frequency tables
    for (patient, mother), persisted as catalog checkpoints and reused
    when all exist (freqBuilder.py:57-64 semantics)."""
    cols_by_table = {"freq_paciente": name_cols, "freq_mae": mother_cols}
    if not all(catalog.exists(t) for t in FREQ_TABLES):
        for table, (left, right) in cols_by_table.items():
            freq_ops.write_freq_checkpoint(
                freq_ops.positional_name_freq(pairs_df, left, right),
                catalog.path(table) if hasattr(catalog, "path") else table,
            )
    return {
        table: freq_ops.collect_positional_maps(
            freq_ops.read_freq_checkpoint(
                spark, catalog.path(table) if hasattr(catalog, "path") else table
            )
        )
        for table in FREQ_TABLES
    }


def legacy_spec(
    name_cols: tuple[str, str],
    mother_cols: tuple[str, str],
    birth_cols: tuple[str, str],
) -> CompareSpec:
    return CompareSpec(
        pairs=(
            ComparePair(name_cols[0], name_cols[1], FieldType.NAME, "paciente"),
            ComparePair(mother_cols[0], mother_cols[1], FieldType.NAME, "mae"),
            ComparePair(birth_cols[0], birth_cols[1], FieldType.DATE, "nascimento"),
        ),
        legacy_empty_guards=True,
    )


def processar(
    spark: SparkSession,
    pairs_df: DataFrame,
    catalog: Catalog,
    name_cols: tuple[str, str],
    mother_cols: tuple[str, str],
    birth_cols: tuple[str, str],
    sort: bool = True,
) -> DataFrame:
    """Score the fixed patient/mother/birth-date layout with cached
    frequency tables and legacy guards; result sorted by nota_final
    desc (numerically — documented deviation from the reference's
    lexicographic string sort, SURVEY.md §2.6)."""
    spec = legacy_spec(name_cols, mother_cols, birth_cols)
    freq = build_or_load_freq(spark, catalog, pairs_df, name_cols, mother_cols)
    artifacts = {"paciente": freq["freq_paciente"], "mae": freq["freq_mae"]}
    scored = score_pairs(pairs_df, spec, artifacts)
    if sort:
        scored = scored.orderBy(scored[spec.total_column].desc())
    return scored


def write_export_csv(
    scored: DataFrame, spec: CompareSpec, path: str, sep: str = ";"
) -> None:
    """CSV sink with the reference's rendering: pt-BR comma decimals,
    caller-chosen separator, header (comparaRegistros.py:160,335)."""
    out = to_export(scored, spec)
    out.write.mode("overwrite").option("header", True).option("sep", sep).csv(path)
