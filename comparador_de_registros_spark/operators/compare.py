"""Pair scoring engine: lower a :class:`CompareSpec` onto a DataFrame.

Input: a *pairs* DataFrame (one row per candidate record pair — in the
reference this table IS the input CSV, comparaRegistros.py:205-335; in
the dedup pipeline it is produced by the LSH candidate join).

Physical strategy per field type (SURVEY.md §2.8, §2.11):

* normalization (``padroniza``) — native Column expressions, JVM-side;
* ``D`` dates and ``C`` locality — fully native (levenshtein, reverse,
  sort_array, when-chains); the only Python is a batched soundex column
  for the C fallback branches;
* ``N``/``T``/``L``/``M`` — one Arrow-batched pandas UDF per pair,
  returning a struct of criterion doubles; frequency dicts ride in as
  Spark broadcast variables. No row-at-a-time Python UDFs anywhere.

Scores stay doubles internally; pt-BR comma rendering only at the
export edge (:func:`to_export`).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from comparador_de_registros_spark.functions.normalize import padroniza_col
from comparador_de_registros_spark.functions.phonetic import soundex
from comparador_de_registros_spark.functions import scores as S
from comparador_de_registros_spark.operators import freq as freq_ops
from comparador_de_registros_spark.plans.spec import (
    CRITERIA,
    ComparePair,
    CompareSpec,
    FieldType,
)

def _zero() -> Column:
    return F.lit(0.0)


def _struct_type(n: int, names: Sequence[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.DoubleType()) for c in names[:n]])


# --- native D (dates) ------------------------------------------------------

def _sorted_chars(col: Column) -> Column:
    return F.concat_ws(
        "", F.sort_array(F.filter(F.split(col, ""), lambda c: c != F.lit("")))
    )


def date_criteria_cols(v1: Column, v2: Column) -> list[Column]:
    """Native tipo D: 5 criteria, elif-exclusive 2-edit transpositions
    (data.py:17-42 semantics, on already-padronized strings)."""
    dist = F.levenshtein(v1, v2)
    y1, m1, d1 = F.substring(v1, 1, 4), F.substring(v1, 5, 2), F.substring(v1, 7, 2)
    y2, m2, d2 = F.substring(v2, 1, 4), F.substring(v2, 5, 2), F.substring(v2, 7, 2)

    two_edit = (dist == 2) & (F.length(v1) == 8) & (F.length(v2) == 8)
    day_rev = F.reverse(d1) == d2
    month_rev = F.reverse(m1) == m2
    year_ana = (F.levenshtein(y1, y2) == 2) & (_sorted_chars(y1) == _sorted_chars(y2))

    return [
        F.when(v1 == v2, 1.0).otherwise(_zero()),
        F.when(dist == 1, 1.0).otherwise(_zero()),
        F.when(two_edit & day_rev, 1.0).otherwise(_zero()),
        F.when(two_edit & ~day_rev & month_rev, 1.0).otherwise(_zero()),
        F.when(two_edit & ~day_rev & ~month_rev & year_ana, 1.0).otherwise(_zero()),
    ]


# --- native C (locality) ----------------------------------------------------

_SOUNDEX_UDF = None


def _soundex_udf(col: Column) -> Column:
    """Lazily-built Arrow-batched soundex column (udf creation needs an
    active SparkContext, so not at import time)."""
    global _SOUNDEX_UDF
    if _SOUNDEX_UDF is None:
        @pandas_udf(T.StringType())
        def _udf(s: pd.Series) -> pd.Series:
            return s.map(lambda x: soundex(x) if x is not None else "0000")
        _SOUNDEX_UDF = _udf
    return _SOUNDEX_UDF(col)


def locality_criteria_cols(v1: Column, v2: Column) -> list[Column]:
    """Native tipo C ladder (localidade.py:17-54). The soundex fallback
    columns are Arrow-batched; everything else codegen'd."""
    valid = (F.length(v1) == 6) & (F.length(v2) == 6)
    uf1, cod1 = F.upper(F.substring(v1, 1, 2)), F.upper(F.substring(v1, 3, 4))
    uf2, cod2 = F.upper(F.substring(v2, 1, 2)), F.upper(F.substring(v2, 3, 4))

    uf_eq = uf1 == uf2
    uf_near = (
        F.when(F.levenshtein(uf1, uf2) == 1, 0.5)
        .when(_soundex_udf(uf1) == _soundex_udf(uf2), 0.3)
        .otherwise(_zero())
    )
    cod_eq = cod1 == cod2
    both_digits = cod1.rlike("^[0-9]+$") & cod2.rlike("^[0-9]+$")
    cod_dist = F.levenshtein(cod1, cod2)
    cod_near = (
        F.when(cod_dist == 1, 0.8)
        .when(cod_dist == 2, 0.5)
        .when(~both_digits & (_soundex_udf(cod1) == _soundex_udf(cod2)), 0.4)
        .otherwise(_zero())
    )
    return [
        F.when(valid & uf_eq, 1.0).otherwise(_zero()),
        F.when(valid & ~uf_eq, uf_near).otherwise(_zero()),
        F.when(valid & cod_eq, 1.0).otherwise(_zero()),
        F.when(valid & ~cod_eq, cod_near).otherwise(_zero()),
    ]


# --- pandas-UDF comparators (N / T / L / M) --------------------------------

def _make_name_udf(freq_bc: Any, include_abbrev: bool, names: Sequence[str]):
    @pandas_udf(_struct_type(7, names))
    def _udf(v1: pd.Series, v2: pd.Series) -> pd.DataFrame:
        maps = freq_bc.value if freq_bc is not None else None
        rows = [
            S.score_name(a or "", b or "", maps, include_abbrev)
            for a, b in zip(v1, v2)
        ]
        return pd.DataFrame(rows, columns=list(names))

    return _udf


def _make_text_udf(freq_bc: Any, names: Sequence[str]):
    @pandas_udf(_struct_type(7, names))
    def _udf(v1: pd.Series, v2: pd.Series) -> pd.DataFrame:
        fmap = freq_bc.value if freq_bc is not None else {}
        rows = [S.score_text(a or "", b or "", fmap) for a, b in zip(v1, v2)]
        return pd.DataFrame(rows, columns=list(names))

    return _udf


def _make_address_udf(names: Sequence[str]):
    @pandas_udf(_struct_type(6, names))
    def _udf(v1: pd.Series, v2: pd.Series) -> pd.DataFrame:
        rows = [S.score_address(a or "", b or "") for a, b in zip(v1, v2)]
        return pd.DataFrame(rows, columns=list(names))

    return _udf


def _make_number_udf(names: Sequence[str]):
    @pandas_udf(_struct_type(4, names))
    def _udf(v1: pd.Series, v2: pd.Series) -> pd.DataFrame:
        rows = [S.score_number(a or "", b or "") for a, b in zip(v1, v2)]
        return pd.DataFrame(rows, columns=list(names))

    return _udf


# --- frequency artifacts ----------------------------------------------------

_POS_FIRST, _POS_MIDDLE, _POS_LAST = "first", "middle", "last"


def _row_token_entries(col: Column, positional: bool) -> Column:
    """array<struct(part, token)> of the LEFT value's tokens — the exact
    lookups the scorer performs (nomes.py positional list: first +
    middles + last, a single token appearing as first AND last; texto.py
    flat lookups tagged 'flat')."""
    toks = F.filter(F.split(padroniza_col(col), " "), lambda t: t != F.lit(""))
    if not positional:
        return F.transform(
            toks, lambda t: F.struct(F.lit("flat").alias("part"), t.alias("token"))
        )
    return F.when(F.size(toks) == 0, F.array().cast(
        "array<struct<part:string,token:string>>"
    )).otherwise(
        F.concat(
            F.array(
                F.struct(
                    F.lit(_POS_FIRST).alias("part"),
                    F.element_at(toks, 1).alias("token"),
                ),
                F.struct(
                    F.lit(_POS_LAST).alias("part"),
                    F.element_at(toks, -1).alias("token"),
                ),
            ),
            F.transform(
                F.slice(toks, 2, F.greatest(F.size(toks) - 2, F.lit(0))),
                lambda t: F.struct(F.lit(_POS_MIDDLE).alias("part"), t.alias("token")),
            ),
        )
    )


def attach_freq_maps(pairs_df: DataFrame, spec: CompareSpec) -> DataFrame:
    """The JOIN-based frequency path (scale alternative to broadcast
    dicts): for every N/T pair, compute the distributed frequency table,
    join the row's own token lookups against it, and re-aggregate a
    per-row ``map<part:token, count>`` column ``__{name}_freqmap``.

    No driver-side collect — token dictionaries that exceed any
    broadcast budget (10^12-turn T-field vocabularies) stay distributed;
    the shuffle is proportional to tokens-per-row, not dictionary size.

    Join-back is deterministic BY CONSTRUCTION: the key is a content
    hash (``xxhash64``) of the pair's compared columns, so the lookups
    branch and the main branch agree regardless of partition ordering,
    recomputation, or AQE re-planning (a ``monotonically_increasing_id``
    would silently diverge on non-deterministic sources). Key
    collisions — distinct rows hashing alike, or rows sharing the same
    compared values — are harmless: the attached map's values all come
    from the same global frequency table, so a merged map returns
    identical counts for every token the scorer actually looks up.
    Returns the pairs with the map columns appended."""
    need = [
        p for p in spec.pairs if p.field_type in (FieldType.TEXT, FieldType.NAME)
    ]
    if not need:
        return pairs_df
    key_cols = sorted({c for p in need for c in (p.left, p.right)})
    pair_key = F.xxhash64(*[F.coalesce(F.col(c), F.lit("")) for c in key_cols])
    df = pairs_df.withColumn("__pair_key", pair_key)
    for p in need:
        positional = p.field_type == FieldType.NAME
        if positional:
            freq = freq_ops.positional_name_freq(pairs_df, p.left, p.right)
        else:
            freq = freq_ops.flat_token_freq(pairs_df, p.left, p.right).select(
                F.lit("flat").alias("part"), "token", "count"
            )
        lookups = (
            df.select(
                "__pair_key",
                F.explode(
                    _row_token_entries(F.col(p.left), positional)
                ).alias("e"),
            )
            .select("__pair_key", "e.part", "e.token")
            .distinct()
        )
        joined = lookups.join(freq, ["part", "token"], "left").select(
            "__pair_key",
            F.concat_ws(":", "part", "token").alias("k"),
            F.coalesce("count", F.lit(0)).cast("long").alias("v"),
        )
        maps = joined.groupBy("__pair_key").agg(
            F.map_from_entries(
                F.array_distinct(F.collect_list(F.struct("k", "v")))
            ).alias(f"__{p.name}_freqmap")
        )
        df = df.join(maps, "__pair_key", "left")
    return df.drop("__pair_key")


def _split_positional_map(m: Mapping[str, int] | None) -> list[dict[str, int]]:
    maps: list[dict[str, int]] = [{}, {}, {}]
    if m:
        pos = {_POS_FIRST: 0, _POS_MIDDLE: 1, _POS_LAST: 2}
        for k, v in m.items():
            part, tok = k.split(":", 1)
            maps[pos[part]][tok] = v
    return maps


def _make_name_udf_joined(include_abbrev: bool, names: Sequence[str]):
    @pandas_udf(_struct_type(7, names))
    def _udf(v1: pd.Series, v2: pd.Series, fm: pd.Series) -> pd.DataFrame:
        rows = [
            S.score_name(a or "", b or "", _split_positional_map(m), include_abbrev)
            for a, b, m in zip(v1, v2, fm)
        ]
        return pd.DataFrame(rows, columns=list(names))

    return _udf


def _make_text_udf_joined(names: Sequence[str]):
    @pandas_udf(_struct_type(7, names))
    def _udf(v1: pd.Series, v2: pd.Series, fm: pd.Series) -> pd.DataFrame:
        rows = [
            S.score_text(
                a or "",
                b or "",
                {k.split(":", 1)[1]: v for k, v in m.items()} if m else {},
            )
            for a, b, m in zip(v1, v2, fm)
        ]
        return pd.DataFrame(rows, columns=list(names))

    return _udf


def build_freq_artifacts(
    pairs_df: DataFrame, spec: CompareSpec
) -> dict[str, Any]:
    """Per-pair frequency maps from the pairs table itself, exactly like
    processar_generico (comparaRegistros.py:234-242): flat map for T,
    positional 3-map for N, nothing for the rest. Distributed agg ->
    collected dict (broadcast later)."""
    artifacts: dict[str, Any] = {}
    for p in spec.pairs:
        if p.field_type == FieldType.TEXT:
            artifacts[p.name] = freq_ops.collect_flat_map(
                freq_ops.flat_token_freq(pairs_df, p.left, p.right)
            )
        elif p.field_type == FieldType.NAME:
            artifacts[p.name] = freq_ops.collect_positional_maps(
                freq_ops.positional_name_freq(pairs_df, p.left, p.right)
            )
    return artifacts


# --- the engine -------------------------------------------------------------

def score_pairs(
    pairs_df: DataFrame,
    spec: CompareSpec,
    freq_artifacts: Mapping[str, Any] | None = None,
    freq_strategy: str = "broadcast",
) -> DataFrame:
    """Score every candidate pair under ``spec``.

    Appends one double column per criterion (named
    ``{pair.name}_{criterion}``) plus ``spec.total_column``. Input
    columns pass through untouched (the reference emits input + criteria
    + nota final, comparaRegistros.py:327-330).

    ``freq_strategy``: 'broadcast' collects each N/T frequency table
    into a driver dict shipped as a Spark broadcast — right when the
    dictionary fits executor memory. 'join' never collects: per-row
    frequency maps are attached by a distributed join
    (:func:`attach_freq_maps`) — the scale path when the token
    dictionary exceeds any broadcast budget. Both produce identical
    scores (parity-pinned in tests)."""
    if freq_strategy not in ("broadcast", "join"):
        raise ValueError(f"unknown freq_strategy {freq_strategy!r}")
    use_join = freq_strategy == "join"
    if use_join:
        freq_artifacts = {}
        df = attach_freq_maps(pairs_df, spec)
    else:
        if freq_artifacts is None:
            freq_artifacts = build_freq_artifacts(pairs_df, spec)
        df = pairs_df

    sc = pairs_df.sparkSession.sparkContext
    struct_cols: list[tuple[str, list[str]]] = []  # (tmp struct col, criterion cols)
    native_cols: dict[str, Column] = {}

    for p in spec.pairs:
        crit_names = list(CRITERIA[p.field_type])
        out_names = p.criterion_columns()
        raw1, raw2 = F.col(p.left), F.col(p.right)
        # M compares RAW values; everything else the padronized form
        # (comparaRegistros.py:44-62)
        v1, v2 = padroniza_col(raw1), padroniza_col(raw2)

        if p.field_type == FieldType.DATE:
            crits = date_criteria_cols(v1, v2)
            if spec.legacy_empty_guards:
                guard = (F.length(v1) == 8) & (F.length(v2) == 8)
                crits = [F.when(guard, c).otherwise(_zero()) for c in crits]
            for name, c in zip(out_names, crits):
                native_cols[name] = c
        elif p.field_type == FieldType.LOCALITY:
            for name, c in zip(out_names, locality_criteria_cols(v1, v2)):
                native_cols[name] = c
        else:
            freq = freq_artifacts.get(p.name)
            bc = sc.broadcast(freq) if freq is not None else None
            if p.field_type == FieldType.NAME:
                if use_join:
                    udf = _make_name_udf_joined(
                        spec.include_abbreviations, crit_names
                    )
                    args = (v1, v2, F.col(f"__{p.name}_freqmap"))
                else:
                    udf = _make_name_udf(bc, spec.include_abbreviations, crit_names)
                    args = (v1, v2)
                if spec.legacy_empty_guards:
                    # processar zeroes the whole block when either side
                    # is empty (comparaRegistros.py:114-121); blanking
                    # both inputs makes the scorer emit all zeros
                    guard = (v1 != F.lit("")) & (v2 != F.lit(""))
                    args = (
                        F.when(guard, v1).otherwise(F.lit("")),
                        F.when(guard, v2).otherwise(F.lit("")),
                        *args[2:],
                    )
            elif p.field_type == FieldType.TEXT:
                if use_join:
                    udf = _make_text_udf_joined(crit_names)
                    args = (v1, v2, F.col(f"__{p.name}_freqmap"))
                else:
                    udf = _make_text_udf(bc, crit_names)
                    args = (v1, v2)
            elif p.field_type == FieldType.ADDRESS:
                udf = _make_address_udf(crit_names)
                args = (v1, v2)
            elif p.field_type == FieldType.NUMBER:
                udf = _make_number_udf(crit_names)
                args = (raw1, raw2)
            else:  # pragma: no cover
                raise ValueError(f"unhandled field type {p.field_type}")
            tmp = f"__{p.name}_scores"
            df = df.withColumn(tmp, udf(*args))
            struct_cols.append((tmp, out_names))

    # expand struct results into flat criterion columns
    for tmp, out_names in struct_cols:
        for out_name, field_name in zip(out_names, df.schema[tmp].dataType.names):
            df = df.withColumn(out_name, F.col(tmp)[field_name])
    df = df.drop(*[tmp for tmp, _ in struct_cols])
    if use_join:
        df = df.drop(
            *[
                f"__{p.name}_freqmap"
                for p in spec.pairs
                if p.field_type in (FieldType.TEXT, FieldType.NAME)
            ]
        )

    for name, c in native_cols.items():
        df = df.withColumn(name, c)

    all_crits = spec.criterion_columns()
    total = None
    for name in all_crits:
        total = F.col(name) if total is None else total + F.col(name)
    df = df.withColumn(spec.total_column, F.round(total, 10))
    return df


def to_export(
    scored: DataFrame,
    spec: CompareSpec,
    sort_by: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Export-edge rendering: criterion doubles -> pt-BR comma strings
    ("%.2f", total ROUND_HALF_UP), globally sorted by the NUMERIC score.

    Documented deviation from the reference (SURVEY.md §2.6): the
    reference sorts the comma-decimal *strings* lexicographically, which
    orders "10,00" before "9,00"; we sort numerically."""
    if sort_by is None:
        sort_by = spec.total_column
    order_col = F.col(sort_by)
    df = scored.orderBy(order_col.asc() if ascending else order_col.desc())
    for name in spec.criterion_columns() + [spec.total_column]:
        df = df.withColumn(
            name,
            F.regexp_replace(F.format_number(F.col(name), 2), r"\.", ","),
        )
    return df
