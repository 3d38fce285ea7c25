"""Distributed token-frequency tables.

The reference builds Python Counter dicts by streaming the CSV in 500k
row chunks (/root/reference/src/freqBuilder.py:42-97,
/root/reference/src/comparaRegistros.py:163-202). Here they are ordinary
distributed aggregations — explode + groupBy + count gets map-side
partial aggregation and spills for free — persisted as checkpoint
tables and collected/broadcast only at the UDF boundary.

Normative quirk carried over: a single-token name counts as BOTH the
first and the last part (freqBuilder._split_nome returns ``(p, [], p)``,
freqBuilder.py:21-28).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from comparador_de_registros_spark.functions.normalize import padroniza_col

PART_FIRST, PART_MIDDLE, PART_LAST, PART_FLAT = "first", "middle", "last", "flat"


def _tokens(col: Column) -> Column:
    """Non-empty whitespace tokens of the padronized value."""
    return F.filter(F.split(padroniza_col(col), " "), lambda t: t != F.lit(""))


def _union_both_sides(df: DataFrame, left: str, right: str) -> DataFrame:
    """UNION ALL of the two sides of a pair column — the reference's
    ``pd.concat([colA, colB])`` (comparaRegistros.py:165,193)."""
    return df.select(F.col(left).alias("value")).unionAll(
        df.select(F.col(right).alias("value"))
    )


def flat_token_freq(df: DataFrame, left: str, right: str) -> DataFrame:
    """Tipo T frequency: every token of both columns. -> (token, count)"""
    vals = _union_both_sides(df, left, right)
    return (
        vals.select(F.explode(_tokens(F.col("value"))).alias("token"))
        .groupBy("token")
        .count()
    )


def positional_name_freq(df: DataFrame, left: str, right: str) -> DataFrame:
    """Tipo N frequency: three positional maps in one pass, tagged by
    ``part`` in {first, middle, last}. -> (part, token, count)"""
    vals = _union_both_sides(df, left, right)
    toks = vals.select(_tokens(F.col("value")).alias("toks")).where(F.size("toks") > 0)
    tagged = toks.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.lit(PART_FIRST).alias("part"),
                        F.element_at("toks", 1).alias("token"),
                    ),
                    F.struct(
                        F.lit(PART_LAST).alias("part"),
                        F.element_at("toks", -1).alias("token"),
                    ),
                ),
                F.transform(
                    F.slice("toks", 2, F.greatest(F.size("toks") - 2, F.lit(0))),
                    lambda t: F.struct(
                        F.lit(PART_MIDDLE).alias("part"), t.alias("token")
                    ),
                ),
            )
        ).alias("pt")
    )
    return tagged.select("pt.part", "pt.token").groupBy("part", "token").count()


def collect_flat_map(freq_df: DataFrame) -> dict[str, int]:
    """Materialize a (token, count) table into a broadcastable dict.

    Token dictionaries grow sublinearly in corpus size (names/words);
    at 10^12-turn scale prefer the join-based path in
    operators/compare.py if the dict exceeds broadcast budget."""
    return {r["token"]: r["count"] for r in freq_df.toLocalIterator()}


def collect_positional_maps(freq_df: DataFrame) -> list[dict[str, int]]:
    """-> [first, middle, last] dicts (reference's 3-map layout)."""
    maps: dict[str, dict[str, int]] = {PART_FIRST: {}, PART_MIDDLE: {}, PART_LAST: {}}
    for r in freq_df.toLocalIterator():
        maps[r["part"]][r["token"]] = r["count"]
    return [maps[PART_FIRST], maps[PART_MIDDLE], maps[PART_LAST]]


def write_freq_checkpoint(freq_df: DataFrame, path: str) -> None:
    """Persist a frequency table ordered by count desc (the reference
    persists its cache CSVs sorted, freqBuilder.py:85-94)."""
    freq_df.orderBy(F.desc("count")).write.mode("overwrite").parquet(path)


def read_freq_checkpoint(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
