"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`comparador_de_registros_spark.queries` — the
driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from comparador_de_registros_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: near-duplicate clustering of the documents table
    (signature pairs -> connected components -> singleton attach) at
    sf0.001."""
    return QUERIES["doc_dedup_clusters"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; signature-based queries
    (minhash_dup_pairs, doc_dedup_clusters, embedding_near_pairs) are
    intentionally omitted -> rows-only driver check (their semantics
    are pinned by tests/ against brute-force oracles)."""
    return dict(ORACLES)
