"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`comparador_de_registros_spark.queries` — the
driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from comparador_de_registros_spark.queries import ORACLES, QUERIES  # noqa: E402

_SHIPPED: set[str] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the engine package to the executors (the ``--py-files``
    story). Needed when the harness's SparkSession was not launched
    from the repo directory: the driver imports via sys.path above, but
    Python workers unpickle pandas-UDF closures and must import
    ``comparador_de_registros_spark`` themselves."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    zip_path = shutil.make_archive(
        os.path.join(tempfile.gettempdir(), "cdr_spark_pkg"),
        "zip",
        root_dir=_REPO,
        base_dir="comparador_de_registros_spark",
    )
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app_id)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: near-duplicate clustering of the documents table
    (signature pairs -> connected components -> singleton attach) at
    sf0.001."""
    _ensure_shipped(spark)
    return QUERIES["doc_dedup_clusters"](spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Signature-based queries
    (minhash_dup_pairs, doc_dedup_clusters, embedding_near_pairs) have
    no SQL-expressible equivalent; their oracle reads the pinned
    expected-output parquet committed under expected/sf0.01/
    (tools/make_expected.py) — a full value gate; semantics are pinned
    separately by tests/ against brute-force oracles."""
    return dict(ORACLES)
