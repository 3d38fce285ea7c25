#!/usr/bin/env python
"""Regenerate the pinned expected-output parquet snapshots under
``expected/{sf0.001,sf0.01}/`` for the signature-based driver queries
(queries.EXPECTED_ORACLE_QUERIES).

These snapshots are the DuckDB-readable value oracles for queries with
no SQL-expressible equivalent (MinHash-LSH pairing, SRP bucketing):
the driver hash-compares the live Spark result against them, turning
the previous rows-only checks into full value gates. They are
REGRESSION oracles — semantic correctness is pinned separately by
tests/ against brute-force oracles — so rerun this script (and review
the diff!) only when the signature config or dedup rule intentionally
changes.

Usage: python tools/make_expected.py
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from comparador_de_registros_spark.conf import build_spark  # noqa: E402
from comparador_de_registros_spark.queries import (  # noqa: E402
    EXPECTED_ORACLE_QUERIES,
    QUERIES,
)

SFS = ("sf0.001", "sf0.01")


def main() -> None:
    spark = build_spark(app_name="cdr-make-expected", master="local[32]")
    for sf_tag in SFS:
        sf_dir = f"/root/testdata/{sf_tag}"
        for name in EXPECTED_ORACLE_QUERIES:
            out = os.path.join(REPO, "expected", sf_tag, name)
            shutil.rmtree(out, ignore_errors=True)
            df = QUERIES[name](spark, sf_dir)
            # one file: these are small, and a single file keeps the
            # committed snapshot reviewable
            df.coalesce(1).write.mode("overwrite").parquet(out)
            n = spark.read.parquet(out).count()
            print(f"{sf_tag}/{name}: {n} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
