#!/usr/bin/env python
"""Regenerate the pinned expected-output parquet snapshots under
``expected/{sf0.001,sf0.01}/`` for the driver queries with no DuckDB-
expressible oracle (queries.EXPECTED_ORACLE_QUERIES).

Two snapshot classes:

* **Signature queries** (minhash_dup_pairs, doc_dedup_clusters,
  embedding_near_pairs): REGRESSION oracles — produced by the Spark
  path itself at pinned seeds/config; semantic correctness is pinned
  separately by tests/ against brute-force oracles. Rerun + review the
  diff only when the signature config intentionally changes.

* **Comparator queries** (compare_addresses, compare_numbers,
  compare_names_soundex): INDEPENDENT oracles — the pair INPUTS come
  from the shared ``pairs_compare_*`` builders, but every score is
  computed here by the pure-Python reference-parity scorers
  (functions/scores.py — the same twins the pytest goldens pin against
  the reference), never by the Spark engine under test. A driver gate
  hit on these rows therefore checks Spark-vs-Python scorer agreement
  on every row, not just "didn't change".

Usage: python tools/make_expected.py
"""

from __future__ import annotations

import os
import shutil
import sys
from decimal import ROUND_HALF_UP, Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from comparador_de_registros_spark.conf import build_spark  # noqa: E402
from comparador_de_registros_spark.functions import scores as S  # noqa: E402
from comparador_de_registros_spark.functions.normalize import (  # noqa: E402
    padroniza,
)
from comparador_de_registros_spark.queries import (  # noqa: E402
    EXPECTED_ORACLE_QUERIES,
    QUERIES,
    pairs_compare_addresses,
    pairs_compare_names_soundex,
    pairs_compare_numbers,
)

SFS = ("sf0.001", "sf0.01")


def _round10(x: float) -> float:
    """Spark's ``F.round(col, 10)`` semantics: BigDecimal.valueOf
    (shortest decimal repr of the double) -> setScale(10, HALF_UP)."""
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("1.0000000000"), rounding=ROUND_HALF_UP
        )
    )


def _toks(value: str) -> list[str]:
    return [t for t in padroniza(value or "").split() if t]


def _flat_freq(values: list[str]) -> dict[str, int]:
    """operators/freq.py:flat_token_freq twin (padronized tokens of
    both pair sides, duplicate-counting)."""
    freq: dict[str, int] = {}
    for v in values:
        for t in _toks(v):
            freq[t] = freq.get(t, 0) + 1
    return freq


def _positional_freq(values: list[str]) -> list[dict[str, int]]:
    """operators/freq.py:positional_name_freq twin: [first, middle,
    last] maps; a single-token name counts as first AND last
    (freqBuilder._split_nome quirk)."""
    first: dict[str, int] = {}
    middle: dict[str, int] = {}
    last: dict[str, int] = {}
    for v in values:
        toks = _toks(v)
        if not toks:
            continue
        first[toks[0]] = first.get(toks[0], 0) + 1
        last[toks[-1]] = last.get(toks[-1], 0) + 1
        for t in toks[1:-1]:
            middle[t] = middle.get(t, 0) + 1
    return [first, middle, last]


def python_compare_addresses(spark, sf_dir: str):
    """Pure-Python L scoring over the shared inputs. Mirrors
    operators/compare.py:score_pairs for an ADDRESS pair: padroniza ->
    score_address -> nota = round(sum, 10)."""
    rows = pairs_compare_addresses(spark, sf_dir).collect()
    out = []
    for r in rows:
        crits = S.score_address(padroniza(r["addr_a"]), padroniza(r["addr_b"]))
        out.append(
            (r["key"], r["addr_a"], r["addr_b"], *crits, _round10(sum(crits)))
        )
    return out


def python_compare_numbers(spark, sf_dir: str):
    """Pure-Python M scoring: RAW (un-padronized) values, Decimal
    semantics (numeros.py:67-115)."""
    rows = pairs_compare_numbers(spark, sf_dir).collect()
    out = []
    for r in rows:
        crits = S.score_number(r["num_a"] or "", r["num_b"] or "")
        out.append(
            (r["key"], r["num_a"], r["num_b"], *crits, _round10(sum(crits)))
        )
    return out


def python_compare_names_soundex(spark, sf_dir: str):
    """Pure-Python N+T scoring with self-built frequency maps, exactly
    like processar_generico: positional 3-map for N, flat map for T,
    both over the union of the padronized pair columns."""
    rows = pairs_compare_names_soundex(spark, sf_dir).collect()
    both = [r["name_a"] for r in rows] + [r["name_b"] for r in rows]
    pos_maps = _positional_freq(both)
    flat = _flat_freq(both)
    out = []
    for r in rows:
        v1, v2 = padroniza(r["name_a"]), padroniza(r["name_b"])
        crits_n = S.score_name(v1, v2, pos_maps, include_abbreviations=True)
        crits_t = S.score_text(v1, v2, flat)
        crits = (*crits_n, *crits_t)
        out.append((r["key"], *crits, _round10(sum(crits))))
    return out


PYTHON_ORACLES = {
    "compare_addresses": python_compare_addresses,
    "compare_numbers": python_compare_numbers,
    "compare_names_soundex": python_compare_names_soundex,
}


def main() -> None:
    spark = build_spark(app_name="cdr-make-expected", master="local[32]")
    for sf_tag in SFS:
        sf_dir = f"/root/testdata/{sf_tag}"
        for name in EXPECTED_ORACLE_QUERIES:
            out = os.path.join(REPO, "expected", sf_tag, name)
            shutil.rmtree(out, ignore_errors=True)
            if name in PYTHON_ORACLES:
                # independent oracle: rows scored in pure Python; only
                # the output SCHEMA (names/types) comes from the Spark
                # query, so the committed parquet types line up
                schema = QUERIES[name](spark, sf_dir).schema
                rows = PYTHON_ORACLES[name](spark, sf_dir)
                df = spark.createDataFrame(rows, schema)
            else:
                df = QUERIES[name](spark, sf_dir)
            # one file: these are small, and a single file keeps the
            # committed snapshot reviewable
            df.coalesce(1).write.mode("overwrite").parquet(out)
            n = spark.read.parquet(out).count()
            print(f"{sf_tag}/{name}: {n} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
