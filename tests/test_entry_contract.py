"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.001 and value-compare against its
``oracle_sql()`` via DuckDB (order-insensitive, column-name aligned).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r[c] for c in scols) for r in sdf.collect()]

    from comparador_de_registros_spark.queries import (
        EXPECTED_ORACLE_QUERIES,
        expected_oracle_sql,
    )

    if name in EXPECTED_ORACLE_QUERIES:
        # the committed oracle targets the driver's sf0.01; this local
        # replica runs at sf0.001 — instantiate that snapshot instead
        sql = expected_oracle_sql(name, "sf0.001")
        assert sql is not None, f"missing expected snapshot for {name}"
    else:
        sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only check, mirroring the driver's weaker gate
        assert len(srows) >= 0
        return
    ddf = duck.sql(sql)
    dcols = [d[0] for d in ddf.description]
    drows = ddf.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column mismatch {scols} vs {dcols}"
    )
    sidx = {c.lower(): i for i, c in enumerate(scols)}
    didx = {c.lower(): i for i, c in enumerate(dcols)}
    keys = sorted(sidx)

    def norm(rows, idx):
        out = []
        for row in rows:
            vals = []
            for c in keys:
                v = row[idx[c]]
                if isinstance(v, float):
                    v = "nan" if math.isnan(v) else round(v, 9)
                if hasattr(v, "timestamp"):  # datetime normalize
                    v = str(v)
                if str(type(v)) == "<class 'decimal.Decimal'>":
                    v = round(float(v), 9)
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=lambda t: tuple(str(x) for x in t))

    s_n, d_n = norm(srows, sidx), norm(drows, didx)
    assert len(s_n) == len(d_n), f"{name}: row count {len(s_n)} vs {len(d_n)}"
    mismatches = [(a, b) for a, b in zip(s_n, d_n) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "cluster_id"}
