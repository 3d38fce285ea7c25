#!/usr/bin/env python
"""A/B micro-bench: JVM array_intersect vs a vectorized Arrow kernel
for the verify stage's per-pair |A ∩ B| (guide §1.4 noop isolation).

Builds REAL signatures from the sf0.1 documents table, then a
synthetic candidate table of N random pairs (seeded) at the sf1.0
bench's candidate volume (~2.6M pairs), and times the scored
projection (joins + jaccard) under both expressions with a noop sink.
Usage: python tools/microbench_intersect.py [n_pairs] [reps]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from comparador_de_registros_spark.conf import build_spark
from comparador_de_registros_spark.operators.doc_dedup import _docs_as_convs
from comparador_de_registros_spark.operators.signatures import compute_signatures
from comparador_de_registros_spark.plans.configs import DedupConfig

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_600_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pandas_udf(T.IntegerType())
def intersect_size(a: pd.Series, b: pd.Series) -> pd.Series:
    """|A ∩ B| for per-row arrays that are distinct within each side.
    Vectorized: scatter each pair's concatenated values into a padded
    2D matrix, one row-wise sort, count equal-adjacent non-pad values.
    Exact: each common value appears exactly twice in the concat."""
    n = len(a)
    if n == 0:
        return pd.Series([], dtype="int32")
    av = a.values
    bv = b.values
    la = np.fromiter((len(x) for x in av), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in bv), dtype=np.int64, count=n)
    L = la + lb
    out = np.zeros(n, dtype=np.int32)
    # chunk by size so a straggler row can't blow up n*maxL memory
    order = np.argsort(L, kind="stable")
    BUDGET = 16_000_000  # elements per padded matrix chunk (~128 MB)
    PAD = np.int64(1) << np.int64(62)
    start = 0
    flat_parts: list[np.ndarray] = []
    while start < n:
        end = start
        maxL = 0
        while end < n:
            cl = int(L[order[end]])
            m = max(maxL, cl)
            if (end - start + 1) * m > BUDGET and end > start:
                break
            maxL = m
            end += 1
        idx = order[start:end]
        rows = len(idx)
        if maxL == 0:
            start = end
            continue
        flat_parts.clear()
        for i in idx:
            flat_parts.append(av[i])
            flat_parts.append(bv[i])
        flat = np.concatenate(flat_parts).astype(np.int64, copy=False)
        M = np.full((rows, maxL), PAD, dtype=np.int64)
        mask = np.arange(maxL, dtype=np.int64)[None, :] < L[idx][:, None]
        M[mask] = flat
        M.sort(axis=1)
        eq = (M[:, 1:] == M[:, :-1]).sum(axis=1)
        pad_cnt = maxL - L[idx]
        out[idx] = (eq - np.maximum(pad_cnt - 1, 0)).astype(np.int32)
        start = end
    return pd.Series(out)


def main() -> None:
    spark = build_spark(app_name="microbench-intersect", master="local[32]")
    cfg = DedupConfig()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    convs = _docs_as_convs(docs, "doc_id", "text").select("conv_id", "norm")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    convs = convs.repartition(n_part, "conv_id")
    sigs = compute_signatures(convs, cfg).select("conv_id", "shingles").persist()
    n_docs = sigs.count()
    ids = [r[0] for r in sigs.select("conv_id").collect()]
    print(f"# {n_docs} docs signed", file=sys.stderr)

    rng = np.random.default_rng(42)
    ai = rng.integers(0, n_docs, size=N_PAIRS)
    bi = rng.integers(0, n_docs, size=N_PAIRS)
    neq = ai != bi
    ai, bi = ai[neq], bi[neq]
    pdf = pd.DataFrame({
        "a": [ids[i] for i in np.minimum(ai, bi)],
        "b": [ids[i] for i in np.maximum(ai, bi)],
    }).drop_duplicates()
    cand = spark.createDataFrame(pdf).persist()
    n_cand = cand.count()
    print(f"# {n_cand} candidate pairs", file=sys.stderr)

    # medium-plan shape: broadcast the sig side into both joins
    sigb = F.broadcast(sigs)
    withsets = (
        cand.join(sigb.select(F.col("conv_id").alias("a"), "shingles"), "a")
        .withColumnRenamed("shingles", "sh_a")
        .join(sigb.select(F.col("conv_id").alias("b"), "shingles"), "b")
        .withColumnRenamed("shingles", "sh_b")
    )
    na, nb = F.size("sh_a"), F.size("sh_b")
    thresh = float(cfg.jaccard_threshold)
    bound_fail = F.least(na, nb) / F.greatest(na, nb) < F.lit(thresh)

    def timed(tag, df):
        for r in range(REPS):
            spark.sparkContext.setJobDescription(f"{tag} rep{r}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            print(f"{tag} rep{r}: {time.time()-t0:.2f}s", flush=True)

    # A: current JVM expression with the size-bound prune
    inter_a = F.size(F.array_intersect("sh_a", "sh_b"))
    u2a = na + nb - inter_a
    jacc_a = F.when(bound_fail, F.lit(None).cast("double")).otherwise(
        F.when(u2a > 0, inter_a / u2a).otherwise(F.lit(0.0))
    )
    df_a = withsets.select("a", "b", jacc_a.alias("jaccard"))

    # B: Arrow kernel; pruned rows ship empty arrays (cheap)
    empty = F.array().cast("array<int>")
    sh_a2 = F.when(bound_fail, empty).otherwise(F.col("sh_a"))
    sh_b2 = F.when(bound_fail, empty).otherwise(F.col("sh_b"))
    inter_b = intersect_size(sh_a2, sh_b2)
    u2b = na + nb - inter_b
    jacc_b = F.when(bound_fail, F.lit(None).cast("double")).otherwise(
        F.when(u2b > 0, inter_b / u2b).otherwise(F.lit(0.0))
    )
    df_b = withsets.select("a", "b", jacc_b.alias("jaccard"))

    timed("A-jvm-array_intersect", df_a)
    timed("B-arrow-kernel", df_b)
    timed("A2-jvm-again", df_a)

    # exactness check: same jaccard on every pair
    diff = (
        df_a.withColumnRenamed("jaccard", "ja")
        .join(df_b.withColumnRenamed("jaccard", "jb"), ["a", "b"])
        .where(
            (F.col("ja").isNull() != F.col("jb").isNull())
            | (F.col("ja") != F.col("jb"))
        )
        .count()
    )
    print(f"mismatches: {diff}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
