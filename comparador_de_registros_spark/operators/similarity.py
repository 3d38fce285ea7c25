"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — brute-force baseline: native dot product via
  ``aggregate(zip_with(...))`` (no Python), window top-k. Exact; the
  correctness oracle for the approximate path.
* :func:`srp_lsh_buckets` / :func:`srp_topk` — the scale path: signed
  random projections (Charikar 2002) hash each vector to bit-band
  bucket keys; candidates are generated per shared band (equi-join, the
  same physical shape as MinHash-LSH) and re-ranked with the exact
  cosine. At 100 TB this replaces the O(n*q) scan with bucket joins.

The projection matrix is derived from a seed inside the pandas UDF
(numpy matmul per Arrow batch) — vectors never leave the JVM except for
that one batched projection.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_col(a: Column, b: Column) -> Column:
    """Native cosine similarity between two float-array columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force).

    ``queries(query_id, embedding)`` x ``embeddings(vec_id, embedding)``
    -> (query_id, vec_id, cosine, rank), excluding self-matches.
    The query side is broadcast (queries are few; the corpus is big)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    scored = (
        embeddings.select(id_col, vec_col)
        .crossJoin(q)
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine_col(F.col("__qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def srp_bits_udf(n_bits: int, seed: int, dim: int | None = None):
    """pandas UDF: embedding -> packed sign-bit fingerprint (long).
    The Gaussian projection matrix is regenerated from the seed in each
    worker (deterministic, no broadcast payload); the embedding
    dimension is read from the first vector of each Arrow batch when not
    given — no driver-side probe action (round-1 ran a ``.first()``
    per query invocation)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def _udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        d = dim if dim is not None else len(vecs.iloc[0])
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((d, n_bits))
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ planes) > 0
        weights = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)
        with np.errstate(over="ignore"):
            packed = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.Series(packed.view(np.int64))

    return _udf


def srp_lsh_buckets(
    embeddings: DataFrame,
    n_bits: int = 64,
    bands: int = 4,
    seed: int = 0xA11CE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """-> (vec_id, band, key): one bucket key per band of sign bits.
    Two vectors with cosine close to 1 agree on a full band with high
    probability (P[bit agree] = 1 - theta/pi).

    Geometry: width = n_bits/bands sign bits per key. The 64/4 default
    gives 16-bit keys — 65,536 buckets per band, so expected bucket
    occupancy is n/2^16 (round-1 shipped 4-bit keys: 16 buckets/band =
    O(n^2/16) candidate pairs). For corpora >> 10^7 raise n_bits (e.g.
    96/4 -> 2^24 buckets) — recall at cosine c scales as
    1-(1-p^width)^bands with p = 1 - arccos(c)/pi; the bucket-size cap
    below is the skew guard either way."""
    bits = srp_bits_udf(n_bits, seed, dim)(F.col(vec_col))
    width = n_bits // bands
    mask = (1 << width) - 1
    return embeddings.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(bits, i * width).bitwiseAND(F.lit(mask))
                    for i in range(bands)
                ]
            )
        ).alias("band", "key"),
    )


def srp_candidate_pairs(
    embeddings: DataFrame,
    n_bits: int = 64,
    bands: int = 4,
    seed: int = 0xA11CE,
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Approximate near-duplicate vectors: bucket-join candidates then
    exact-cosine verify (the embedding-space analogue of MinHash-LSH +
    Jaccard verify). Buckets larger than ``max_bucket_size`` are dropped
    from pair enumeration (same skew guard + accounting shape as
    operators/lsh.py; use :func:`srp_candidate_pairs_with_dropped` when
    the dropped-bucket table is needed for metrics).
    -> (a, b, cosine) with a < b."""
    pairs, _ = srp_candidate_pairs_with_dropped(
        embeddings, n_bits, bands, seed, min_cosine, id_col, vec_col, dim,
        max_bucket_size,
    )
    return pairs


def srp_candidate_pairs_with_dropped(
    embeddings: DataFrame,
    n_bits: int = 64,
    bands: int = 4,
    seed: int = 0xA11CE,
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket_size: int = 2000,
) -> tuple[DataFrame, DataFrame]:
    """As :func:`srp_candidate_pairs`, also returning
    ``dropped(band, key, sz)`` for lineage/metrics."""
    from comparador_de_registros_spark.operators.lsh import _self_join_pairs

    buckets = srp_lsh_buckets(
        embeddings, n_bits, bands, seed, id_col, vec_col, dim
    ).withColumnRenamed(id_col, "conv_id")
    cand, dropped = _self_join_pairs(
        buckets, ["band", "key"], max_bucket_size, "srp"
    )
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    withv = (
        cand.drop("source")
        .join(vecs.withColumnRenamed(id_col, "a").withColumnRenamed(vec_col, "va"), "a")
        .join(vecs.withColumnRenamed(id_col, "b").withColumnRenamed(vec_col, "vb"), "b")
    )
    pairs = (
        withv.select(
            "a", "b", F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine")
        )
        .where(F.col("cosine") >= min_cosine)
    )
    return pairs, dropped
