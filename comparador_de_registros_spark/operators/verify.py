"""Verification: exact Jaccard on shingle sets + substring containment.

Candidates from all generators are unioned, de-duplicated, then
verified natively: ``size(array_intersect)/size(array_union)`` over the
stored shingle arrays (no Python). Pairs that came from the substring
generator and fail the Jaccard threshold get a second chance as
containment duplicates (one normalized doc embedded inside the other —
FIXTURES.md planted class), checked with native ``instr``.

Scale notes: the two shingle-set joins are the big shuffles of the
pipeline; they join the (much smaller) pair table against the signature
table on conv_id — AQE handles residual skew; the pair table is
pre-distinct so each conversation's shingle set is shipped once per
pair side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comparador_de_registros_spark.plans.configs import DedupConfig


def union_candidates(*pair_dfs: DataFrame) -> DataFrame:
    """UNION the generator outputs, keeping the set of sources per pair."""
    out = None
    for df in pair_dfs:
        out = df if out is None else out.unionByName(df)
    return (
        out.groupBy("a", "b")
        .agg(F.array_sort(F.collect_set("source")).alias("sources"))
    )


def verify_pairs(
    candidates: DataFrame,
    signatures: DataFrame,
    docs_norm: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """-> (a, b, jaccard, contained, is_dup, sources)

    ``docs_norm`` must carry (conv_id, norm) — the same normalized text
    the signatures were computed from.
    """
    sig = signatures.select("conv_id", "shingles")
    withsets = (
        candidates.join(sig.withColumnRenamed("conv_id", "a"), "a")
        .withColumnRenamed("shingles", "sh_a")
        .join(sig.withColumnRenamed("conv_id", "b"), "b")
        .withColumnRenamed("shingles", "sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jacc = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    scored = withsets.select(
        "a", "b", "sources", jacc.alias("jaccard")
    )

    needs_containment = scored.where(
        (F.col("jaccard") < cfg.jaccard_threshold)
        & F.array_contains("sources", "substring")
    )
    jacc_pass = scored.where(F.col("jaccard") >= cfg.jaccard_threshold).withColumn(
        "contained", F.lit(False)
    )

    if cfg.use_substring:
        d = docs_norm.select("conv_id", "norm")
        contained = (
            needs_containment.join(d.withColumnRenamed("conv_id", "a"), "a")
            .withColumnRenamed("norm", "norm_a")
            .join(d.withColumnRenamed("conv_id", "b"), "b")
            .withColumnRenamed("norm", "norm_b")
            .withColumn(
                "contained",
                F.when(
                    F.length("norm_a") <= F.length("norm_b"),
                    F.instr(F.col("norm_b"), F.col("norm_a")) > 0,
                ).otherwise(F.instr(F.col("norm_a"), F.col("norm_b")) > 0),
            )
            .select("a", "b", "sources", "jaccard", "contained")
        )
        verified = jacc_pass.unionByName(contained)
    else:
        verified = jacc_pass

    return verified.withColumn(
        "is_dup",
        (F.col("jaccard") >= cfg.jaccard_threshold) | F.col("contained"),
    )
