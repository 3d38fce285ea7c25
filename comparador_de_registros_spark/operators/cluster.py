"""Connected components on the duplicate-pair graph.

Alternating large-star / small-star iterations (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) expressed as
DataFrame joins + aggregations — converges in O(log n) rounds on
path-like graphs and ~2 rounds on the star-shaped clusters dedup
produces. GraphFrames is unavailable offline (SURVEY.md §7); this is
the standard published construction, not a port of anything in the
reference (which has no clustering stage at all — SURVEY.md §2.3).

Scale notes:
* each round is two shuffles (groupBy min + join back);
* ``localCheckpoint`` truncates lineage every round so the plan does
  not grow exponentially with iterations (reference-free requirement,
  SURVEY.md §4 item 3);
* convergence check = count + xor-ish checksum of the edge set (one
  lightweight agg per round);
* node ids are conv_id strings under lexicographic order; a dictionary
  encoding to longs is a further optimization at 10^12 scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, a: str, b: str) -> DataFrame:
    return (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min(N(u) ∪ {u})."""
    sym = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; connect N(u) ∪ {u} to the minimum."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    neighbor_edges = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (
        neighbor_edges.unionAll(self_edges)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """-> (conv_id, cluster_id): every node in the edge set labeled with
    its component's minimum node id. Nodes absent from ``edges`` are
    absent here — the pipeline unions singletons back explicitly."""
    cur = _canonical_edges(edges, a, b).localCheckpoint()
    prev_fp = None
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        fp = _edge_fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged: every edge points node -> component root
    members = cur.select(F.col("u").alias("conv_id"), F.col("v").alias("cluster_id"))
    roots = cur.select(F.col("v").alias("conv_id")).distinct().withColumn(
        "cluster_id", F.col("conv_id")
    )
    return (
        members.unionByName(roots)
        .groupBy("conv_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def attach_members(
    clusters: DataFrame, member_edges: DataFrame, rep: str = "rep_id", member: str = "conv_id"
) -> DataFrame:
    """Attach exact-duplicate members (collapsed upstream) to their
    representative's cluster: member -> cluster_id(rep)."""
    rep_clusters = clusters.withColumnRenamed("conv_id", rep)
    return (
        member_edges.join(rep_clusters, rep, "left")
        .select(
            F.col(member).alias("conv_id"),
            F.coalesce("cluster_id", F.col(rep)).alias("cluster_id"),
        )
    )
