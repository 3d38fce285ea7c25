"""End-to-end dedup pipeline: assemble -> exact -> sign -> candidates ->
verify -> cluster, with per-stage catalog checkpoints, metrics, and
resume (north_rule: resumable from checkpoint with per-partition
lineage + metrics).

Stage graph (each stage reads only its upstream checkpoint tables):

  turns ─ assemble ─> docs(conv_id, doc, norm, n_turns, n_chars)
  docs ── exact ────> exact_map(conv_id, rep_id, doc_hash)
  docs ── sign ─────> signatures (reps only — exact-dup collapse is the
                      first skew guard: identical boilerplate never
                      reaches LSH)
  signatures ─ candidates ─> candidates(a, b, sources) + dropped buckets
  candidates ─ verify ─> verified(a, b, jaccard, contained, is_dup)
  verified + exact_map ─ cluster ─> clusters(conv_id, cluster_id)

Resume semantics: a stage with an existing ``_SUCCESS``-marked output is
skipped (``resume=True``), so a killed run restarts at the first
incomplete stage. Metrics rows are appended to the ``metrics`` table
keyed by (run_id, stage).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comparador_de_registros_spark.operators import lsh as lsh_ops
from comparador_de_registros_spark.operators.assembly import (
    assemble_conversations,
    normalize_doc_col,
)
from comparador_de_registros_spark.operators.cluster import connected_components
from comparador_de_registros_spark.operators.signatures import compute_signatures
from comparador_de_registros_spark.operators.verify import (
    union_candidates,
    verify_pairs,
)
from comparador_de_registros_spark.plans.configs import DedupConfig
from comparador_de_registros_spark.sources.catalog import Catalog

STAGES = ("assemble", "exact", "sign", "candidates", "verify", "cluster")

T_DOCS = "docs"
T_EXACT = "exact_map"
T_SIGN = "signatures"
T_CAND = "candidates"
T_DROPPED = "dropped_buckets"
T_VERIFIED = "verified"
T_CLUSTERS = "clusters"
T_METRICS = "metrics"


@dataclass
class DedupPipeline:
    catalog: Catalog
    cfg: DedupConfig = field(default_factory=DedupConfig)
    run_id: str = "run0"

    # --- metrics -----------------------------------------------------------

    def _log_metrics(self, spark: SparkSession, stage: str, rows: dict[str, float]):
        data = [
            (self.run_id, stage, k, float(v), time.time()) for k, v in rows.items()
        ]
        df = spark.createDataFrame(
            data, ["run_id", "stage", "metric", "value", "logged_at"]
        )
        name = f"{T_METRICS}/{self.run_id}_{stage}"
        self.catalog.write(df, name, num_files=1)

    # --- stages ------------------------------------------------------------

    def stage_assemble(self, spark: SparkSession, turns: DataFrame) -> None:
        docs = assemble_conversations(turns).withColumn(
            "norm", normalize_doc_col(F.col("doc"))
        )
        # explicit partitioning: spread by conv_id hash for even Arrow
        # batches downstream
        self.catalog.write(docs.repartition("conv_id"), T_DOCS)
        d = self.catalog.read(spark, T_DOCS)
        self._log_metrics(
            spark,
            "assemble",
            {
                "n_docs": d.count(),
                "n_turns": turns.count(),
            },
        )

    def stage_exact(self, spark: SparkSession) -> None:
        docs = self.catalog.read(spark, T_DOCS)
        hashed = docs.select(
            "conv_id", F.sha2(F.col("norm"), 256).alias("doc_hash")
        )
        reps = hashed.groupBy("doc_hash").agg(F.min("conv_id").alias("rep_id"))
        exact_map = hashed.join(reps, "doc_hash").select(
            "conv_id", "rep_id", "doc_hash"
        )
        self.catalog.write(exact_map, T_EXACT)
        em = self.catalog.read(spark, T_EXACT)
        self._log_metrics(
            spark,
            "exact",
            {
                "n_reps": em.select("rep_id").distinct().count(),
                "n_exact_members": em.where(F.col("conv_id") != F.col("rep_id")).count(),
            },
        )

    def stage_sign(self, spark: SparkSession) -> None:
        docs = self.catalog.read(spark, T_DOCS)
        exact_map = self.catalog.read(spark, T_EXACT)
        reps = docs.join(
            exact_map.where(F.col("conv_id") == F.col("rep_id")).select("rep_id"),
            docs["conv_id"] == F.col("rep_id"),
            "left_semi",
        )
        sigs = compute_signatures(reps, self.cfg)
        self.catalog.write(sigs.repartition("conv_id"), T_SIGN)
        s = self.catalog.read(spark, T_SIGN)
        self._log_metrics(
            spark,
            "sign",
            {
                "n_signed": s.count(),
                "avg_shingles": s.agg(F.avg("n_shingles")).collect()[0][0] or 0.0,
            },
        )

    def stage_candidates(self, spark: SparkSession) -> None:
        sigs = self.catalog.read(spark, T_SIGN)
        lsh_pairs, lsh_drop = lsh_ops.minhash_lsh_candidates(sigs, self.cfg.lsh)
        parts = [lsh_pairs]
        drops = [lsh_drop.withColumn("generator", F.lit("lsh")).select("sz", "generator")]
        if self.cfg.use_simhash:
            sim_pairs, sim_drop = lsh_ops.simhash_candidates(
                sigs, self.cfg.simhash, self.cfg.lsh.max_bucket_size
            )
            parts.append(sim_pairs)
            drops.append(
                sim_drop.withColumn("generator", F.lit("simhash")).select(
                    "sz", "generator"
                )
            )
        if self.cfg.use_substring:
            sub_pairs, sub_drop = lsh_ops.substring_candidates(
                sigs, self.cfg.lsh.max_bucket_size
            )
            parts.append(sub_pairs)
            drops.append(
                sub_drop.withColumn("generator", F.lit("substring")).select(
                    "sz", "generator"
                )
            )
        cand = union_candidates(*parts)
        self.catalog.write(cand, T_CAND)
        dropped = drops[0]
        for d in drops[1:]:
            dropped = dropped.unionByName(d)
        self.catalog.write(dropped, T_DROPPED, num_files=1)

        c = self.catalog.read(spark, T_CAND)
        dr = self.catalog.read(spark, T_DROPPED)
        metrics = {"n_candidates": c.count()}
        for r in (
            c.select(F.explode("sources").alias("s")).groupBy("s").count().collect()
        ):
            metrics[f"n_candidates_{r['s']}"] = r["count"]
        for r in dr.groupBy("generator").agg(F.count("*").alias("n")).collect():
            metrics[f"n_dropped_buckets_{r['generator']}"] = r["n"]
        self._log_metrics(spark, "candidates", metrics)

    def stage_verify(self, spark: SparkSession) -> None:
        cand = self.catalog.read(spark, T_CAND)
        sigs = self.catalog.read(spark, T_SIGN)
        docs = self.catalog.read(spark, T_DOCS)
        verified = verify_pairs(cand, sigs, docs, self.cfg)
        self.catalog.write(verified, T_VERIFIED)
        v = self.catalog.read(spark, T_VERIFIED)
        self._log_metrics(
            spark,
            "verify",
            {
                "n_verified_dups": v.where("is_dup").count(),
                "n_rejected": v.where(~F.col("is_dup")).count(),
            },
        )

    def stage_cluster(self, spark: SparkSession) -> None:
        verified = self.catalog.read(spark, T_VERIFIED)
        exact_map = self.catalog.read(spark, T_EXACT)
        docs = self.catalog.read(spark, T_DOCS)

        dup_edges = verified.where("is_dup").select("a", "b")
        member_edges = exact_map.where(F.col("conv_id") != F.col("rep_id")).select(
            F.col("conv_id").alias("a"), F.col("rep_id").alias("b")
        )
        edges = dup_edges.unionByName(member_edges)
        comp = connected_components(edges)
        clusters = (
            docs.select("conv_id")
            .join(comp, "conv_id", "left")
            .select(
                "conv_id",
                F.coalesce("cluster_id", F.col("conv_id")).alias("cluster_id"),
            )
        )
        self.catalog.write(clusters.repartition("cluster_id"), T_CLUSTERS)
        cl = self.catalog.read(spark, T_CLUSTERS)
        self._log_metrics(
            spark,
            "cluster",
            {
                "n_clusters": cl.select("cluster_id").distinct().count(),
                "n_clustered_convs": cl.count(),
                "n_nonsingleton_members": cl.groupBy("cluster_id")
                .count()
                .where("count > 1")
                .agg(F.coalesce(F.sum("count"), F.lit(0)))
                .collect()[0][0],
            },
        )

    # --- driver ------------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        turns: DataFrame | None = None,
        stages: tuple[str, ...] = STAGES,
        resume: bool = False,
    ) -> DataFrame:
        """Run (a suffix of) the pipeline; returns the clusters table.

        ``resume=True`` skips stages whose checkpoint already exists —
        the anti-join-free variant of resume: stage outputs are
        idempotent whole-table writes, so restart granularity is the
        stage (SURVEY.md §2.10/§4)."""
        outputs = {
            "assemble": T_DOCS,
            "exact": T_EXACT,
            "sign": T_SIGN,
            "candidates": T_CAND,
            "verify": T_VERIFIED,
            "cluster": T_CLUSTERS,
        }
        for stage in stages:
            if resume and self.catalog.exists(outputs[stage]):
                continue
            if stage == "assemble":
                if turns is None:
                    raise ValueError("assemble stage requires the turns DataFrame")
                self.stage_assemble(spark, turns)
            elif stage == "exact":
                self.stage_exact(spark)
            elif stage == "sign":
                self.stage_sign(spark)
            elif stage == "candidates":
                self.stage_candidates(spark)
            elif stage == "verify":
                self.stage_verify(spark)
            elif stage == "cluster":
                self.stage_cluster(spark)
            else:
                raise ValueError(f"unknown stage {stage}")
        if self.catalog.exists(T_CLUSTERS):
            return self.catalog.read(spark, T_CLUSTERS)
        return None
