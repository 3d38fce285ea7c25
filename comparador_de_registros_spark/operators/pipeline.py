"""End-to-end dedup pipeline: assemble -> exact -> sign -> candidates ->
verify -> cluster, with per-stage catalog checkpoints, metrics, and
resume (north_rule: resumable from checkpoint with per-partition
lineage + metrics).

Stage graph (each stage reads only its upstream checkpoint tables):

  turns ─ assemble ─> docs(conv_id, doc, norm, doc_hash, n_turns, n_chars)
  docs ── exact ────> exact_map(conv_id, rep_id, doc_hash)
                      (reads only the pruned (conv_id, doc_hash) columns)
  docs ── sign ─────> signatures (reps only — exact-dup collapse is the
                      first skew guard: identical boilerplate never
                      reaches LSH)
  signatures ─ candidates ─> candidates(a, b, sources) + dropped buckets
  candidates ─ verify ─> verified(a, b, jaccard, contained, is_dup)
  verified + exact_map ─ cluster ─> clusters(conv_id, cluster_id)

Resume semantics: a stage with an existing ``_SUCCESS``-marked output is
skipped (``resume=True``), so a killed run restarts at the first
incomplete stage. Metrics are collected with the Observation API —
piggybacked on the checkpoint write job itself, zero extra actions —
and appended to the ``metrics`` table keyed by (run_id, stage); every
write also records per-PARTITION lineage (one row per output file with
row/byte counts, answered from parquet footers / the Iceberg ``.files``
metadata table) into the ``lineage`` table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from comparador_de_registros_spark.operators import lsh as lsh_ops
from comparador_de_registros_spark.operators.assembly import (
    assemble_conversations,
    normalize_doc_col,
)
from comparador_de_registros_spark.operators.cluster import connected_components
from comparador_de_registros_spark.operators.signatures import (
    compute_signatures,
    scan_is_narrow,
)
from comparador_de_registros_spark.operators.verify import (
    release_scored,
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
T_LINEAGE = "lineage"
T_IDMAP = "id_map"


def _count_if(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0))


_LINEAGE_COLS = ["run_id", "stage", "table", "file", "n_rows", "n_bytes", "logged_at"]


@dataclass
class DedupPipeline:
    catalog: Catalog
    cfg: DedupConfig = field(default_factory=DedupConfig)
    run_id: str = "run0"
    # "immediate": one metrics table write per stage (crash-safe — a
    # killed run keeps every finished stage's metrics). "deferred":
    # buffer and flush ONE table at the end of run() — drops 6 tiny
    # Spark jobs of fixed scheduling cost from the timed path; used by
    # the scaling bench where per-stage crash metrics don't matter.
    metrics_mode: str = "immediate"
    _pending_metrics: list = field(default_factory=list, repr=False)
    _pending_lineage: list = field(default_factory=list, repr=False)

    # --- helpers -------------------------------------------------------------

    def _write_observed(
        self,
        spark: SparkSession,
        df: DataFrame,
        table: str,
        stage: str,
        metric_cols: dict[str, Column],
        repartition_by: str | None = None,
        num_files: int | None = None,
    ) -> None:
        """Write a stage output with metrics observed during the SAME
        job (no extra actions), then persist the metrics row."""
        obs = Observation(f"{self.run_id}_{stage}")
        df = df.observe(
            obs, *[c.alias(name) for name, c in metric_cols.items()]
        )
        if repartition_by is not None:
            # EXPLICIT partition count: a bare repartition(col) is
            # AQE-coalescible, which shrank checkpoint tables to a
            # handful of fat files — the downstream scan then ran fewer
            # tasks than executor cores (measured: the sign stage got 9
            # tasks, one straggler wave at 8 executors). An explicit
            # count is exempt from AQE coalescing.
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
            df = df.repartition(n_part, repartition_by)
        self.catalog.write(df, table, num_files=num_files)
        metrics = {k: float(v if v is not None else 0) for k, v in obs.get.items()}
        self._log_metrics(spark, stage, metrics)
        self._log_lineage(spark, stage, table)

    def _log_metrics(self, spark: SparkSession, stage: str, rows: dict[str, float]):
        data = [
            (self.run_id, stage, k, float(v), time.time()) for k, v in rows.items()
        ]
        if self.metrics_mode == "deferred":
            self._pending_metrics.extend(data)
            return
        df = spark.createDataFrame(
            data, ["run_id", "stage", "metric", "value", "logged_at"]
        )
        name = f"{T_METRICS}/{self.run_id}_{stage}"
        self.catalog.write(df, name, num_files=1)

    def _log_lineage(self, spark: SparkSession, stage: str, table: str) -> None:
        """Per-partition lineage: one row per output file with its row
        and byte counts, answered from table METADATA (parquet footers
        / the Iceberg .files table) — the checkpoint write is never
        re-scanned. north_rule: "per-partition lineage + metrics"."""
        data = [
            (self.run_id, stage, table, f, int(rows), int(size), time.time())
            for f, rows, size in self.catalog.partition_lineage(table)
        ]
        if self.metrics_mode == "deferred":
            self._pending_lineage.extend(data)
            return
        if not data:
            return
        df = spark.createDataFrame(data, _LINEAGE_COLS)
        self.catalog.write(
            df, f"{T_LINEAGE}/{self.run_id}_{stage}_{table.replace('/', '_')}",
            num_files=1,
        )

    def flush_metrics(self, spark: SparkSession) -> None:
        """Write buffered (deferred-mode) metric + lineage rows, one
        table each."""
        if self._pending_metrics:
            df = spark.createDataFrame(
                self._pending_metrics,
                ["run_id", "stage", "metric", "value", "logged_at"],
            )
            self.catalog.write(df, f"{T_METRICS}/{self.run_id}_all", num_files=1)
            self._pending_metrics = []
        if self._pending_lineage:
            df = spark.createDataFrame(self._pending_lineage, _LINEAGE_COLS)
            self.catalog.write(df, f"{T_LINEAGE}/{self.run_id}_all", num_files=1)
            self._pending_lineage = []

    # --- stages ------------------------------------------------------------

    def stage_assemble(self, spark: SparkSession, turns: DataFrame) -> None:
        # doc_hash is computed HERE, in the same pass that materializes
        # norm, and stored as a docs column: the exact stage then reads
        # a pruned (conv_id, doc_hash) scan instead of re-reading and
        # re-hashing the fat norm text — at 35.4M turns the exact stage
        # was ~80 s of mostly re-ingesting the 17 GB docs table, a
        # fixed-cost barrier tail the round-4 scaling adjudication
        # flagged (VERDICT r4 ask #4).
        docs = (
            assemble_conversations(turns, max_turns=self.cfg.max_turns_per_conv)
            .withColumn("norm", normalize_doc_col(F.col("doc")))
            .withColumn("doc_hash", F.sha2(F.col("norm"), 256))
        )
        metric_cols = {
            "n_docs": F.count(F.lit(1)),
            "n_turns": F.sum("n_turns"),
            "sum_chars": F.sum("n_chars"),
        }
        if self.cfg.max_turns_per_conv is not None:
            metric_cols["n_truncated_convs"] = _count_if(F.col("truncated"))
        # explicit partitioning: spread by conv_id hash for even Arrow
        # batches downstream
        self._write_observed(
            spark,
            docs,
            T_DOCS,
            "assemble",
            metric_cols,
            repartition_by="conv_id",
        )

    def stage_exact(self, spark: SparkSession) -> None:
        docs = self.catalog.read(spark, T_DOCS)
        if "doc_hash" not in docs.columns:
            # stale-checkpoint migration guard (same shape as the
            # streaming legacy-layout error): a docs table checkpointed
            # before doc_hash moved into the assemble stage cannot feed
            # the pruned exact scan — fail with the cause and the fix
            # instead of an opaque AnalysisException
            raise ValueError(
                f"docs checkpoint {T_DOCS!r} ({self.catalog!r}) has no "
                "doc_hash column — it was written by a pre-round-5 "
                "assemble stage. Re-run the assemble stage (drop the "
                "docs table or run without resume=True) to migrate."
            )
        # pruned scan: only (conv_id, doc_hash) leave the parquet
        # footerstore — the norm/doc text columns are never read here
        hashed = docs.select("conv_id", "doc_hash")
        reps = hashed.groupBy("doc_hash").agg(F.min("conv_id").alias("rep_id"))
        exact_map = hashed.join(reps, "doc_hash").select(
            "conv_id", "rep_id", "doc_hash"
        )
        self._write_observed(
            spark,
            exact_map,
            T_EXACT,
            "exact",
            {
                "n_reps": _count_if(F.col("conv_id") == F.col("rep_id")),
                "n_exact_members": _count_if(F.col("conv_id") != F.col("rep_id")),
            },
        )

    # --- int64 id dictionary (cfg.encode_ids) ---------------------------

    def _write_id_map(self, spark: SparkSession) -> None:
        """Per-run dictionary conv_id(string) -> id(int64), covering
        every doc. Ids are unique by construction
        (``monotonically_increasing_id`` = partition id << 33 | local
        counter) and become DETERMINISTIC the moment the table is
        written: every later stage joins this one checkpoint, and the
        cluster output is re-canonicalized to min-conv_id string labels
        so nothing downstream depends on the particular id values."""
        docs = self.catalog.read(spark, T_DOCS)
        id_map = docs.select("conv_id").withColumn(
            "id", F.monotonically_increasing_id()
        )
        self.catalog.write(id_map, T_IDMAP)

    def _id_map(self, spark: SparkSession) -> DataFrame:
        return self.catalog.read(spark, T_IDMAP)

    @staticmethod
    def _encode_col(df: DataFrame, id_map: DataFrame, col: str) -> DataFrame:
        """Replace string id column ``col`` with its int64 encoding."""
        m = id_map.select(
            F.col("conv_id").alias(col), F.col("id").alias(f"__{col}_enc")
        )
        return (
            df.join(m, col)
            .drop(col)
            .withColumnRenamed(f"__{col}_enc", col)
        )

    def stage_sign(self, spark: SparkSession) -> None:
        docs = self.catalog.read(spark, T_DOCS)
        exact_map = self.catalog.read(spark, T_EXACT)
        if self.cfg.encode_ids:
            # written BEFORE signatures: the signatures _SUCCESS marker
            # is the sign stage's resume point, so its presence implies
            # the id dictionary exists too
            self._write_id_map(spark)
        reps = docs.join(
            exact_map.where(F.col("conv_id") == F.col("rep_id")).select("rep_id"),
            docs["conv_id"] == F.col("rep_id"),
            "left_semi",
        )
        # The parquet scan packs small files into few input splits
        # (maxPartitionBytes coalescing), so at small scale the docs
        # table's 32-file layout can come back as 2-3 partitions and the
        # Arrow signing kernel — the most CPU-heavy map of the pipeline
        # — runs nearly serial (profiled: one 12s straggler task doing
        # the whole corpus). Spread it back out ONLY when the scan is
        # narrower than the TOTAL CORE COUNT (defaultParallelism — the
        # quantity that decides whether the kernel keeps every core
        # busy; comparing against shuffle partitions would add a
        # useless full-docs shuffle on clusters whose scan already
        # exceeds their cores). At production scale the scan yields
        # >= thousands of splits and no shuffle happens.
        cores = spark.sparkContext.defaultParallelism
        if scan_is_narrow(spark, docs, cores):
            n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
            reps = reps.repartition(n_part, "conv_id")
        sigs = compute_signatures(reps, self.cfg)
        # no repartition below: the docs table is already spread by
        # conv_id and mapInPandas preserves partitioning — an extra
        # shuffle would move the fattest table of the pipeline twice
        self._write_observed(
            spark,
            sigs,
            T_SIGN,
            "sign",
            {
                "n_signed": F.count(F.lit(1)),
                "avg_shingles": F.avg("n_shingles"),
            },
        )

    def stage_candidates(self, spark: SparkSession) -> None:
        sigs = self.catalog.read(spark, T_SIGN)
        if self.cfg.encode_ids:
            sigs = self._encode_col(sigs, self._id_map(spark), "conv_id")
        cand, dropped, buckets = lsh_ops.unified_candidates(
            sigs,
            self.cfg.lsh,
            self.cfg.simhash if self.cfg.use_simhash else None,
            self.cfg.use_substring,
        )
        # the candidates and dropped-buckets writes are two actions over
        # the same grouped bucket table; persist it so the big
        # explode->groupBy shuffle runs once, not twice
        buckets.persist()
        metric_cols = {
            "n_candidates": F.count(F.lit(1)),
            "n_candidates_lsh": _count_if(F.array_contains("sources", "lsh")),
        }
        if self.cfg.use_simhash:
            metric_cols["n_candidates_simhash"] = _count_if(
                F.array_contains("sources", "simhash")
            )
        if self.cfg.use_substring:
            metric_cols["n_candidates_substring"] = _count_if(
                F.array_contains("sources", "substring")
            )
        try:
            # materialize the shared bucket cache once, then run the two
            # independent checkpoint writes as CONCURRENT jobs (guide
            # §2.6: actions are only sequential because the driver calls
            # them sequentially); the dropped-buckets write back-fills
            # executors freed by the candidates write's tail. Metric/
            # lineage buffering is append-only, so deferred mode is
            # thread-safe; each write carries its own Observation.
            buckets.count()
            from concurrent.futures import ThreadPoolExecutor

            def _w_cand():
                self._write_observed(
                    spark, cand, T_CAND, "candidates", metric_cols
                )

            def _w_dropped():
                self._write_observed(
                    spark,
                    dropped,
                    T_DROPPED,
                    "candidates_dropped",
                    {
                        "n_dropped_buckets": F.count(F.lit(1)),
                        "n_dropped_members": F.coalesce(
                            F.sum("sz"), F.lit(0)
                        ),
                    },
                    num_files=1,
                )

            with ThreadPoolExecutor(max_workers=2) as pool:
                futs = [pool.submit(_w_cand), pool.submit(_w_dropped)]
                for f in futs:
                    f.result()
        finally:
            buckets.unpersist()

    def stage_verify(self, spark: SparkSession) -> None:
        cand = self.catalog.read(spark, T_CAND)
        sigs = self.catalog.read(spark, T_SIGN)
        docs = self.catalog.read(spark, T_DOCS)
        if self.cfg.encode_ids:
            id_map = self._id_map(spark)
            sigs = self._encode_col(sigs, id_map, "conv_id")
            docs = self._encode_col(
                docs.select("conv_id", "norm"), id_map, "conv_id"
            )
        # the candidate-pair count is free from the checkpoint's parquet
        # footers (lineage metadata, no scan) and unlocks verify's
        # small/medium plans — at bench scale the large shared-exchange
        # plan's fixed jobs (participant distinct + semi-join + explicit
        # repartitions) dominate the stage
        n_cand = sum(
            rows for _f, rows, _b in self.catalog.partition_lineage(T_CAND)
        )
        verified = verify_pairs(cand, sigs, docs, self.cfg, n_candidates=n_cand)
        try:
            self._write_observed(
                spark,
                verified,
                T_VERIFIED,
                "verify",
                {
                    "n_verified_dups": _count_if(F.col("is_dup")),
                    "n_rejected": _count_if(~F.col("is_dup")),
                },
            )
        finally:
            release_scored(verified)

    def stage_cluster(self, spark: SparkSession) -> None:
        verified = self.catalog.read(spark, T_VERIFIED)
        exact_map = self.catalog.read(spark, T_EXACT)
        docs = self.catalog.read(spark, T_DOCS)

        dup_edges = verified.where("is_dup").select("a", "b")
        member_edges = exact_map.where(F.col("conv_id") != F.col("rep_id")).select(
            F.col("conv_id").alias("a"), F.col("rep_id").alias("b")
        )
        doc_ids = docs.select("conv_id")
        id_map = None
        if self.cfg.encode_ids:
            # member edges + singleton universe to int64; dup_edges are
            # already encoded (the candidates stage emitted long ids)
            id_map = self._id_map(spark)
            member_edges = self._encode_col(
                self._encode_col(member_edges, id_map, "a"), id_map, "b"
            )
            doc_ids = self._encode_col(doc_ids, id_map, "conv_id")
        edges = dup_edges.unionByName(member_edges)
        comp = connected_components(edges)
        clusters = (
            doc_ids
            .join(comp, "conv_id", "left")
            .select(
                "conv_id",
                F.coalesce("cluster_id", F.col("conv_id")).alias("cluster_id"),
            )
        )
        if self.cfg.encode_ids:
            # decode + re-canonicalize: label every cluster with its
            # MINIMUM conv_id STRING, making the output bit-identical to
            # the unencoded path (and independent of the run-specific id
            # dictionary). Two small shuffles over the slim clusters
            # table only.
            named = clusters.join(
                id_map.select("id", F.col("conv_id").alias("__s")),
                clusters["conv_id"] == F.col("id"),
            ).select(F.col("__s").alias("conv_id"), "cluster_id")
            labels = named.groupBy("cluster_id").agg(
                F.min("conv_id").alias("__label")
            )
            clusters = named.join(labels, "cluster_id").select(
                "conv_id", F.col("__label").alias("cluster_id")
            )
        self._write_observed(
            spark,
            clusters,
            T_CLUSTERS,
            "cluster",
            {
                "n_clustered_convs": F.count(F.lit(1)),
                # min-label CC: exactly one root (cluster_id == conv_id)
                # per cluster, so this counts clusters without a distinct
                "n_clusters": _count_if(F.col("cluster_id") == F.col("conv_id")),
            },
            repartition_by="cluster_id",
        )

    # --- driver ------------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        turns: DataFrame | None = None,
        stages: tuple[str, ...] = STAGES,
        resume: bool = False,
    ) -> DataFrame | None:
        """Run (a suffix of) the pipeline; returns the clusters table if
        it exists afterwards.

        ``resume=True`` skips stages whose checkpoint already exists —
        stage outputs are idempotent whole-table writes, so restart
        granularity is the stage (SURVEY.md §2.10/§4)."""
        outputs = {
            "assemble": T_DOCS,
            "exact": T_EXACT,
            "sign": T_SIGN,
            "candidates": T_CAND,
            "verify": T_VERIFIED,
            "cluster": T_CLUSTERS,
        }
        runners = {
            "exact": self.stage_exact,
            "sign": self.stage_sign,
            "candidates": self.stage_candidates,
            "verify": self.stage_verify,
            "cluster": self.stage_cluster,
        }
        for stage in stages:
            if resume and self.catalog.exists(outputs[stage]):
                continue
            if stage == "assemble":
                if turns is None:
                    raise ValueError("assemble stage requires the turns DataFrame")
                self.stage_assemble(spark, turns)
            elif stage in runners:
                runners[stage](spark)
            else:
                raise ValueError(f"unknown stage {stage}")
        # deferred metrics flush once, when the final stage has run (a
        # stage-at-a-time driver flushes on its last run() call)
        if self.metrics_mode == "deferred" and "cluster" in stages:
            self.flush_metrics(spark)
        if self.catalog.exists(T_CLUSTERS):
            return self.catalog.read(spark, T_CLUSTERS)
        return None
