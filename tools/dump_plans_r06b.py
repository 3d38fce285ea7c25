#!/usr/bin/env python
"""Dump .explain("formatted") plans for the round-6 SECOND-pass touched
queries (minhash_dup_pairs, doc_dedup_clusters).

Usage: python tools/dump_plans_r06b.py <repo_root> <out_dir> <suffix> [sf_dir]

Same worktree convention as dump_plans_r06.py: point <repo_root> at a
checkout of the tree whose plans you want. The PRE-checkpoint frames
are explained (the public query frames are localCheckpoint scans).
"""
import os
import sys

REPO = os.path.abspath(sys.argv[1])
OUT = os.path.abspath(sys.argv[2])
SUFFIX = sys.argv[3]
SF_DIR = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from comparador_de_registros_spark.conf import build_spark  # noqa: E402
from comparador_de_registros_spark.plans.configs import DedupConfig  # noqa: E402
from comparador_de_registros_spark.operators import doc_dedup  # noqa: E402
from comparador_de_registros_spark.operators.cluster import (  # noqa: E402
    connected_components,
)
from pyspark.sql import functions as F  # noqa: E402

os.makedirs(OUT, exist_ok=True)
spark = build_spark(app_name=f"plans-{SUFFIX}", master="local[32]")


def fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def dump(name: str, df) -> None:
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(f"# {name} ({SUFFIX}) @ {SF_DIR}\n\n")
        f.write(fmt(df))
    print(f"dumped {name}_{SUFFIX}", flush=True)


docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
verified = doc_dedup.signature_dup_pairs(docs, DedupConfig())
dump(
    "minhash_dup_pairs",
    verified.where("is_dup").select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        "jaccard",
    ),
)
edges = verified.where("is_dup").select("a", "b")
comp = connected_components(edges)
dump(
    "doc_dedup_clusters",
    docs.select(F.col("doc_id").cast("string").alias("conv_id"))
    .join(comp, "conv_id", "left")
    .select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.coalesce("cluster_id", F.col("conv_id")).cast("long").alias(
            "cluster_id"
        ),
    ),
)
doc_dedup.release_signature_run(verified)
spark.stop()
