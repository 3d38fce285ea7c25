#!/usr/bin/env python
"""Dump .explain("formatted") plans for the round-6 touched queries.

Usage: python tools/dump_plans_r06.py <repo_root> <out_dir> <suffix> [sf_dir]

Runs each touched query's DataFrame construction against <repo_root>'s
package (so the same script can dump plans for the round-start tree via
a git worktree) and writes <out_dir>/<query>_<suffix>.txt.
For the signature queries the PRE-checkpoint verified frame is
explained (the checkpointed public frame is just a cache scan).
"""
import os
import sys

REPO = os.path.abspath(sys.argv[1])
OUT = os.path.abspath(sys.argv[2])
SUFFIX = sys.argv[3]
SF_DIR = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf1.0"
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from comparador_de_registros_spark.conf import build_spark  # noqa: E402
from comparador_de_registros_spark.plans.configs import DedupConfig  # noqa: E402
from comparador_de_registros_spark.operators import doc_dedup  # noqa: E402
from comparador_de_registros_spark.queries import QUERIES  # noqa: E402
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
doc_dedup.release_signature_run(verified)

for q in (
    "cosine_topk",
    "ivf_topk",
    "ivf_topk_indexed",
    "embedding_near_pairs",
    "padroniza_token_freq",
    "compare_names_basic",
):
    dump(q, QUERIES[q](spark, SF_DIR))

spark.stop()
