#!/usr/bin/env python
"""Cold-session profile of the bench's minhash_dup_pairs line: replays
run_dedup_shared's exact sequence in a fresh session with an event log
and per-phase job labels, then prints the wall clock of each phase.
Usage: PROF_EVENTLOG_DIR=/tmp/evlog python tools/profile_minhash_cold.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from comparador_de_registros_spark.conf import build_spark
from comparador_de_registros_spark.plans.configs import DedupConfig

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    log_dir = os.environ.get("PROF_EVENTLOG_DIR")
    extra = {}
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    t_start = time.time()
    spark = build_spark(
        app_name="minhash-cold", master="local[32]", extra_conf=extra
    )
    print(f"session-build: {time.time()-t_start:.2f}s", flush=True)

    from pyspark.sql import functions as F

    from comparador_de_registros_spark.operators import doc_dedup, lsh as lsh_ops
    from comparador_de_registros_spark.operators.doc_dedup import _docs_as_convs
    from comparador_de_registros_spark.operators.signatures import (
        compute_signatures,
    )
    from comparador_de_registros_spark.operators.verify import verify_pairs

    cfg = DedupConfig()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sc = spark.sparkContext

    t0 = time.time()
    sc.setJobDescription("phase:prep")
    convs = _docs_as_convs(docs, "doc_id", "text").select("conv_id", "norm")
    if convs.rdd.getNumPartitions() < sc.defaultParallelism:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        convs = convs.repartition(n_part, "conv_id")
    print(f"prep(getNumPartitions): {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    sc.setJobDescription("phase:sign")
    sigs = compute_signatures(convs, cfg).persist()
    n_sigs = sigs.count()
    print(f"sign: {time.time()-t0:.2f}s ({n_sigs} sigs)", flush=True)

    t0 = time.time()
    sc.setJobDescription("phase:candidates")
    cand, _, _ = lsh_ops.unified_candidates(
        sigs, cfg.lsh, cfg.simhash if cfg.use_simhash else None,
        cfg.use_substring,
    )
    cand = cand.persist()
    n_cand = cand.count()
    print(f"candidates: {time.time()-t0:.2f}s ({n_cand} pairs)", flush=True)

    t0 = time.time()
    sc.setJobDescription("phase:verify")
    out = verify_pairs(cand, sigs, convs, cfg, n_candidates=n_cand)
    out._cdr_sigs = sigs
    out._cdr_cand = cand
    verified = out.persist()
    n_dup = verified.where("is_dup").count()
    print(f"verify+count: {time.time()-t0:.2f}s ({n_dup} dups)", flush=True)

    t0 = time.time()
    sc.setJobDescription("phase:cluster")
    from comparador_de_registros_spark.operators.cluster import (
        connected_components,
    )

    edges = verified.where("is_dup").select("a", "b")
    comp = connected_components(edges)
    clusters = (
        docs.select(F.col("doc_id").cast("string").alias("conv_id"))
        .join(comp, "conv_id", "left")
    )
    n_docs = clusters.count()
    print(f"cluster(+): {time.time()-t0:.2f}s ({n_docs} rows)", flush=True)

    verified.unpersist()
    doc_dedup.release_signature_run(verified)
    print(f"TOTAL: {time.time()-t_start:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
