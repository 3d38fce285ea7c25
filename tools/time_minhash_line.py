#!/usr/bin/env python
"""Cold timing of the bench's exact minhash_dup_pairs line (frozen
bench.py sequence: signature_dup_pairs -> persist -> is_dup count),
with optional event log. Usage: python tools/time_minhash_line.py [sf_dir]
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
    spark = build_spark(
        app_name="minhash-line", master="local[32]", extra_conf=extra
    )
    from comparador_de_registros_spark.operators import doc_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    verified = doc_dedup.signature_dup_pairs(docs, DedupConfig()).persist()
    n_pairs = verified.where("is_dup").count()
    print(f"minhash_dup_pairs: {time.time()-t0:.2f}s ({n_pairs} rows)",
          flush=True)
    verified.unpersist()
    doc_dedup.release_signature_run(verified)
    spark.stop()


if __name__ == "__main__":
    main()
