#!/usr/bin/env python
"""Per-stage wall-clock of the transcript pipeline at bench scale,
under the bench protocol (warmup pass first, deferred metrics).
Usage: python tools/profile_pipeline_stages.py [n_base]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import functions as F

from comparador_de_registros_spark.conf import build_spark
from comparador_de_registros_spark.operators.pipeline import DedupPipeline, STAGES
from comparador_de_registros_spark.plans.configs import DedupConfig
from comparador_de_registros_spark.sources.catalog import ParquetCatalog
from comparador_de_registros_spark.sources import transcripts as tg

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
CACHE = os.path.join(REPO, ".bench_cache")


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
        app_name="profile-stages", master="local[32]", extra_conf=extra
    )
    path = os.path.join(CACHE, f"transcripts_{N_BASE}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spec = tg.TranscriptSpec(n_base=N_BASE, seed=42)
        tg.generate_transcripts(spark, spec).write.mode("overwrite").parquet(path)
    turns = spark.read.parquet(path)

    warm_dir = os.path.join(CACHE, f"prof_warm_{os.getpid()}")
    shutil.rmtree(warm_dir, ignore_errors=True)
    DedupPipeline(
        catalog=ParquetCatalog(warm_dir), cfg=DedupConfig(),
        run_id="warm", metrics_mode="deferred",
    ).run(spark, turns.where(F.crc32(F.col("conv_id")) % 20 == 0))
    shutil.rmtree(warm_dir, ignore_errors=True)

    workdir = os.path.join(CACHE, f"prof_{N_BASE}_{os.getpid()}")
    shutil.rmtree(workdir, ignore_errors=True)
    pipe = DedupPipeline(
        catalog=ParquetCatalog(workdir), cfg=DedupConfig(),
        run_id="prof", metrics_mode="deferred",
    )
    total0 = time.time()
    for stage in STAGES:
        spark.sparkContext.setJobDescription(f"stage:{stage}")
        t0 = time.time()
        pipe.run(spark, turns, stages=(stage,))
        print(f"{stage}: {time.time()-t0:.2f}s", flush=True)
    clusters = pipe.run(spark, turns, stages=(), resume=True)
    t0 = time.time()
    n = clusters.select("cluster_id").distinct().count()
    print(f"final-distinct-count: {time.time()-t0:.2f}s ({n} clusters)", flush=True)
    print(f"TOTAL: {time.time()-total0:.2f}s", flush=True)
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
