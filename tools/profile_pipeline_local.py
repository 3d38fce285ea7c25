#!/usr/bin/env python
"""Quick local[N] pipeline profile: per-stage wall + shuffle bytes.

Iteration loop for shuffle-structure work (VERDICT r4 ask #3): runs the
full dedup pipeline on a pre-generated transcripts parquet under
local[N] with event logs on, prints the per-stage table from
tools/analyze_eventlog.py, and reports clusters for an output-identity
check. Not a benchmark — no pinning, shared JVM; use bench_scaling.py
for gate numbers.

Usage: profile_pipeline_local.py TURNS_PATH [WORKDIR] [N_CORES]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    turns_path = sys.argv[1]
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cdr_profile_work"
    n_cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    evdir = "/tmp/cdr_profile_eventlogs"
    shutil.rmtree(workdir, ignore_errors=True)
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)

    from pyspark.sql import SparkSession

    from comparador_de_registros_spark.operators.pipeline import (
        STAGES,
        DedupPipeline,
    )
    from comparador_de_registros_spark.plans.configs import DedupConfig
    from comparador_de_registros_spark.sources.catalog import ParquetCatalog

    spark = (
        SparkSession.builder.master(f"local[{n_cores}]")
        .appName("cdr-profile")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    turns = spark.read.parquet(turns_path)
    pipe = DedupPipeline(
        catalog=ParquetCatalog(workdir),
        cfg=DedupConfig(),
        run_id="profile",
        metrics_mode="deferred",
    )
    stage_win = {}
    t0 = time.time()
    for st in STAGES:
        t1 = time.time()
        pipe.run(spark, turns, stages=(st,))
        stage_win[st] = [t1, time.time()]
    clusters = pipe.run(spark, turns, stages=(), resume=True)
    n_clusters = clusters.where("cluster_id = conv_id").count()
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "sec": round(elapsed, 1),
                "n_clusters": n_clusters,
                "stage_sec": {
                    k: round(v[1] - v[0], 1) for k, v in stage_win.items()
                },
            }
        )
    )
    spark.stop()
    logs = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "analyze_eventlog.py"),
            logs[-1],
            json.dumps(stage_win),
            str(n_cores),
        ],
        check=True,
    )


if __name__ == "__main__":
    main()
