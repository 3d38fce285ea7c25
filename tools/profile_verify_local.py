#!/usr/bin/env python
"""Verify-stage iteration profiler (VERDICT r4 ask #3).

Reuses an existing pipeline workdir's checkpoints (docs / signatures /
candidates from tools/profile_pipeline_local.py), re-runs ONLY the
verify stage with event logs on, and prints wall + shuffle bytes plus a
content hash of the verified table so restructurings can prove
byte-identical output.

Usage: profile_verify_local.py WORKDIR [N_CORES]
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
    workdir = sys.argv[1]
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    evdir = "/tmp/cdr_verify_eventlogs"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir)
    shutil.rmtree(os.path.join(workdir, "verified"), ignore_errors=True)

    from pyspark.sql import functions as F
    from pyspark.sql import SparkSession

    from comparador_de_registros_spark.operators.pipeline import DedupPipeline
    from comparador_de_registros_spark.plans.configs import DedupConfig
    from comparador_de_registros_spark.sources.catalog import ParquetCatalog

    spark = (
        SparkSession.builder.master(f"local[{n_cores}]")
        .appName("cdr-verify-profile")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .getOrCreate()
    )
    pipe = DedupPipeline(
        catalog=ParquetCatalog(workdir),
        cfg=DedupConfig(),
        run_id="vprofile",
        metrics_mode="deferred",
    )
    t0 = time.time()
    pipe.stage_verify(spark)
    t1 = time.time()
    ver = pipe.catalog.read(spark, "verified")
    digest = (
        ver.select(
            F.bit_xor(
                F.xxhash64(
                    "a",
                    "b",
                    F.round("jaccard", 9),
                    "contained",
                    "overlap",
                    "is_dup",
                    F.to_json(F.col("sources")),
                )
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_dup").cast("long")).alias("dups"),
        )
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "verify_sec": round(t1 - t0, 1),
                "rows": digest["n"],
                "dups": digest["dups"],
                "content_hash": digest["h"],
            }
        ),
        flush=True,
    )
    spark.stop()
    wins = {"verify": [t0, t1]}
    logs = sorted(glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    log = logs[-1]
    if os.path.isdir(log):
        log = sorted(glob.glob(os.path.join(log, "events_*")))[-1]
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "analyze_eventlog.py"),
            log,
            json.dumps(wins),
            str(n_cores),
        ],
        check=True,
    )


if __name__ == "__main__":
    main()
