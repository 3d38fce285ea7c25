#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.md protocol).

No real cluster exists in the sandbox, so the north_rule's N -> 4N
executor scaling criterion is evidenced by running the IDENTICAL
pipeline job on the SAME pre-generated input at local[8] and local[32]
(separate JVMs), reporting turns/sec at both and
efficiency = (thr@32 / thr@8) / 4. Results go to BENCH/BASELINE.md.

Usage: python bench_scaling.py [--n-base 12500] [--repeats 1]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from comparador_de_registros_spark.conf import build_spark
from comparador_de_registros_spark.operators.pipeline import DedupPipeline
from comparador_de_registros_spark.plans.configs import DedupConfig
from comparador_de_registros_spark.sources.catalog import ParquetCatalog

cpus = int(sys.argv[1]); turns_path = sys.argv[2]; workdir = sys.argv[3]
spark = build_spark(app_name=f"cdr-scale-{{cpus}}", master=f"local[{{cpus}}]",
                    shuffle_partitions=max(cpus, 8))
turns = spark.read.parquet(turns_path)
n_turns = turns.count()
shutil.rmtree(workdir, ignore_errors=True)
pipe = DedupPipeline(catalog=ParquetCatalog(workdir), cfg=DedupConfig(),
                     run_id=f"scale{{cpus}}")
t0 = time.time()
clusters = pipe.run(spark, turns)
n_clusters = clusters.select("cluster_id").distinct().count()
elapsed = time.time() - t0
print(json.dumps({{"cpus": cpus, "n_turns": n_turns, "sec": elapsed,
                   "turns_per_sec": n_turns / elapsed,
                   "n_clusters": n_clusters}}))
spark.stop()
"""


def generate_input(n_base: int) -> str:
    path = os.path.join(CACHE, f"transcripts_{n_base}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        code = (
            "import sys; sys.path.insert(0, {repo!r});\n"
            "from comparador_de_registros_spark.conf import build_spark\n"
            "from comparador_de_registros_spark.sources import transcripts as tg\n"
            "spark = build_spark(master='local[16]')\n"
            "spec = tg.TranscriptSpec(n_base={n_base}, seed=42)\n"
            "tg.generate_transcripts(spark, spec).write.mode('overwrite')"
            ".parquet({path!r})\n"
            "spark.stop()\n"
        ).format(repo=REPO, n_base=n_base, path=path)
        subprocess.run([sys.executable, "-c", code], check=True)
    return path


def run_at(cpus: int, turns_path: str) -> dict:
    workdir = os.path.join(CACHE, f"scale_{cpus}")
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            RUNNER.format(repo=REPO),
            str(cpus),
            turns_path,
            workdir,
        ],
        check=True,
        capture_output=True,
        text=True,
    )
    shutil.rmtree(workdir, ignore_errors=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=12500)
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    turns_path = generate_input(args.n_base)
    results = {8: [], 32: []}
    for _ in range(args.repeats):
        for cpus in (8, 32):
            r = run_at(cpus, turns_path)
            results[cpus].append(r)
            print(json.dumps(r), flush=True)

    best8 = max(r["turns_per_sec"] for r in results[8])
    best32 = max(r["turns_per_sec"] for r in results[32])
    eff = (best32 / best8) / 4.0
    n_turns = results[8][0]["n_turns"]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-parallelism scaling evidence

Protocol per /root/repo/BASELINE.md: identical pipeline job
(assemble -> exact -> sign -> candidates -> verify -> cluster,
DedupConfig defaults: char-8 shingles, 128 perms as 32x4 LSH bands,
SimHash k=3, winnowed substring anchors, Jaccard >= 0.8) on the SAME
deterministic synthetic transcript input (seed 42,
n_base={args.n_base}, {n_turns} turns), separate JVM per parallelism.

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[8]  | {results[8][-1]['sec']:.1f} | {best8:,.0f} |
| local[32] | {results[32][-1]['sec']:.1f} | {best32:,.0f} |

**Scaling efficiency = (thr@32 / thr@8) / 4 = {eff:.3f}**
(gate: >= 0.8 per BASELINE.json north_rule)

Machine: {platform.platform()}, {os.cpu_count()} CPUs.
Spark 4.1.2, local mode (single JVM, N executor threads), AQE on,
Arrow batches 10k rows, shuffle partitions = max(cpus, 8).

Caveats: local-mode threads share one JVM heap and page cache, so this
under-reports true multi-executor scaling (no network shuffle, but also
GC/memory-bandwidth contention at 32 threads). Cluster-shape design
notes live in README.md (partitioning, AQE skew handling, bucket caps,
broadcast thresholds).

Clusters found at both parallelisms: {results[8][-1]['n_clusters']}
(local[8]) vs {results[32][-1]['n_clusters']} (local[32]) — identical
output is part of the determinism contract.
"""
        )
    print(
        json.dumps(
            {
                "thr8": best8,
                "thr32": best32,
                "efficiency": eff,
                "n_turns": n_turns,
            }
        )
    )


if __name__ == "__main__":
    main()
