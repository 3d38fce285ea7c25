#!/usr/bin/env python
"""Run the memory-bus attribution experiment for the scaling gate.

Measures three things on the SAME input with the SAME protocol as
bench_scaling.py (cold standalone cluster + steady-state warmup per
attempt):

1. thr@4 — the 4x1-core-executor pipeline;
2. thr@1 (clean) — the 1-executor pipeline, machine otherwise idle;
3. thr@1 (antagonist) — the 1-executor pipeline while 3 DRAM-streaming
   antagonist processes (tools/bus_antagonist.py) occupy cores 1-3,
   i.e. exactly the cores the three extra executors would use.

If per-core throughput at 4 executors (thr@4 / 4) ~= thr@1 under
antagonist load, the 1->4 efficiency deficit is memory-bus contention
— a single-box artifact (constant bandwidth-per-core on a real
cluster) — not a Spark scaling defect. Prints one SUMMARY json line.

Usage: python tools/bus_attribution.py [--n-base 150000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench_scaling as bs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=150000)
    args = ap.parse_args()

    path = bs.generate_input(args.n_base)
    for root, _d, files in os.walk(path):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    ant = os.path.join(REPO, "tools", "bus_antagonist.py")
    out = {}
    out["hi4"] = bs.run_at(4, path, 6, 1)
    out["lo1_clean"] = bs.run_at(1, path, 6, 1)
    subprocess.run([sys.executable, ant, "start", "1", "2", "3"], check=True)
    try:
        out["lo1_antagonist"] = bs.run_at(1, path, 6, 1)
    finally:
        subprocess.run([sys.executable, ant, "stop"], check=False)

    s = {
        "n_turns": out["hi4"]["n_turns"],
        "thr4": out["hi4"]["turns_per_sec"],
        "thr1_clean": out["lo1_clean"]["turns_per_sec"],
        "thr1_antagonist": out["lo1_antagonist"]["turns_per_sec"],
        "stage_sec": {k: v["stage_sec"] for k, v in out.items()},
    }
    s["eff_raw"] = round(s["thr4"] / s["thr1_clean"] / 4.0, 3)
    s["eff_bus_corrected"] = round(s["thr4"] / 4.0 / s["thr1_antagonist"], 3)
    print("SUMMARY " + json.dumps(s), flush=True)


if __name__ == "__main__":
    main()
