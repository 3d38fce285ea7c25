#!/usr/bin/env python
"""Idle/straggler analysis of a Spark event log against the dedup
pipeline's stage windows (bench_scaling.py RESULT line `stage_win`).

For each pipeline stage: wall seconds, summed executor task seconds,
busy fraction (task-sec / (wall * total cores)), task count, and the
longest single task. Busy fraction << 1 at the larger cluster size
localizes the scaling loss (scheduler idle, stragglers, barrier tails);
busy ~1 but more task-seconds at 4N means extra work (shuffle, GC).

Usage: analyze_eventlog.py EVENTLOG_FILE STAGE_WIN_JSON N_CORES
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    path, win_json, n_cores = sys.argv[1], sys.argv[2], int(sys.argv[3])
    # Spark's rolling event-log layout (eventlog_v2_<app>/) is a
    # DIRECTORY holding events_<n>_... files; read the newest events
    # file instead of crashing with IsADirectoryError (the committed
    # err.log failure of round 5).
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
        if not parts:
            raise SystemExit(f"no events_* files under {path}")
        path = parts[-1]
    wins = json.loads(win_json)
    tasks = []  # (launch_s, finish_s, run_ms, gc_ms, fetch_ms, ser_ms)
    # Spark compresses rolling event logs by default (events_*.zstd /
    # .lz4 / .snappy); stream-decompress via the matching CLI codec
    # rather than crashing on the binary bytes.
    if path.endswith((".zstd", ".zst")):
        import io
        import shutil as _sh
        import subprocess

        if _sh.which("zstd") is None:
            raise SystemExit(
                "event log is zstd-compressed and no zstd binary is on "
                "PATH; rerun with spark.eventLog.compress=false"
            )
        proc = subprocess.Popen(
            ["zstd", "-dc", path], stdout=subprocess.PIPE
        )
        fh = io.TextIOWrapper(proc.stdout, encoding="utf-8")
    else:
        fh = open(path)
    with fh:
        for line in fh:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            info = ev.get("Task Info") or {}
            met = ev.get("Task Metrics") or {}
            sr = met.get("Shuffle Read Metrics") or {}
            sw = met.get("Shuffle Write Metrics") or {}
            tasks.append(
                (
                    info.get("Launch Time", 0) / 1e3,
                    info.get("Finish Time", 0) / 1e3,
                    met.get("Executor Run Time", 0),
                    met.get("JVM GC Time", 0),
                    sr.get("Fetch Wait Time", 0),
                    met.get("Executor Deserialize Time", 0)
                    + met.get("Result Serialization Time", 0),
                    sw.get("Shuffle Bytes Written", 0),
                    sr.get("Remote Bytes Read", 0)
                    + sr.get("Local Bytes Read", 0),
                )
            )
    print(
        f"{'stage':12} {'wall_s':>7} {'task_s':>8} {'busy%':>6} "
        f"{'ntask':>6} {'max_task_s':>10} {'gc_s':>6} {'fetch_s':>8} "
        f"{'ser_s':>6} {'shufW_mb':>9} {'shufR_mb':>9}"
    )
    for st, (t0, t1) in wins.items():
        wall = t1 - t0
        # clip each task interval to the window instead of dropping
        # boundary-crossers — long straggler tasks straddling a stage
        # edge are exactly what this tool exists to surface
        inwin = []
        for t in tasks:
            lo, hi = max(t[0], t0), min(t[1], t1)
            if hi > lo:
                frac = (hi - lo) / (t[1] - t[0]) if t[1] > t[0] else 1.0
                inwin.append(
                    (lo, hi) + tuple(x * frac for x in t[2:])
                )
        task_s = sum((t[1] - t[0]) for t in inwin)
        busy = task_s / (wall * n_cores) * 100 if wall > 0 else 0
        mx = max(((t[1] - t[0]) for t in inwin), default=0.0)
        gc = sum(t[3] for t in inwin) / 1e3
        fetch = sum(t[4] for t in inwin) / 1e3
        ser = sum(t[5] for t in inwin) / 1e3
        sw_mb = sum(t[6] for t in inwin) / 1e6
        sr_mb = sum(t[7] for t in inwin) / 1e6
        print(
            f"{st:12} {wall:7.1f} {task_s:8.1f} {busy:6.1f} "
            f"{len(inwin):6d} {mx:10.2f} {gc:6.1f} {fetch:8.1f} "
            f"{ser:6.1f} {sw_mb:9.1f} {sr_mb:9.1f}"
        )


if __name__ == "__main__":
    main()
