#!/usr/bin/env python
"""Job-level decomposition of a Spark event log: one line per job with
wall seconds, its job group/description, and summed task seconds.
Usage: analyze_jobs.py EVENTLOG_FILE [min_wall_s]
"""
from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    path = sys.argv[1]
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
        if parts:
            path = parts[-1]
    jobs = {}
    stage_tasks: dict[int, float] = {}
    stage_of_job: dict[int, list[int]] = {}
    with open(path) as fh:
        for line in fh:
            if '"SparkListenerJobStart"' in line:
                ev = json.loads(line)
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "t0": ev.get("Submission Time", 0) / 1e3,
                    "desc": props.get("spark.job.description", "")[:80],
                    "callsite": (props.get("callSite.short") or "")[:40],
                }
                stage_of_job[jid] = [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])
                ]
            elif '"SparkListenerJobEnd"' in line:
                ev = json.loads(line)
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0) / 1e3
            elif '"SparkListenerTaskEnd"' in line:
                ev = json.loads(line)
                sid = ev.get("Stage ID")
                info = ev.get("Task Info") or {}
                dur = (info.get("Finish Time", 0) - info.get("Launch Time", 0)) / 1e3
                stage_tasks[sid] = stage_tasks.get(sid, 0.0) + dur
    print(f"{'job':>4} {'wall_s':>7} {'task_s':>8}  description")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        wall = j["t1"] - j["t0"]
        if wall < min_wall:
            continue
        tsec = sum(stage_tasks.get(s, 0.0) for s in stage_of_job.get(jid, []))
        print(f"{jid:>4} {wall:7.2f} {tsec:8.1f}  {j['desc'] or j['callsite']}")


if __name__ == "__main__":
    main()
