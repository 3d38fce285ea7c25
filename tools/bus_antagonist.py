#!/usr/bin/env python
"""Memory-bus attribution experiment for the scaling gate.

Hypothesis under test: the N=1 -> 4N=4 single-core-executor efficiency
deficit on this ONE-BOX rig is shared-DRAM-bandwidth contention (a
single-machine artifact — on a real multi-node cluster each node has
its own memory bus), not a Spark scaling defect in the pipeline.

Design: run the IDENTICAL 1-executor pipeline measurement twice —
once on an otherwise-idle machine (the gate's thr@1), once while 3
antagonist processes stream DRAM on the 3 cores the 4-executor run
would occupy (taskset-pinned, same cores the extra workers pin to).
If per-core throughput under antagonist load matches the 4-executor
run's per-core throughput (thr@4 / 4), the whole efficiency gap is
accounted for by the bus: the pipeline itself scales, the box doesn't.

  python tools/bus_antagonist.py start 1 2 3   # pin streamers to cores
  python tools/bus_antagonist.py stop

The antagonist is a plain numpy copy loop over a buffer ~8x the L3 —
pure DRAM streaming, no disk, no Spark.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys

PIDFILE = "/tmp/cdr_bus_antagonist.pids"

STREAMER = r"""
import numpy as np
a = np.ones(256 * 1024 * 1024 // 8)   # 256 MB, ~8x typical L3
b = np.empty_like(a)
while True:
    np.copyto(b, a)
    np.copyto(a, b)
"""


def start(cores: list[str]) -> None:
    pids = []
    for c in cores:
        p = subprocess.Popen(
            ["taskset", "-c", c, sys.executable, "-c", STREAMER],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        pids.append(p.pid)
    with open(PIDFILE, "w") as fh:
        fh.write(" ".join(str(p) for p in pids))
    print(f"antagonists on cores {','.join(cores)}: pids {pids}")


def stop() -> None:
    if not os.path.exists(PIDFILE):
        print("no antagonists running")
        return
    with open(PIDFILE) as fh:
        pids = [int(x) for x in fh.read().split()]
    for pid in pids:
        try:
            os.kill(pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    os.remove(PIDFILE)
    print(f"stopped {len(pids)} antagonists")


if __name__ == "__main__":
    if sys.argv[1] == "start":
        start(sys.argv[2:])
    elif sys.argv[1] == "stop":
        stop()
    else:
        raise SystemExit("usage: bus_antagonist.py start CORE... | stop")
