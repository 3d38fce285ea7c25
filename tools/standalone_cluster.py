#!/usr/bin/env python
"""Start/stop a local Spark standalone cluster: one master + N
single-core worker JVMs, each worker taskset-pinned to its own physical
core. This is the scaling-evidence substrate (BENCH/BASELINE.md): a
REAL multi-executor cluster (separate JVM, heap, GC and shuffle server
per executor) on one machine, driven via spark-submit — the same
mechanism the north rule names, with only the network replaced by
loopback.

Usage:
  python tools/standalone_cluster.py start N [mem_per_worker_gb] [cores_per_worker]
  python tools/standalone_cluster.py stop
"""

from __future__ import annotations

import os
import shutil
import signal
import subprocess
import sys
import time

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
MASTER_URL = "spark://127.0.0.1:7077"
STATE = "/tmp/cdr_standalone_pids"
LOGDIR = "/tmp/cdr_standalone_logs"


def _spawn(args: list[str], log: str, env: dict | None = None) -> int:
    with open(log, "wb") as fh:
        proc = subprocess.Popen(
            args,
            stdout=fh,
            stderr=subprocess.STDOUT,
            env=env or os.environ.copy(),
            start_new_session=True,
        )
    return proc.pid


def _wait_for(log: str, needle: str, timeout: float = 30.0) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with open(log, "r", errors="replace") as fh:
                if needle.lower() in fh.read().lower():
                    return True
        except FileNotFoundError:
            pass
        time.sleep(0.5)
    return False


def start(n_workers: int, mem_gb: int = 6, cores: int = 1) -> None:
    stop()
    os.makedirs(LOGDIR, exist_ok=True)
    pids = []
    env = os.environ.copy()
    env.setdefault("SPARK_HOME", SPARK_HOME)
    # keep daemon JVMs small; executors get their own memory setting
    env["SPARK_DAEMON_MEMORY"] = "1g"
    mlog = os.path.join(LOGDIR, "master.log")
    pids.append(
        _spawn(
            [
                SPARK_CLASS,
                "org.apache.spark.deploy.master.Master",
                "-h", "127.0.0.1", "-p", "7077", "--webui-port", "8081",
            ],
            mlog,
            env,
        )
    )
    assert _wait_for(mlog, "I have been elected leader"), "master failed to start"
    for i in range(n_workers):
        wlog = os.path.join(LOGDIR, f"worker{i}.log")
        wenv = env.copy()
        # distinct dirs so workers don't collide
        wenv["SPARK_WORKER_DIR"] = f"/tmp/cdr_worker_{i}"
        core_set = ",".join(str(i * cores + c) for c in range(cores))
        pids.append(
            _spawn(
                [
                    "taskset", "-c", core_set,
                    SPARK_CLASS,
                    "org.apache.spark.deploy.worker.Worker",
                    MASTER_URL,
                    "-c", str(cores), "-m", f"{mem_gb}g",
                    "--webui-port", str(8100 + i),
                ],
                wlog,
                wenv,
            )
        )
    for i in range(n_workers):
        assert _wait_for(
            os.path.join(LOGDIR, f"worker{i}.log"),
            "Successfully registered with master",
        ), f"worker {i} failed to register"
    with open(STATE, "w") as fh:
        fh.write("\n".join(str(p) for p in pids))
    print(
        f"cluster up: master + {n_workers} x {cores}-core workers "
        f"({mem_gb}g each)"
    )


def stop() -> None:
    if os.path.exists(STATE):
        with open(STATE) as fh:
            for line in fh.read().split():
                try:
                    os.killpg(int(line), signal.SIGTERM)
                except (ProcessLookupError, PermissionError, ValueError):
                    try:
                        os.kill(int(line), signal.SIGTERM)
                    except Exception:
                        pass
        os.remove(STATE)
        time.sleep(2)
    for i in range(64):
        shutil.rmtree(f"/tmp/cdr_worker_{i}", ignore_errors=True)


if __name__ == "__main__":
    if sys.argv[1] == "start":
        start(
            int(sys.argv[2]),
            int(sys.argv[3]) if len(sys.argv) > 3 else 6,
            int(sys.argv[4]) if len(sys.argv) > 4 else 1,
        )
    elif sys.argv[1] == "stop":
        stop()
    else:
        raise SystemExit(__doc__)
