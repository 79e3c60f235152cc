"""Process-parallel pytest runner (pytest-xdist is not installed in
this environment): shards test FILES across N worker processes, each
running its own pytest with an isolated SparkSession (local[K]).

Usage: python tools/partest.py [-n WORKERS] [pytest-args...]

Sharding is greedy longest-first by file size (a cheap proxy for
runtime) so the slowest files spread across workers. Exit status is
non-zero if any shard fails; per-shard tails are printed for failures.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=8, help="worker processes")
    ap.add_argument("--cores-per-worker", type=int, default=4)
    ap.add_argument("rest", nargs="*", help="extra pytest args")
    args = ap.parse_args()

    files = sorted(glob.glob("tests/test_*.py"))
    if not files:
        print("no test files found under tests/")
        return 2
    # greedy longest-first bin packing by size
    sized = sorted(files, key=lambda p: -os.path.getsize(p))
    shards: list[list[str]] = [[] for _ in range(args.n)]
    load = [0] * args.n
    for p in sized:
        i = load.index(min(load))
        shards[i].append(p)
        load[i] += os.path.getsize(p)

    procs = []
    logs = []
    t0 = time.time()
    for i, shard in enumerate(shards):
        if not shard:
            continue
        log = open(f"/tmp/partest_{i}.log", "w")
        env = dict(os.environ)
        # each worker gets its own Spark UI-less local session; keep
        # per-worker parallelism low so N workers don't oversubscribe
        env["PYSPARK_SUBMIT_ARGS"] = (
            f"--master local[{args.cores_per_worker}] pyspark-shell"
        )
        env["SPARK_LOCAL_DIRS"] = f"/tmp/spark-partest-{i}"
        # tautology -m overrides pytest.ini's default "-m not slow":
        # the dev/full gate runs EVERYTHING, slow fuzz suites included
        env["DATAR_TEST_SHARD"] = f"partest-{i}"
        cmd = [
            sys.executable, "-m", "pytest", "-q",
            "-m", "slow or not slow", *args.rest, *shard,
        ]
        procs.append((i, subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT, env=env)))
        logs.append((i, log))

    rc = 0
    for i, p in procs:
        code = p.wait()
        tail = open(f"/tmp/partest_{i}.log").read().strip().splitlines()
        last = tail[-1] if tail else "(no output)"
        status = "OK " if code == 0 else "FAIL"
        print(f"[shard {i}] {status} {last}")
        if code != 0:
            rc = 1
            print("\n".join(tail[-30:]))
    print(f"total wall: {time.time() - t0:.1f}s across {len(procs)} shards")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
