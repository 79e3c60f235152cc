"""Shared fixtures: one local SparkSession per test session, plus the
NA-tolerant comparators the reference uses (tests/conftest.py:23-80).

r15: a full-suite invocation (``python -m pytest tests/ -x -q``) is
auto-sharded across worker processes (``pytest_cmdline_main`` below) —
the 3,100+-test suite outgrew the driver's serial verify window in r14
(VERIFY_r14 ``tests_ok: false``, cut at ~53% with zero failures), and
pytest-xdist is not installed in this environment. Each shard is a
plain pytest subprocess over a file subset with its own local[4]
SparkSession; the parent aggregates and prints an honest pytest-style
summary. Targeted invocations (specific files, -k, --collect-only)
run in-process exactly as before.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import SparkSession


def pytest_cmdline_main(config):
    """Auto-shard FULL-SUITE runs across processes; no-op otherwise.

    Returns an exit code (which makes pytest skip its normal run) only
    when sharding actually happened. Guards: never inside a shard
    (env), never for targeted runs, never when the box lacks cores,
    and on ANY setup error fall through to the normal serial run."""
    import glob
    import os
    import re
    import subprocess
    import sys
    import time

    try:
        if os.environ.get("DATAR_TEST_SHARD"):
            return None
        if os.environ.get("DATAR_NO_AUTOSHARD"):
            return None
        opt = config.option
        if (
            getattr(opt, "collectonly", False)
            or getattr(opt, "keyword", "")
            or getattr(opt, "numprocesses", None)
        ):
            return None
        # full-suite = exactly one positional arg resolving to the
        # tests directory itself (or no args from the repo root)
        here = os.path.dirname(os.path.abspath(__file__))
        args = list(config.args)
        if len(args) != 1:
            return None
        target = os.path.abspath(args[0]).rstrip("/")
        # `pytest tests/` and a bare `pytest` from the repo root both
        # mean "the whole suite"
        if target not in (here.rstrip("/"), os.path.dirname(here)):
            return None
        cpus = os.cpu_count() or 1
        workers = min(8, cpus // 4)
        if workers < 2:
            return None
        files = sorted(glob.glob(os.path.join(here, "test_*.py")))
        if len(files) < workers:
            return None
        # greedy longest-first by size (cheap runtime proxy), same
        # scheme as tools/partest.py
        sized = sorted(files, key=lambda p: -os.path.getsize(p))
        shards = [[] for _ in range(workers)]
        load = [0] * workers
        for p in sized:
            i = load.index(min(load))
            shards[i].append(p)
            load[i] += os.path.getsize(p)
        # forward the flags that matter (-x, -q, markexpr); each shard
        # is an independent pytest over its file subset
        fwd = []
        if getattr(opt, "exitfirst", False) or config.getoption("maxfail", 0) == 1:
            fwd.append("-x")
        mexpr = config.getoption("markexpr", default="") or ""
        if mexpr:
            fwd += ["-m", mexpr]
        t0 = time.time()
        procs = []
        for i, shard in enumerate(shards):
            if not shard:
                continue
            env = dict(os.environ)
            env["DATAR_TEST_SHARD"] = str(i)
            env["PYSPARK_SUBMIT_ARGS"] = "--master local[4] pyspark-shell"
            env["SPARK_LOCAL_DIRS"] = f"/tmp/spark-autoshard-{os.getpid()}-{i}"
            log = open(f"/tmp/pytest_shard_{os.getpid()}_{i}.log", "w")
            procs.append((i, log.name, subprocess.Popen(
                [sys.executable, "-m", "pytest", "-q", *fwd, *shard],
                stdout=log, stderr=subprocess.STDOUT, env=env,
            )))
        rc = 0
        passed = failed = 0
        tails = []
        for i, logname, p in procs:
            p.wait()
            rc = max(rc, p.returncode)
            tail = open(logname, errors="replace").read()[-4000:]
            mp = re.findall(r"(\d+) passed", tail)
            mf = re.findall(r"(\d+) failed", tail)
            passed += int(mp[-1]) if mp else 0
            failed += int(mf[-1]) if mf else 0
            status = "OK" if p.returncode == 0 else f"rc={p.returncode}"
            print(f"[shard {i}] {status} ({logname})", flush=True)
            if p.returncode != 0:
                tails.append(f"--- shard {i} tail ---\n{tail[-2000:]}")
        for t in tails:
            print(t, flush=True)
        wall = time.time() - t0
        # honest pytest-style summary line for the calling harness
        if failed or rc:
            print(f"{failed} failed, {passed} passed in {wall:.2f}s "
                  f"(auto-sharded {len(procs)} ways)", flush=True)
            return rc or 1
        print(f"{passed} passed in {wall:.2f}s "
              f"(auto-sharded {len(procs)} ways)", flush=True)
        return 0
    except Exception as exc:  # fall through to the normal serial run
        print(f"auto-shard disabled ({exc}); running serially", flush=True)
        return None


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("datar-polars-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


SENTINEL = object()


def _norm(v):
    if v is None:
        return SENTINEL
    if isinstance(v, float) and math.isnan(v):
        return SENTINEL
    return v


def assert_iterable_equal(a, b, approx=False):
    a = [_norm(x) for x in a]
    b = [_norm(x) for x in b]
    assert len(a) == len(b), f"length {len(a)} != {len(b)}: {a} vs {b}"
    for x, y in zip(a, b):
        if x is SENTINEL or y is SENTINEL:
            assert x is SENTINEL and y is SENTINEL, f"{a} vs {b}"
        elif approx and isinstance(x, float):
            assert x == pytest.approx(y), f"{a} vs {b}"
        else:
            assert x == y, f"{a} vs {b}"


def assert_frame_equal(pdf, expected: dict, approx=True):
    """expected: {col: [values]} in frame order."""
    assert list(pdf.columns) == list(expected.keys()), (
        f"columns {list(pdf.columns)} != {list(expected.keys())}"
    )
    for c, vals in expected.items():
        assert_iterable_equal(pdf[c].tolist(), vals, approx=approx)
