#!/usr/bin/env python
"""Run the test suite as N concurrent pytest processes (suite sharding).

`pytest tests/` runs everything in one process on one local[32]
SparkSession and takes ~27 min, dominated by tests/test_oracle_parity.py
(one DuckDB hash-parity case per registered query at sf0.01). There is
no pytest-xdist in this environment, so this runner shards by hand:

- every test FILE is one work unit, except test_oracle_parity.py which
  is expanded into PARITY_SLICES units via SPARK_GRAFT_TEST_SLICE="i/k"
  (the file slices its own parametrization; the k slices partition the
  query set exactly, and the unparametrized entry smoke runs in slice 0
  only);
- a pool of worker threads pulls units off a shared queue
  (work-stealing — no duration estimates needed) and runs each unit as
  `python -m pytest <unit> -q -p no:cacheprovider` in its own
  subprocess;
- each worker owns a scratch cwd under /tmp so per-process working-dir
  droppings (derby.log, spark-warehouse, metastore_db) cannot collide
  across concurrent JVMs — test imports are cwd-independent
  (tests/conftest.py pins sys.path to the repo root);
- each subprocess gets SPARK_GRAFT_CPUS = total_cpus // workers so the
  shards share the machine instead of oversubscribing it 8×. All tests
  are partition-count-independent by design (the suite asserts
  partition-independence for every seeded/split/sampled operator), so
  running them at local[4] instead of local[32] is a legal
  configuration, not a weaker one.

Usage:
    python tools/run_tests_sharded.py [--workers N] [--cpus-per N]
                                      [--parity-slices K] [pytest args…]

Exit status 0 iff every unit passed. The canonical single-process
`python -m pytest tests/ -x -q` remains the gate of record; this runner
is the fast inner loop (full suite in roughly a quarter of the wall
time on the 32-cpu test host).
"""

from __future__ import annotations

import argparse
import os
import queue
import re
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
PARITY = "test_oracle_parity.py"

def build_units(parity_slices: int) -> list[tuple[str, dict[str, str]]]:
    """(pytest target, extra env) work units, heaviest first.

    Heaviest-first matters: with work-stealing, a straggler that starts
    last sets the critical path. Parity slices and the known-slow files
    go to the front; everything else is ordered by file size (a decent
    proxy for runtime here).
    """
    files = sorted(
        f for f in os.listdir(TESTS)
        if f.startswith("test_") and f.endswith(".py")
    )
    slow_first = [
        PARITY,  # expanded below
        "test_plan_sweep.py",  # builds every registered query's plan
        "test_properties.py",  # hypothesis examples
        "test_streaming.py",  # micro-batch waits
    ]
    ordered = [f for f in slow_first if f in files] + sorted(
        (f for f in files if f not in slow_first),
        key=lambda f: -os.path.getsize(os.path.join(TESTS, f)),
    )
    units: list[tuple[str, dict[str, str]]] = []
    for f in ordered:
        path = os.path.join(TESTS, f)
        if f == PARITY:
            units.extend(
                (path, {"SPARK_GRAFT_TEST_SLICE": f"{i}/{parity_slices}"})
                for i in range(parity_slices)
            )
        else:
            units.append((path, {}))
    return units


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=0,
                    help="concurrent pytest processes (default cpus//4, max 8)")
    ap.add_argument("--cpus-per", type=int, default=0,
                    help="SPARK_GRAFT_CPUS per shard (default cpus//workers)")
    ap.add_argument("--parity-slices", type=int, default=8,
                    help="slices for test_oracle_parity.py")
    ap.add_argument("pytest_args", nargs="*",
                    help="extra args passed through to every pytest run")
    args = ap.parse_args(argv)

    ncpu = os.cpu_count() or 8
    workers = args.workers or min(8, max(2, ncpu // 4))
    cpus_per = args.cpus_per or max(2, ncpu // workers)

    units = build_units(args.parity_slices)
    q: queue.Queue[tuple[str, dict[str, str]]] = queue.Queue()
    for u in units:
        q.put(u)

    lock = threading.Lock()
    results: list[tuple[str, int, float, str]] = []  # label, rc, secs, tail
    counts = {"passed": 0, "failed": 0, "skipped": 0}

    def parse_counts(out: str) -> None:
        # take the LAST line carrying any count token — an all-skipped
        # unit's summary is just "N skipped in …" (no passed/failed),
        # and error-only collection failures say "N errors"
        for line in reversed(out.splitlines()):
            found = re.findall(
                r"(\d+) (passed|failed|skipped|error)", line
            )
            if found:
                for n, key in found:
                    counts[key if key != "error" else "failed"] += int(n)
                return

    def worker(widx: int) -> None:
        scratch = tempfile.mkdtemp(prefix=f"shard{widx}_", dir="/tmp")
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus_per)
        env.setdefault("SPARK_GRAFT_INITIAL_PARTITIONS", str(cpus_per * 8))
        # Spark PYTHON WORKERS resolve imports via PYTHONPATH, not the
        # driver's sys.path (which tests/conftest.py patches) — without
        # this, any Arrow-UDF query crashes its worker with an import
        # error when pytest runs from the scratch cwd instead of the
        # repo root.
        env["PYTHONPATH"] = REPO + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        while True:
            try:
                path, extra = q.get_nowait()
            except queue.Empty:
                break
            label = os.path.basename(path) + (
                f"[{extra['SPARK_GRAFT_TEST_SLICE']}]"
                if "SPARK_GRAFT_TEST_SLICE" in extra else ""
            )
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", path, "-q",
                 "-p", "no:cacheprovider", *args.pytest_args],
                cwd=scratch, env={**env, **extra},
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            dt = time.time() - t0
            # exit 5 = no tests collected (an empty slice): fine.
            ok = proc.returncode in (0, 5)
            tail = "" if ok else "\n".join(proc.stdout.splitlines()[-40:])
            with lock:
                parse_counts(proc.stdout)
                results.append((label, proc.returncode, dt, tail))
                flag = "ok" if ok else f"FAIL rc={proc.returncode}"
                print(f"[{len(results):3d}/{len(units)}] {flag:10s} "
                      f"{dt:6.1f}s  {label}", flush=True)
        shutil.rmtree(scratch, ignore_errors=True)

    t0 = time.time()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    failures = [r for r in results if r[1] not in (0, 5)]
    for label, rc, _, tail in failures:
        print(f"\n===== {label} (rc={rc}) =====\n{tail}")
    print(
        f"\nsharded suite: {counts['passed']} passed, {counts['failed']} failed,"
        f" {counts['skipped']} skipped in {wall:.1f}s"
        f" ({workers} workers × local[{cpus_per}]; {len(units)} units)"
    )
    return 1 if failures or counts["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
