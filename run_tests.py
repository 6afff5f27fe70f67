#!/usr/bin/env python
"""Crash-proof full-suite test runner: one module per fresh subprocess.

Why this exists: jaxlib's CPU ``backend_compile`` segfaults once a
single process has compiled enough large programs (reproduced
deterministically around the ~60th-69th test of the full suite on this
rig, always inside ``backend_compile_and_load``, never in any module
run alone — see conftest.py). A persistent XLA compile cache delays but
does not prevent the crash, so ``pytest tests/`` in one process is not
a trustworthy signal: a segfault aborts the run and a real regression
could hide behind it.

This runner shards the suite per test module into fresh subprocesses
(each well under the in-process compile budget), aggregates results,
and fails loudly on ANY child failure — including signals (segfault =
rc -11 / 139). Assertions and test code are unchanged; only the
process layout differs.

Usage:
    python run_tests.py                # full suite, sequential
    python run_tests.py -j 2           # two modules in flight
    python run_tests.py -k loop        # only modules matching 'loop'
    python run_tests.py -- -q -m slow  # extra args after `--` go to pytest

Exit code: 0 iff every module's pytest run exits 0 (or 5 = no tests
collected, which can happen under -m filters).
"""
from __future__ import annotations

import argparse
import os
import re
import signal
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

ROOT = Path(__file__).resolve().parent
TESTS = ROOT / "tests"

SUMMARY_RE = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) failed)?(?:, )?"
    r"(?:(\d+) skipped)?")


def run_module(mod: Path, pytest_args: list[str], timeout: float):
    cmd = [sys.executable, "-m", "pytest", str(mod), "-q",
           "--no-header", *pytest_args]
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=ROOT, capture_output=True, text=True, timeout=timeout)
        rc = proc.returncode
        out = proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = -signal.SIGALRM
        out = ((e.stdout or "") + (e.stderr or "")
               + f"\n*** TIMEOUT after {timeout:.0f}s ***")
    dt = time.time() - t0
    # pull the "N passed, M skipped" tail line for the one-line report
    tail = ""
    for line in reversed(out.strip().splitlines()):
        if ("passed" in line or "failed" in line or "error" in line
                or "no tests ran" in line):
            tail = line.strip().strip("=").strip()
            break
    return mod.name, rc, dt, tail, out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-j", "--jobs", type=int, default=1,
                    help="modules run concurrently (default 1)")
    ap.add_argument("-k", "--keyword", default=None,
                    help="only modules whose filename contains this")
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-module timeout in seconds (default 1800)")
    ap.add_argument("rest", nargs="*",
                    help="extra pytest args (put after `--`)")
    args = ap.parse_args()

    mods = sorted(TESTS.glob("test_*.py"))
    if args.keyword:
        mods = [m for m in mods if args.keyword in m.name]
    if not mods:
        print("no test modules matched", file=sys.stderr)
        return 2

    # children inherit the repo conftest (8-device CPU mesh + persistent
    # compile cache); nothing else to set up.
    print(f"run_tests: {len(mods)} modules, jobs={args.jobs}")
    t0 = time.time()
    results = []
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        futs = [pool.submit(run_module, m, args.rest, args.timeout)
                for m in mods]
        for fut in futs:
            name, rc, dt, tail, out = fut.result()
            ok = rc in (0, 5)          # 5 = no tests collected (filters)
            status = "ok " if ok else f"FAIL(rc={rc})"
            print(f"  [{status}] {name:<34} {dt:6.1f}s  {tail}")
            results.append((name, rc, out))
            if not ok:
                sys.stdout.write(out[-4000:] + "\n")

    n_bad = sum(1 for _, rc, _ in results if rc not in (0, 5))
    crashed = [(n, rc) for n, rc, _ in results
               if rc not in (0, 1, 5)]           # signals / internal
    print(f"run_tests: {len(mods) - n_bad}/{len(mods)} modules green "
          f"in {time.time() - t0:.0f}s"
          + (f"; CRASHED: {crashed}" if crashed else ""))
    if os.environ.get("PLSLAM_TEST_REPORT"):
        import json
        with open(os.environ["PLSLAM_TEST_REPORT"], "w") as f:
            json.dump([{"module": n, "rc": rc} for n, rc, _ in results],
                      f, indent=1)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
