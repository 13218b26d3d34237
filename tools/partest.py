#!/usr/bin/env python
"""Parallel test runner: shards the suite across N pytest subprocesses
(one JVM each) without pytest-xdist (not shipped in this container).

Sharding is two-level, via the ``ORACLE_SHARD=i/N`` env var honored in
tests/conftest.py's ``pytest_collection_modifyitems``:
- the oracle sweep (tests/test_oracle.py — ~85 % of single-process wall
  time, one parametrization per registry query) splits per
  PARAMETRIZATION (stable CRC32 of the test id);
- every other test file is assigned whole (CRC32 of the file path), so
  module-scoped fixtures stay within one process.
Every shard therefore runs the full ``tests/`` tree with its own slice;
the union over shards is exactly the full suite.

Usage:
    python tools/partest.py [N]          # default N=4

Exit code is non-zero if any shard fails; per-shard tails are printed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    logs = []
    t0 = time.time()
    for i in range(n):
        env = dict(os.environ, ORACLE_SHARD=f"{i}/{n}")
        args = [sys.executable, "-m", "pytest", "-q", "tests/"]
        log = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f".shard{i}.log", delete=False
        )
        logs.append(log)
        procs.append(subprocess.Popen(
            args, cwd=repo, env=env, stdout=log, stderr=subprocess.STDOUT
        ))
    rc = 0
    for i, (p, log) in enumerate(zip(procs, logs)):
        p.wait()
        log.flush()
        with open(log.name) as fh:
            tail = fh.read()[-1500:]
        status = "OK" if p.returncode == 0 else f"FAIL rc={p.returncode}"
        print(f"--- shard {i}/{n}: {status} ({log.name})")
        print(tail.splitlines()[-3] if tail.splitlines() else "")
        if p.returncode != 0:
            print(tail)
            rc = 1
    print(f"total wall: {time.time() - t0:.0f}s across {n} shards")
    return rc


if __name__ == "__main__":
    sys.exit(main())
