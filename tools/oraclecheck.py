#!/usr/bin/env python
"""Targeted Spark-vs-DuckDB check for a named subset of registry queries.

tools/sweep.py runs the whole registry; this runs just the queries named
on the command line (plus --sf=DIR, --oracle-mem, --oracle-timeout), with
the same canonicalization (oracle_compare), for iterating on individual
oracle rewrites without paying a full sweep.

Usage:
    python tools/oraclecheck.py --sf=/root/testdata/sf0.01 q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import threading
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf = "/root/testdata/sf0.01"
    oracle_mem = "24GB"
    timeout_s = 600.0
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a.startswith("--oracle-mem="):
            oracle_mem = a.split("=", 1)[1]
        elif a.startswith("--oracle-timeout="):
            timeout_s = float(a.split("=", 1)[1])
        else:
            names.append(a)

    from solis_solarman_clickhouse_spark.oracle_compare import canon_pandas
    from solis_solarman_clickhouse_spark.queries import REGISTRY
    from solis_solarman_clickhouse_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{oracle_mem}'")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    rc = 0
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            print(f"{name} NO-ORACLE")
            continue
        t0 = time.time()
        spdf = spec.fn(spark, sf).toPandas()
        t_spark = time.time() - t0
        t0 = time.time()
        # Per-query cursor + done-flag guard: a Timer firing just as the
        # query completes (or after an early failure) must not interrupt
        # the SHARED connection — that would poison the NEXT query in the
        # loop and report a spurious ORACLE-FAIL for an unrelated name.
        # The cursor shares the catalog (views) but isolates interrupts,
        # and the flag stops a late timer from touching it at all.
        cur = con.cursor()
        done = threading.Event()

        def _interrupt(c=cur) -> None:
            if not done.is_set():
                c.interrupt()

        timer = threading.Timer(timeout_s, _interrupt)
        timer.start()
        try:
            opdf = cur.execute(spec.oracle).df()
        except Exception as exc:
            print(f"{name} ORACLE-FAIL {type(exc).__name__}: {exc}"[:300])
            rc = 1
            continue
        finally:
            done.set()
            timer.cancel()
            cur.close()
        t_oracle = time.time() - t0
        if sorted(spdf.columns) != sorted(opdf.columns):
            print(f"{name} COLUMN-MISMATCH {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
            rc = 1
            continue
        a, b = canon_pandas(spdf), canon_pandas(opdf)
        ok = a == b
        print(
            f"{name} {'OK' if ok else 'MISMATCH'} rows={len(a)}/{len(b)} "
            f"spark={t_spark:.1f}s oracle={t_oracle:.1f}s", flush=True
        )
        if not ok:
            rc = 1
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}: spark={x} oracle={y}")
                    break
    return rc


if __name__ == "__main__":
    sys.exit(main())
