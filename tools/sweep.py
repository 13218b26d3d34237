#!/usr/bin/env python
"""Full-registry driver simulation: run every query with an oracle on a
vanilla SparkSession and DuckDB over the same parquet, compare through
the driver-faithful pandas path (sorted columns, sorted rows, typed cell
tags), and print one line per query. Usage:

    python tools/sweep.py /root/testdata/sf0.01 [--width-sensitive]

``--width-sensitive`` additionally compares the pandas DTYPE of every
output column between the two engines (int32 vs int64 etc.) and prints a
``WIDTH`` line per divergent column — the defensive audit for an
external comparator whose hash might be integer-width-sensitive."""

from __future__ import annotations

import sys
import time

import duckdb
from pyspark.sql import SparkSession

# shared driver-faithful canonicalizer (same code path as tests/conftest.py)
import sys as _sys
_sys.path.insert(0, ".")
from solis_solarman_clickhouse_spark.oracle_compare import canon_pandas as canon  # noqa: E402



def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    width_sensitive = "--width-sensitive" in sys.argv
    sf = args[0] if args else "/root/testdata/sf0.01"
    # 4g driver default: 420+ queries share one JVM; the default 1g heap
    # OOMed on accumulated session state ~400 queries in (vec_mmr at
    # sf0.1, isolated-pass). Periodic System.gc() below bounds the
    # drift. At sf1.0 pass --driver-mem=16g (toPandas of 1M-row results
    # plus session drift blew 4g). --resume-log=FILE skips every query
    # that already has a result line in a prior run's log.
    # --shard=i/N runs only the i-th slice of the sorted registry (stable
    # index mod N) so several sweep processes can split one SF between
    # them; --oracle-mem=SIZE bounds each process's DuckDB (default 24GB)
    # so sharded runs stay inside the box.
    driver_mem = "4g"
    shard_i, shard_n = 0, 1
    oracle_mem = "24GB"
    for a in sys.argv[1:]:
        if a.startswith("--shard="):
            shard_i, shard_n = (int(x) for x in a.split("=", 1)[1].split("/"))
        if a.startswith("--oracle-mem="):
            oracle_mem = a.split("=", 1)[1]
    resume_done: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--driver-mem="):
            driver_mem = a.split("=", 1)[1]
        if a.startswith("--resume-log="):
            import re

            with open(a.split("=", 1)[1]) as fh:
                for line in fh:
                    # skip prior OK/timeout rows; prior MISMATCH/ERROR
                    # re-run (the fix being retested is the usual reason
                    # for a resume)
                    m = re.search(
                        r"(?:^|\x1b\[[0-9;]*m|\r| )([a-z_0-9]+) "
                        r"(OK|ORACLE-TIMEOUT)",
                        line,
                    )
                    if m:
                        resume_done.add(m.group(1))
            print(f"# resume: skipping {len(resume_done)} finished queries",
                  flush=True)
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.driver.memory", driver_mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, ".")
    from solis_solarman_clickhouse_spark.caching import release_cached
    from solis_solarman_clickhouse_spark.queries import REGISTRY

    con = duckdb.connect()
    # bound the oracle side: a handful of oracles are intentionally
    # pairwise (all-pairs weighted Jaccard, containment) and intractable
    # in DuckDB beyond the driver's correctness SFs — at sf1.0 one was
    # measured at 95 GB RSS before being killed. Cap memory and interrupt
    # past --oracle-timeout (default 180 s; 0 = unlimited), recording
    # ORACLE-TIMEOUT as a skip, never a fail (the Spark side still ran).
    con.execute(f"SET memory_limit='{oracle_mem}'")
    timeout_s = 180.0
    for a in sys.argv[1:]:
        if a.startswith("--oracle-timeout="):
            timeout_s = float(a.split("=", 1)[1])
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    import threading

    class _OracleTimeout(Exception):
        pass

    def run_oracle(sql: str):
        if not timeout_s:
            return con.execute(sql).df()
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).df()
        except (duckdb.InterruptException, RuntimeError) as exc:
            if "INTERRUPT" in type(exc).__name__.upper() or "interrupt" in str(exc).lower():
                raise _OracleTimeout() from exc
            raise
        finally:
            timer.cancel()

    n_ok = n_bad = n_width = n_done = n_skip = 0
    for qi, name in enumerate(sorted(REGISTRY)):
        if qi % shard_n != shard_i:
            continue
        spec = REGISTRY[name]
        if spec.oracle is None or name in resume_done:
            continue
        t0 = time.time()
        try:
            spdf = spec.fn(spark, sf).toPandas()
            opdf = run_oracle(spec.oracle)
            if sorted(spdf.columns) != sorted(opdf.columns):
                print(
                    f"{name} COLUMN-MISMATCH {sorted(spdf.columns)} vs "
                    f"{sorted(opdf.columns)}", flush=True)
                n_bad += 1
                continue
            if width_sensitive:
                for c in sorted(spdf.columns):
                    ds, do = str(spdf[c].dtype), str(opdf[c].dtype)
                    # datetime64[ns] (Spark toPandas) vs datetime64[us]
                    # (DuckDB .df()) is pandas RESOLUTION, not value width:
                    # driver-sampled timestamp queries (agg_last_point,
                    # ch_arg_min_max) hash-match green, and the canonical
                    # cell repr str()s both identically. Suppress so the
                    # audit's signal stays "integer width only".
                    if ds.startswith("datetime64") and do.startswith(
                        "datetime64"
                    ):
                        continue
                    if ds != do:
                        print(f"{name} WIDTH {c}: spark={ds} oracle={do}",
                              flush=True)
                        n_width += 1
            a = canon(spdf)
            o = canon(opdf)
            ok = a == o
        except _OracleTimeout:
            print(f"{name} ORACLE-TIMEOUT after {timeout_s:.0f}s "
                  "(spark side ran; oracle skipped)", flush=True)
            n_skip += 1
            continue
        except Exception as exc:  # noqa: BLE001
            print(f"{name} ERROR {type(exc).__name__}: {exc}"[:300], flush=True)
            n_bad += 1
            continue
        finally:
            # count COMPLETED queries (the loop body above may `continue`
            # past the ok/bad increments, so track completions separately)
            n_done += 1
            release_cached()
            if n_done % 50 == 0:
                spark.catalog.clearCache()
                spark._jvm.System.gc()
        dt = time.time() - t0
        if ok:
            n_ok += 1
            print(f"{name} OK {len(a)} rows {dt:.1f}s", flush=True)
        else:
            n_bad += 1
            mism = [(x, y) for x, y in zip(a, o) if x != y][:2]
            print(f"{name} MISMATCH {len(a)} vs {len(o)} {mism}", flush=True)
    tail = f", {n_width} width-divergent cols" if width_sensitive else ""
    if n_skip:
        tail += f", {n_skip} oracle-timeout skips"
    print(f"SWEEP DONE sf={sf}: {n_ok} ok, {n_bad} bad{tail}", flush=True)


if __name__ == "__main__":
    main()
