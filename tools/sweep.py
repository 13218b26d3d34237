#!/usr/bin/env python
"""Full-registry driver simulation: run every query with an oracle on a
vanilla SparkSession and DuckDB over the same parquet, compare through
the driver-faithful pandas path (sorted columns, sorted rows, typed cell
tags), and print one line per query. Usage:

    python tools/sweep.py /root/testdata/sf0.01
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
from pyspark.sql import SparkSession


def norm_cell(v):
    if v is None:
        return "N"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        r = round(f, 4)
        return f"f:{0.0 if r == 0 else r:.4f}"
    return str(v)


def canon(pdf):
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(norm_cell(c) for c in row))
    return sorted(out)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, ".")
    from solis_solarman_clickhouse_spark.caching import release_cached
    from solis_solarman_clickhouse_spark.queries import REGISTRY

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    n_ok = n_bad = 0
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        t0 = time.time()
        try:
            a = canon(spec.fn(spark, sf).toPandas())
            o = canon(con.execute(spec.oracle).df())
            ok = a == o
        except Exception as exc:  # noqa: BLE001
            print(f"{name} ERROR {type(exc).__name__}: {exc}"[:300], flush=True)
            n_bad += 1
            continue
        finally:
            release_cached()
        dt = time.time() - t0
        if ok:
            n_ok += 1
            print(f"{name} OK {len(a)} rows {dt:.1f}s", flush=True)
        else:
            n_bad += 1
            mism = [(x, y) for x, y in zip(a, o) if x != y][:2]
            print(f"{name} MISMATCH {len(a)} vs {len(o)} {mism}", flush=True)
    print(f"SWEEP DONE sf={sf}: {n_ok} ok, {n_bad} bad", flush=True)


if __name__ == "__main__":
    main()
