#!/usr/bin/env python
"""Measure exact-dedup scaling on a NATURAL (Zipfian) corpus.

Companion to tools/scalecheck.py: that table shows the bounded-vocab
driver fixture forces quadratic candidate volume on the exact
set-similarity tier (~102x work for 10x docs — work growth, not plan
regression). This runner generates Zipfian corpora (tools/gen_zipf.py)
at increasing doc counts and times the SAME operators, recording which
physical plan operators/dedup._prefix_join_wins routes to and the
wall-clock growth, so the "near-linear on natural corpora" claim is a
measurement, not prose.

Usage:
    python tools/zipfscale.py [N1 N2 ...]     # default 50000 200000

Writes bench_records/r6_zipf_scaling.json and prints the ratio table.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def run(scales: list[int]) -> dict:
    import gen_zipf
    from pyspark.sql import functions as F

    from solis_solarman_clickhouse_spark.session import get_spark
    from solis_solarman_clickhouse_spark.operators import dedup as D

    spark = get_spark()
    out: dict = {
        "zipf_s": gen_zipf.ZIPF_S,
        "heaps": [gen_zipf.HEAPS_K, gen_zipf.HEAPS_BETA],
        "rows": [],
    }
    for n in scales:
        d = os.path.join(REPO, ".localdata", f"zipf_{n}")
        pq_path = os.path.join(d, "documents.parquet")
        if not os.path.exists(pq_path):
            gen_zipf.generate(n, d)
        docs = spark.read.parquet(pq_path)
        row: dict = {"n_docs": n}

        idx = D.shingle_index(docs, k=3, hashed=True)
        row["prefix_path"] = bool(D._prefix_join_wins(idx, 0.8, n))

        t0 = time.monotonic()
        pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.8)
        row["jaccard_pairs"] = pairs.count()
        row["jaccard_sec"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        base = docs.where(F.col("doc_id") < int(n * 0.8))
        incr = docs.where(F.col("doc_id") >= int(n * 0.8))
        kept = D.incremental_dedup(base, incr, k=3, threshold=0.8)
        row["incr_kept"] = kept.count()
        row["incr_sec"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        cand = D.minhash_lsh_pairs(docs, n_hashes=32, bands=8, k=3, threshold=0.8)
        row["minhash_cand"] = cand.count()
        row["minhash_sec"] = round(time.monotonic() - t0, 2)

        spark.catalog.clearCache()
        out["rows"].append(row)
        print(row, flush=True)

    rows = out["rows"]
    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        out["data_ratio"] = b["n_docs"] / a["n_docs"]
        for k in ("jaccard_sec", "incr_sec", "minhash_sec"):
            out[f"{k}_ratio"] = round(b[k] / max(a[k], 1e-9), 2)
    return out


if __name__ == "__main__":
    scales = [int(x) for x in sys.argv[1:]] or [50_000, 200_000]
    res = run(scales)
    path = os.path.join(REPO, "bench_records", "r6_zipf_scaling.json")
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "rows"}))
    print(f"wrote {path}")
