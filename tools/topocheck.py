#!/usr/bin/env python
"""Multi-worker topology check (round-9 verdict, Next round #3).

Everything before round 9 was validated on local[32] — a single JVM
where "shuffle" is an in-process copy, localCheckpoint blocks live in
the one executor that also holds the driver, and file:// paths are
trivially shared. This tool runs the engine's heavy tier on a REAL
multi-executor topology — ``local-cluster[2,16,<mem>]``, Spark's
standalone-cluster-in-miniature with two separate Worker JVMs — and
compares every query's full result hash against the same query on
local[32], catching local-mode-only assumptions (localCheckpoint block
placement in iterative graph loops, driver-held numpy state
serialization into real executors, commit protocols over file:// sinks,
Arrow batches crossing a real wire) before anyone believes the 100x
story on a real cluster.

Also exercises one streaming checkpoint/restart cycle on the cluster
topology: run_stream over a sliced raw-register dir, hard stop after the
first micro-batches, restart from the checkpoint, and require the final
table to be row-identical to a single-pass batch run.

Usage:
    python tools/topocheck.py local-cluster   # writes .topo_cluster.json
    python tools/topocheck.py local           # writes .topo_local.json
    python tools/topocheck.py merge           # -> bench_records/r9_local_cluster.json

Two subprocess invocations (one JVM lifecycle each) keep the topologies
hermetically separated.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("TOPO_SF_DIR", os.path.join(REPO, ".localdata", "sf1.0"))

#: the heavy tier: every iterative graph loop (localCheckpoint cadence),
#: the blocked/broadcast BLAS kernels (driver-held numpy plane/codebook
#: state shipped to real executors), and the semdedup family (footer-fed
#: plane scaling + applyInPandas over a real wire).
QUERIES = [
    "graph_pagerank_converged",
    "graph_pagerank",
    "graph_kcore_full",
    "graph_kcore_onion",
    "graph_connected_components",
    "graph_triangle_count",
    "graph_bfs_distance",
    "graph_modularity",
    "graph_degree_assortativity",
    "vec_cosine_topk",
    "vec_semdedup",
    "vec_semdedup_recall",
    "vec_bitext_margin_topk",
    "vec_ann_ivf",
    "doc_neardup_minhash",
    "doc_incremental_dedup",
]


def _norm(v):
    if v is None:
        return "N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 4)
        return f"{0.0 if r == 0 else r:.4f}"
    return str(v)


def result_hash(df) -> tuple[int, str]:
    cols = sorted(df.columns)
    rows = sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return len(rows), h.hexdigest()


def build_session(topology: str):
    from pyspark.sql import SparkSession

    if topology == "local-cluster":
        master = os.environ.get("TOPO_CLUSTER_MASTER", "local-cluster[2,16,16384]")
    else:
        master = "local[32]"
    b = (
        SparkSession.builder.master(master)
        .appName(f"topocheck-{topology}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    if topology == "local-cluster":
        b = b.config("spark.executor.memory", "16g")
    return b.getOrCreate()


def streaming_restart_check(spark) -> dict:
    """run_stream -> hard stop mid-stream -> restart from checkpoint ->
    final table must equal the single-pass batch result, on THIS
    topology (foreachBatch executes on the driver but the micro-batch
    plans run on the real executors; the checkpoint and sink cross
    file:// from two worker JVMs)."""
    import shutil
    import tempfile

    from solis_solarman_clickhouse_spark.ingest.fixture import generate_raw_registers
    from solis_solarman_clickhouse_spark.ingest.pipeline import run_stream, transform
    from solis_solarman_clickhouse_spark.ingest.sink import IdempotentParquetSink

    work = tempfile.mkdtemp(prefix="topo_stream_")
    raw_path = os.path.join(work, "raw")
    generate_raw_registers(spark, inverters=2, days=1).repartition(8).write.parquet(
        raw_path
    )
    n_batch, h_batch = result_hash(transform(spark.read.parquet(raw_path)))

    ckpt = os.path.join(work, "ckpt")
    sink = IdempotentParquetSink(os.path.join(work, "fact"))
    q = run_stream(spark, raw_path, sink, ckpt, max_files_per_trigger=1)
    # hard stop mid-stream: wait for at least one committed batch, stop()
    deadline = time.time() + 180
    while time.time() < deadline:
        lp = q.lastProgress
        if lp and lp.get("batchId", -1) >= 1:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(120)
    stopped_batches = (q.lastProgress or {}).get("batchId", -1) + 1
    q2 = run_stream(spark, raw_path, sink, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(600)
    n_stream, h_stream = result_hash(sink.read_table(spark))
    shutil.rmtree(work, ignore_errors=True)
    return {
        "rows_batch": n_batch,
        "rows_stream": n_stream,
        "batches_before_stop": stopped_batches,
        "restart_equal": h_batch == h_stream and n_batch == n_stream,
    }


def run_topology(topology: str) -> dict:
    spark = build_session(topology)
    spark.sparkContext.setLogLevel("ERROR")
    # force a job first: executor JVMs register asynchronously, so an
    # immediate getExecutorMemoryStatus undercounts on local-cluster
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    from solis_solarman_clickhouse_spark.queries import REGISTRY

    out = {
        "topology": topology,
        "master": spark.sparkContext.master,
        "executor_entries": n_exec,
        "sf_dir": SF_DIR,
        "queries": {},
    }
    for name in QUERIES:
        t0 = time.time()
        n, h = result_hash(REGISTRY[name].fn(spark, SF_DIR))
        out["queries"][name] = {
            "sec": round(time.time() - t0, 3),
            "rows": n,
            "hash": h,
        }
        print(f"  {name}: {out['queries'][name]['sec']}s {n} rows", flush=True)
    out["streaming_restart"] = streaming_restart_check(spark)
    print("  streaming_restart:", out["streaming_restart"], flush=True)
    spark.stop()
    return out


def merge() -> None:
    a = json.load(open(os.path.join(REPO, ".topo_cluster.json")))
    b = json.load(open(os.path.join(REPO, ".topo_local.json")))
    rows = {}
    all_equal = True
    for name in QUERIES:
        qa, qb = a["queries"][name], b["queries"][name]
        eq = qa["hash"] == qb["hash"] and qa["rows"] == qb["rows"]
        all_equal &= eq
        rows[name] = {
            "hash_equal": eq,
            "rows": qa["rows"],
            "sec_cluster_2x16": qa["sec"],
            "sec_local32": qb["sec"],
            "ratio": round(qa["sec"] / qb["sec"], 2) if qb["sec"] else None,
        }
    record = {
        "purpose": "multi-worker topology validation (verdict r8, next-round #3)",
        "cluster_master": a["master"],
        "cluster_executor_entries": a["executor_entries"],
        "sf_dir": a["sf_dir"],
        "all_hashes_equal": all_equal,
        "streaming_restart_cluster": a["streaming_restart"],
        "streaming_restart_local": b["streaming_restart"],
        "queries": rows,
    }
    path = os.path.join(REPO, "bench_records", "r9_local_cluster.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "local-cluster"
    if mode == "merge":
        merge()
    else:
        res = run_topology(mode)
        suffix = "cluster" if mode == "local-cluster" else "local"
        with open(os.path.join(REPO, f".topo_{suffix}.json"), "w") as f:
            json.dump(res, f, indent=1)
