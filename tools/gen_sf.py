#!/usr/bin/env python
"""Local scale-factor fixture generator for scale-proofing beyond the
driver-provided sf0.1.

Produces the same tables / schemas / value distributions as the
driver-generated `/root/testdata/sf*` dirs (measured from sf0.01 and
sf0.1: dtypes via DESCRIBE, distributions via group-by sampling), at any
sf — used for the sf1.0 headroom runs the round-5 verdict asked for.
The RNG stream is ours (seed 42), NOT the driver's: that is fine because
every consumer (tools/sweep.py, bench.py) compares Spark against DuckDB
over the SAME parquet, so cross-engine correctness and scaling curves
are what matter, not byte-identity with the driver's fixtures.

Usage:
    python tools/gen_sf.py 1.0 /root/repo/.localdata/sf1.0
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"), row_group_size=500_000
    )
    print(f"{name}: {table.num_rows} rows", flush=True)


def generate(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = max(500, int(20_000 * sf))

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    adjs = ["large", "hot", "blue", "red", "small", "green", "dim", "shiny"]
    nouns = ["ring", "bolt", "case", "drum", "tube", "disk", "plate", "cog"]
    types = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{adjs[a]} {nouns[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": pa.array(np.array(types)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    day_us = 86_400_000_000
    t0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    odate = t0 + rng.integers(0, 2405, n_ord) * day_us
    statuses = np.array(["O", "P", "F"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(statuses[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: per-order fanout ~ 1 + Poisson(3.1) (measured mean 4.08,
    # mode 3-4, tail to ~17 at sf0.1)
    fan = 1 + rng.poisson(3.075, n_ord)
    n_li = int(fan.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), fan)
    l_odate = np.repeat(odate, fan)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            l_odate + rng.integers(1, 96, n_li) * day_us, pa.timestamp("us")
        ),
    }))

    ev0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    etypes = np.array(["view", "click", "purchase", "signup", "error"])
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(
            np.sort(ev0 + rng.integers(0, 30 * day_us, n_ev)), pa.timestamp("us")
        ),
        "user_id": pa.array(rng.integers(0, max(1, n_cust // 10), n_ev), pa.int64()),
        "event_type": pa.array(etypes[rng.integers(0, 5, n_ev)]),
        "value": np.round(
            np.minimum(rng.exponential(50.0, n_ev), 600.0), 2
        ),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10-100 words from the 30-word vocab; lang en-heavy;
    # 20 sources round-robin; ~0.16% planted exact dups and ~5% near-dups
    # carrying the 'dup' marker token (the sf0.1 fixture shape)
    langs = np.array(["en", "de", "fr", "es", "zh"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        nw = int(rng.integers(10, 101))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), nw)]))
    n_exact = max(1, int(n_doc * 0.0016))
    for j in range(n_exact):
        texts[n_doc - 1 - j] = texts[j]  # exact dup pairs
    n_near = max(1, int(n_doc * 0.025))
    for j in range(n_near):
        src = texts[2 * j]
        words = src.split()
        words[int(rng.integers(0, len(words)))] = "dup"
        texts[n_doc // 2 + j] = " ".join(words)
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(langs[rng.choice(5, n_doc, p=lang_p)]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm 64-dim float32 around 10 label centroids
    cents = rng.normal(size=(10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = cents[labels] + rng.normal(scale=0.35, size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.localdata/sf{sys.argv[1]}"
    generate(sf, out)
    print(f"DONE sf={sf} -> {out}", flush=True)
