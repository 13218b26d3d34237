#!/usr/bin/env python
"""Zipfian natural-corpus documents generator (scaling evidence).

The driver fixtures draw document text from a bounded 30-word
near-uniform vocabulary — the DEGENERATE worst case for exact
set-similarity plans (every shingle has df ~ N/30, so candidate volume
is quadratic in N by construction; see
bench_records/r6_scalecheck_sf0.1_to_sf1.0.txt). Real crawl corpora are
Zipfian: most of the vocabulary is rare, and PPJoin prefix filtering
(operators/dedup._jaccard_prefix_pairs) collapses candidate volume to
near-linear. This generator produces a documents.parquet with the SAME
schema as the driver fixtures (doc_id, text, lang, source, n_chars) but
a natural token distribution, so the near-linear claim can be MEASURED
(tools/zipfscale.py) instead of argued:

- Heaps-law vocabulary: V = 40 * n_tokens^0.55 word types (so the
  vocabulary GROWS with the corpus, as real text does — a fixed vocab
  makes every document frequency grow linearly with N and forces
  quadratic candidate volume at any exponent), rank probability
  p(r) ~ 1/r^1.05 (web-corpus-like Zipf exponent).
- doc length ~ clipped lognormal (median ~110 words, range 20-400).
- 8%% of docs are PLANTED near-duplicates of an earlier doc (~3%% of
  token positions resampled; a flipped token corrupts ~3 trigram
  shingles, so expected trigram Jaccard ~ (1-0.09)/(1+0.09) ~ 0.84),
  so the J >= 0.8 output is non-trivial and recall is checkable.

Usage:
    python tools/gen_zipf.py N_DOCS OUT_DIR [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ZIPF_S = 1.05
HEAPS_K = 40
HEAPS_BETA = 0.55
DUP_FRAC = 0.08
DUP_NOISE = 0.03
PAYLOAD_NOISE = 0.01


def generate(n_docs: int, out: str, seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    lens = np.clip(
        np.exp(rng.normal(np.log(110), 0.5, n_docs)).astype(np.int64), 20, 400
    )
    offsets = np.concatenate([[0], np.cumsum(lens)])
    total = int(offsets[-1])

    V = max(20_000, int(HEAPS_K * total**HEAPS_BETA))
    ranks = np.arange(1, V + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    p /= p.sum()
    vocab = np.array([f"w{i:06d}" for i in range(V)])

    tok = rng.choice(V, size=total, p=p)

    # Plant near-duplicates: doc i copies doc j (j < i, within a 1000-doc
    # back-window) and resamples ~3% (DUP_NOISE) of positions. Lengths
    # equalize to the source doc's length so J stays high. The source j
    # must itself be a NON-dup: a dup source's token slice is not the
    # text it emitted (its stored text was perturbed), so copying it
    # would plant a pair that matches no emitted document.
    is_dup = (rng.random(n_docs) < DUP_FRAC) & (np.arange(n_docs) > 0)
    dup_src = np.maximum(
        0, np.arange(n_docs) - rng.integers(1, 1001, n_docs)
    )
    docs = []
    n_dup = 0
    for i in range(n_docs):
        if is_dup[i]:
            j = int(dup_src[i])
            while is_dup[j]:
                j -= 1
            t = tok[offsets[j] : offsets[j + 1]].copy()
            flip = rng.random(t.size) < DUP_NOISE
            t[flip] = rng.choice(V, size=int(flip.sum()), p=p)
            n_dup += 1
        else:
            t = tok[offsets[i] : offsets[i + 1]]
        docs.append(" ".join(vocab[t]))

    langs = np.array(["en", "en", "en", "de", "fr", "es"])
    texts = pa.array(docs)
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": texts,
            "lang": pa.array(langs[rng.integers(0, 6, n_docs)]),
            "source": pa.array([f"src{i % 8}" for i in rng.integers(0, 8, n_docs)]),
            "n_chars": pa.array([len(d) for d in docs], pa.int64()),
        }
    )
    # bounded row groups: a one-giant-row-group file OOMs Spark's
    # vectorized reader at multi-million-doc corpora (a whole row group
    # materializes per task)
    pq.write_table(
        table, os.path.join(out, "documents.parquet"), row_group_size=100_000
    )

    # Binary payload table (the "planted near-dup images" analogue for
    # the phash tier): each non-dup doc draws its bytes from a
    # DOC-SPECIFIC distribution (dirichlet over 256 byte values), so
    # byte-bigram histograms — and therefore the phash stand-in — are
    # well-spread across docs; a dup doc carries its source's payload
    # with ~PAYLOAD_NOISE of byte positions resampled, so planted pairs
    # land at small phash Hamming distance. Text-derived payloads
    # (magic||text) are useless here: every Zipf token is "wNNNNNN", so
    # all docs share one bigram histogram and ALL pairs collide.
    plens = np.clip(
        np.exp(rng.normal(np.log(2048), 0.4, n_docs)).astype(np.int64), 512, 8192
    )
    payloads: list[bytes] = []
    for i in range(n_docs):
        if is_dup[i]:
            j = int(dup_src[i])
            while is_dup[j]:
                j -= 1
            arr = np.frombuffer(payloads[j], dtype=np.uint8).copy()
            flip = rng.random(arr.size) < PAYLOAD_NOISE
            arr[flip] = rng.integers(0, 256, int(flip.sum()), dtype=np.uint8)
            payloads.append(arr.tobytes())
        else:
            probs = rng.dirichlet(np.full(256, 0.5))
            payloads.append(
                rng.choice(256, size=int(plens[i]), p=probs)
                .astype(np.uint8)
                .tobytes()
            )
    ptable = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    pq.write_table(
        ptable, os.path.join(out, "payloads.parquet"), row_group_size=100_000
    )

    stats = {"n_docs": n_docs, "tokens": total, "planted_dups": n_dup}
    print(stats, flush=True)
    return stats


if __name__ == "__main__":
    n = int(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    generate(n, out, seed)
