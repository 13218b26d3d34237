"""Largest-Triangle-Three-Buckets downsampling (ClickHouse
``largestTriangleThreeBuckets`` / Grafana LTTB): keep the visually most
important n points of each series — always the endpoints, and per bucket
the point forming the largest triangle with the PREVIOUSLY SELECTED point
and the next bucket's centroid.

The selection is inherently sequential (each pick depends on the previous
one), which no window/aggregate composition expresses — exactly the case
the brief reserves for ``applyInPandas``: per-key ordered state that fits
one executor, Arrow-batched, schema declared. The keyed groupBy is the
only shuffle; within a group the numpy loop is O(n).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def lttb_downsample(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    val: str,
    order_tiebreak: str,
    n_buckets: int = 20,
) -> DataFrame:
    """Per-key LTTB: returns (key, ts, val) rows, ≤ n_buckets+2 per key,
    endpoints always kept, every output row an input row (no synthesis).
    Deterministic: ties in triangle area resolve to the earliest point
    (strict > when replacing the running best)."""
    out_schema = f"{key} long, {ts} timestamp, {val} double"

    def one_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, order_tiebreak]).reset_index(drop=True)
        n = len(pdf)
        if n <= n_buckets + 2:
            return pdf[[key, ts, val]]
        x = pdf[ts].astype("int64").to_numpy(dtype=np.float64)
        y = pdf[val].to_numpy(dtype=np.float64)
        # bucket boundaries over the interior points [1, n-1)
        bounds = np.linspace(1, n - 1, n_buckets + 1).astype(np.int64)
        selected = [0]
        prev = 0
        for b in range(n_buckets):
            lo, hi = bounds[b], bounds[b + 1]
            if hi <= lo:
                continue
            nlo, nhi = bounds[b + 1], (bounds[b + 2] if b + 2 <= n_buckets else n - 1)
            cx = x[nlo : max(nhi, nlo + 1)].mean() if nhi > nlo else x[n - 1]
            cy = y[nlo : max(nhi, nlo + 1)].mean() if nhi > nlo else y[n - 1]
            ax, ay = x[prev], y[prev]
            areas = np.abs(
                (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
            )
            pick = lo + int(np.argmax(areas))  # argmax -> first max: earliest point
            selected.append(pick)
            prev = pick
        selected.append(n - 1)
        return pdf.iloc[selected][[key, ts, val]]

    return df.select(key, ts, val, order_tiebreak).groupBy(key).applyInPandas(
        one_key, out_schema
    )
