"""Bloom-style membership prefilter as a composition of DataFrame ops.

At 100 TB the expensive part of a selective fact⋈dim semi join is shipping
the *fact* side through a shuffle; engines avoid it by broadcasting a
compact membership summary of the dim keys and discarding fact rows that
cannot match before any wide exchange. Spark has this built in as runtime
bloom-filter injection, but its SQL surface (``bloom_filter_agg`` /
``might_contain``) is not registered in this build and the runtime rule has
undocumented gating — so the engine provides the same plan shape from
first principles:

- the dim side is hashed ``n_hashes`` ways (``xxhash64`` with distinct
  seeds) into ``n_buckets`` buckets; each hash family's *occupied bucket
  set* is a tiny distinct relation (≤ n_buckets rows of one int);
- the fact side is prefiltered with one **broadcast LEFT SEMI join per
  hash family** — a fact row survives only if every one of its hash
  buckets is occupied (the AND of k partitioned bloom lanes; false
  positives possible, false negatives impossible);
- an exact (still broadcast, now much smaller) semi join on the real key
  removes the false positives, so the operator's result is EXACTLY the
  semi join, with the wide side never shuffled.

Every step is plain DataFrame API: Catalyst sees k+1 BroadcastHashJoins
(LeftSemi) stacked over the fact scan in one whole-stage-codegen pipeline,
and pushes the surviving-row stream straight into downstream aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col: F.Column, seed: int, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(n_buckets))


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    *,
    n_buckets: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Semi join ``fact`` to ``dim`` on key equality, prefiltering the fact
    side through ``n_hashes`` broadcast bloom lanes before the exact join.

    Returns the fact rows whose ``fact_key`` appears in ``dim[dim_key]`` —
    identical semantics to ``fact.join(dim, on=key, how='left_semi')``.
    """
    keys = dim.select(F.col(dim_key).alias("__k")).where(F.col("__k").isNotNull())
    out = fact
    for seed in range(n_hashes):
        lane = keys.select(_bucket(F.col("__k"), seed, n_buckets).alias("__b")).distinct()
        out = out.join(
            F.broadcast(lane),
            _bucket(F.col(fact_key), seed, n_buckets) == lane["__b"],
            "left_semi",
        )
    exact = keys.distinct().withColumnRenamed("__k", fact_key)
    return out.join(F.broadcast(exact), on=fact_key, how="left_semi")
