"""Skew-mitigation operators for hot-key workloads.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two shapes still need explicit treatment at 100 TB:

- ``salted_agg``: high-cardinality aggregate where a handful of keys hold
  a large share of rows (e.g. one mega-inverter, one boilerplate doc
  `source`). A single hash-agg puts each hot key in one reducer; salting
  splits every key across `n_salts` partial groups, aggregates, then
  merges — two shuffles, but each balanced. Works for any aggregate with
  a merge step (sum/count/min/max here).
- ``salted_broadcast_left``: fact ⋈ dim where the dim is broadcastable —
  the degenerate best case: broadcast removes the shuffle entirely, so
  key skew cannot concentrate on a reducer. Provided as the explicit
  "skewed fact-dim join" spelling so call sites document intent.

Both are semantics-preserving rewrites (asserted against the plain plans
in tests/test_operators.py) — use them when metrics show a straggler
reducer, not by default: the extra shuffle costs ~2x on balanced data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merge function per supported aggregate: how partial results combine.
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    aggs maps output column -> (agg_name, input_column) with agg_name in
    {sum, count, min, max}. Stage 1 groups by (keys + random salt) —
    hot keys fan out over n_salts reducers; stage 2 merges partials by the
    real keys. The salt is nondeterministic per row, which is safe
    exactly because every supported aggregate is salt-partition-agnostic.

    avg is deliberately absent: express it as sum/count and divide after
    the merge (partial averages don't merge without weights).
    """
    unsupported = {a for a, _ in aggs.values()} - set(_MERGE)
    if unsupported:
        raise ValueError(f"unsupported aggregates for salting: {sorted(unsupported)}")

    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial_cols: list[Column] = []
    merge_cols: list[Column] = []
    for out, (agg_name, col) in aggs.items():
        agg_fn = F.count if agg_name == "count" else getattr(F, agg_name)
        partial_cols.append(agg_fn(col).alias(f"_p_{out}"))
        merge_cols.append(_MERGE[agg_name](f"_p_{out}").alias(out))

    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_cols)
    return partial.groupBy(*keys).agg(*merge_cols)


def salted_broadcast_left(
    fact: DataFrame, dim: DataFrame, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Skew-proof fact ⋈ small-dim: force the broadcast so no shuffle of
    the fact occurs and hot keys can't concentrate (every task joins its
    own fact partition against the full replicated dim)."""
    return fact.join(F.broadcast(dim), on, how)


def top_keys(df: DataFrame, keys: list[str], *, n: int = 20) -> DataFrame:
    """Diagnostic: the n heaviest key groups with their row share — run
    this before reaching for salting."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc())
        .limit(n)
    )
