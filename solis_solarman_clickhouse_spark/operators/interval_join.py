"""Interval (range-overlap) join: pairs of rows whose timestamps fall within
a tolerance of each other, per key (SURVEY.md §2-C Q-JOIN-9).

Formulation: equi-join on (key, time-bucket) with the left side expanded to
the neighboring buckets, then the exact predicate as a post-filter.

Why bucketed instead of a raw inequality join: Spark plans a bare
``a.ts BETWEEN b.ts - tol AND b.ts + tol`` as a nested-loop / per-key
cartesian. Bucketing by ``floor(ts / tol)`` turns it into a hash equi-join
whose per-bucket fan-out is bounded by data density, not table size — the
standard scalable range-join trick (same idea as Databricks' range-join
binning). One shuffle per side on (key, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_self_join(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    id_col: str,
    tolerance_seconds: int,
) -> DataFrame:
    """All pairs (a, b) with same `key`, |a.ts - b.ts| <= tolerance, and
    a.id < b.id (each unordered pair once, no self-pairs)."""
    tol = int(tolerance_seconds)
    sec = F.unix_timestamp(F.col(ts))  # second precision is enough for bucketing
    base = df.select(
        F.col(key).alias("k"),
        F.col(ts).alias("t"),
        F.col(id_col).alias("i"),
        F.floor(sec / tol).alias("b"),
    )
    # left row probes its own bucket and both neighbors; right stays put →
    # every qualifying pair meets in exactly one bucket of the right row.
    probe = base.withColumn("pb", F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)))
    a, b = probe.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.k") == F.col("b.k")) & (F.col("a.pb") == F.col("b.b")),
        "inner",
    ).filter(
        (F.col("a.i") < F.col("b.i"))
        & (
            F.abs(
                F.col("a.t").cast("double") - F.col("b.t").cast("double")
            )
            <= F.lit(float(tol))
        )
    )
    return pairs.select(
        F.col("a.k").alias(key),
        F.col("a.i").alias("id_a"),
        F.col("b.i").alias("id_b"),
        F.col("a.t").alias("ts_a"),
        F.col("b.t").alias("ts_b"),
    )
