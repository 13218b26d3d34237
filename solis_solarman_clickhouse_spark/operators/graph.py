"""Connected components over a pair list — the clustering step that turns
near-dup PAIRS into dedup GROUPS (keep one doc per component, drop the
rest). Spark has no native graph operator; this is min-label propagation
expressed as DataFrame joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Each round is one join + one aggregation (two
shuffles on the node key); rounds needed = graph diameter, and near-dup
graphs are overwhelmingly tiny cliques (diameter 1-2), so 3-5 rounds
close real corpora. The driver loop only checks a per-round convergence
COUNT — the data never leaves the cluster (no collect of nodes/edges),
which is what makes this shape survive 100 TB where a driver-side
union-find cannot.

The checkpoint (localCheckpoint each round) truncates the lineage so the
iteration count doesn't nest query plans exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, *, src: str = "doc_a", dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Min-label connected components from an undirected pair list.
    Returns (node, component) where component = min node id reachable.
    Deterministic: min-label is order-independent."""
    edges = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Convergence test: labels only ever DECREASE under min-propagation, so
    # sum(label) is strictly monotone while any node changes — an unchanged
    # sum IS the fixpoint. One scalar aggregate over the (checkpointed)
    # label table per round, instead of a self-join + count. Decimal(38,0)
    # accumulation so 64-bit ids at corpus scale can't overflow the probe.
    def label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = label_sum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node"), F.col("label").alias("component"))
