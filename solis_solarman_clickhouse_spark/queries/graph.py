"""Graph analytics over the order graph (north-star family: iterative
algorithms expressed as fixed-unroll Catalyst plans with exact integer
arithmetic, cross-checked against DuckDB replaying the identical
recursion).

The repo's other graph ops (connected components in operators/graph.py,
used by doc_dedup_clusters / vec_dedup_clusters) converge by monotone
min/sum propagation; PageRank is the complementary shape — a fixed
number of dense sweeps whose VALUES must match, not just a fixed point.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import table
from .registry import query

_SCALE = 1_000_000_000_000  # rank mass carried as integer millionths-of-millionths


def _pagerank_oracle(iters: int = 3) -> str:
    body = """
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    it0 AS (SELECT node, 1000000000000 // nn.n AS r FROM nodes CROSS JOIN nn)
    """
    for k in range(1, iters + 1):
        body += f""",
    it{k} AS (
      SELECT n2.node,
             (15 * (1000000000000 // nn.n)) // 100
             + (85 * COALESCE(s.m, 0)) // 100 AS r
      FROM nodes n2 CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, SUM(p.r // d.od) AS m
        FROM edges e
        JOIN it{k - 1} p ON e.src = p.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst) s ON n2.node = s.node
    )
    """
    body += f"""
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           CAST(r AS BIGINT) AS rank_e12
    FROM it{iters}
    """
    return body


@query("graph_pagerank", category="graph", oracle=_pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 3 sweeps) over the bidirectional
    customer↔supplier trading graph (an edge per distinct trading pair,
    both directions, so every node has out-degree ≥ 1 and no dangling
    mass): which customers/suppliers sit most centrally in the order
    network. The iteration is a FIXED UNROLL of join + groupBy rounds
    in one lazy Catalyst DAG — each sweep is contrib = r div outdeg
    scattered along edges, summed per destination, then
    r' = (15·(1e12 div N)) div 100 + (85·Σcontrib) div 100.
    ALL arithmetic is BIGINT with explicit floor division (values are
    positive, so Spark's truncating `div` ≡ DuckDB's flooring `//`):
    rank mass is carried at 1e12 scale and every engine sees the same
    integers — no float summation-order hazard an iterative double
    version would have. N arrives as a broadcast one-row aggregate, not
    a collected literal, so the plan stays fully declarative. At scale:
    each sweep is one shuffle on dst (the edges relation is re-used, so
    a production run pre-partitions edges by src and checkpoints every
    few sweeps — the operators/graph.py pattern); 3 unrolled sweeps ≈
    the lineage depth AQE handles comfortably."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        # The edge list is walked by every sweep (3 contrib joins) plus the
        # degree/node/N derivations — persist it so the distinct+union
        # subtree runs once and each sweep reads the in-memory relation
        # (the iterative-graph analogue of operators/graph.py's
        # checkpoint-per-round; at 100 TB this is a StorageLevel.DISK
        # materialization of the edge RDD, standard for PageRank).
        .persist()
    )
    nodes = edges.select("src").distinct().withColumnRenamed("src", "node")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    r = (
        nodes.crossJoin(F.broadcast(nn))
        .select("node", "n", F.expr(f"{_SCALE} div n").alias("r"))
    )
    for _ in range(3):
        contrib = (
            edges.join(deg, "src")
            .join(r.select(F.col("node").alias("src"), "r"), "src")
            .select("dst", F.expr("r div od").alias("contrib"))
        )
        s = contrib.groupBy("dst").agg(F.sum("contrib").alias("m"))
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(s.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                "n",
                F.expr(
                    f"(15 * ({_SCALE} div n)) div 100"
                    " + (85 * coalesce(m, 0)) div 100"
                ).alias("r"),
            )
        )
    return r.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("r").cast("long").alias("rank_e12"),
    )
