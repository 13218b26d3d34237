"""Q-SORT / Q-SET: sorting, top-k, and set operations (SURVEY.md §2-C).

Top-k uses orderBy().limit(k) which Spark plans as TakeOrderedAndProject —
a per-partition heap + driver merge, O(n log k), no global sort shuffle.
Top-k per group is the window row_number pattern (one shuffle on the group
key). Ties always broken by a key column for determinism.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import table
from .registry import query


@query(
    "sort_multi_nulls",
    category="sort",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P') AS status_or_null,
           o_totalprice
    FROM orders
    ORDER BY status_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
    """,
)
def sort_multi_nulls(spark, sf_dir):
    """Q-SORT-1: multi-column ORDER BY with NULLS FIRST/LAST (nulls injected
    via NULLIF since fixtures are null-free)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        "o_totalprice",
    ).orderBy(
        F.col("status_or_null").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


@query(
    "sort_topk_global",
    category="sort",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def sort_topk_global(spark, sf_dir):
    """Q-SORT-2: global top-k (TakeOrderedAndProject — no full sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "sort_topk_per_group",
    category="sort",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def sort_topk_per_group(spark, sf_dir):
    """Q-SORT-3: top-3 orders per customer via row_number()."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "set_union",
    category="set",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) u GROUP BY nk
    """,
)
def set_union(spark, sf_dir):
    """Q-SET-1a: UNION ALL of two projections, counted per key."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct",
    category="set",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_union_distinct(spark, sf_dir):
    """Q-SET-1b: UNION DISTINCT."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    category="set",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_intersect(spark, sf_dir):
    """Q-SET-2: INTERSECT (distinct) of two key sets."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_nationkey").alias("nk"))
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select(F.col("c_nationkey").alias("nk"))
    return a.intersect(b)


@query(
    "set_except",
    category="set",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark, sf_dir):
    """Q-SET-3: EXCEPT (distinct) — equivalent to the anti-join result
    set (customers minus finished-order customers; unfiltered it would
    be vacuously empty on the fixture)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)


@query(
    "set_union_by_name",
    category="set",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM (
      SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice,
             CAST(NULL AS VARCHAR) AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL BY NAME
      SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    )
    """,
)
def set_union_by_name(spark, sf_dir):
    """Schema-evolution union: an old extract (no o_orderpriority column)
    unioned with the current schema BY NAME, missing columns null-filled
    — Spark's unionByName(allowMissingColumns=True), the mechanism that
    lets a partitioned lake absorb schema additions without rewriting
    history (the reference's fixed 26-column INSERT has no such path;
    this is what replaces it). DuckDB spells it UNION ALL BY NAME."""
    o = table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice")
    )
    new = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderpriority",
    )
    return old.unionByName(new, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@query(
    "set_except_all",
    category="set",
    oracle="""
    SELECT o_custkey AS k FROM orders
    EXCEPT ALL
    SELECT c_custkey AS k FROM customer
    """,
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL — bag semantics: each customer key is removed from the
    orders multiset once per occurrence on the right, so a customer with 7
    orders keeps 6 copies. Spark plans exceptAll as a counted aggregate +
    generate (no row-by-row anti join): one shuffle per side on the key,
    output scales with multiplicity differences only."""
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.exceptAll(c)


@query(
    "set_intersect_all",
    category="set",
    oracle="""
    SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag intersection: each priority string survives
    min(count_left, count_right) times. Same counted-aggregate physical
    shape as EXCEPT ALL."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("p"))
    b = o.where(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("p"))
    return a.intersectAll(b)
