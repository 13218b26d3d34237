"""TPC-H macro-query pack (adapted to the slimmed fixture schemas).

The fixtures are TPC-H-shaped (TESTDATA.md), so the classic queries are the
natural macro-benchmark for the analytical surface the reference delegates
to ClickHouse. Each query here is ONE SQL string executed verbatim by BOTH
engines — Spark via ``spark.sql`` over temp views (exercising the full
Catalyst SQL path: parser, analyzer, optimizer, AQE) and DuckDB as the
oracle. Join hints ride in ``/*+ ... */`` comments, which DuckDB ignores.

Adaptations forced by the fixture schemas (no partsupp table; lineitem has
no commitdate/receiptdate/shipmode; part has no container): Q3 drops
o_shippriority, Q19 replaces the container predicate with p_size bands.
Determinism: decimal-accumulated sums (registry idiom), ROUND(...,4) on
float outputs, explicit tie-break keys in every LIMIT query.

Scale notes (100 TB): Q6 is the pure-scan query — the date/discount/qty
predicates all reach the Parquet reader (PushedFilters) and prune row
groups; Q3/Q5/Q10 shuffle only on the fact-fact orderkey edge while
dimensions broadcast; Q18's HAVING subquery is a self-aggregation that AQE
plans as a shuffle reused by the outer join; Q14/Q19's part side stays
broadcast-able far beyond sf0.1 (fixed 2k rows here; at true TPC-H scale
part grows with SF and AQE flips it to shuffled hash join automatically).
"""

from __future__ import annotations

from ..tables import table
from .registry import query, sql_dsum

_REV = sql_dsum("l_extendedprice * (1 - l_discount)")


def _sql_query(name: str, tables: list[str], sql: str, doc: str):
    @query(name, category="tpch", oracle=sql)
    def fn(spark, sf_dir, _sql=sql, _tables=tuple(tables)):
        for t in _tables:
            table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(_sql)

    fn.__doc__ = doc
    fn.__name__ = name
    return fn


_sql_query(
    "tpch_q3",
    ["customer", "orders", "lineitem"],
    f"""
    SELECT /*+ BROADCAST(customer) */
           l_orderkey, o_orderdate, ROUND({_REV}, 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 (shipping priority): unshipped high-value orders of one "
    "market segment; top-10 by revenue with orderkey tie-break.",
)

_sql_query(
    "tpch_q5",
    ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    f"""
    SELECT /*+ BROADCAST(nation), BROADCAST(region), BROADCAST(supplier) */
           n_name AS nation_name, ROUND({_REV}, 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    "TPC-H Q5 (local supplier volume): revenue where customer and supplier "
    "share a nation within one region-year.",
)

_sql_query(
    "tpch_q6",
    ["lineitem"],
    f"""
    SELECT ROUND({sql_dsum('l_extendedprice * l_discount')}, 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 (forecasting revenue change): pure scan+filter+global agg — "
    "the predicate-pushdown showcase; every filter reaches the Parquet "
    "reader, no shuffle beyond the single-row final agg.",
)

_sql_query(
    "tpch_q10",
    ["customer", "orders", "lineitem", "nation"],
    f"""
    SELECT /*+ BROADCAST(nation) */
           c_custkey, c_name, ROUND({_REV}, 4) AS revenue,
           ROUND(c_acctbal, 4) AS acctbal, n_name AS nation_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 (returned items): top-20 customers by lost revenue in a "
    "quarter, custkey tie-break.",
)

_sql_query(
    "tpch_q14",
    ["lineitem", "part"],
    f"""
    SELECT /*+ BROADCAST(part) */
           ROUND(100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                 / {_REV}, 4) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    "TPC-H Q14 (promotion effect): promo share of one month's revenue "
    "(fixture p_type is single-word, so PROMO is an exact match not a "
    "prefix).",
)

_sql_query(
    "tpch_q18",
    ["customer", "orders", "lineitem"],
    f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 4) AS totalprice,
           ROUND({sql_dsum('l_quantity')}, 4) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    "TPC-H Q18 (large-volume customers): orders above a quantity threshold "
    "via IN-subquery with HAVING; the inner aggregation is the same "
    "shuffle key as the outer join, so the exchange is reused.",
)

_sql_query(
    "tpch_q19",
    ["lineitem", "part"],
    f"""
    SELECT /*+ BROADCAST(part) */ ROUND({_REV}, 4) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19 (discounted revenue, adapted): disjunctive multi-table "
    "predicate — only the join key crosses tables pre-join, the OR-of-ANDs "
    "applies post-join; p_size bands stand in for the missing container "
    "column.",
)


_sql_query(
    "tpch_q4",
    ["orders", "lineitem"],
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 (order priority checking, adapted): orders in a quarter with "
    "at least one lineitem shipped after the order date — correlated EXISTS "
    "with a non-equi condition, planned as a left-semi join (fixture "
    "lineitem has no commitdate/receiptdate, so shipdate>orderdate stands "
    "in for the late-commit predicate).",
)

_sql_query(
    "tpch_q13",
    ["customer", "orders"],
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    "TPC-H Q13 (customer distribution, adapted: no comment-filter column): "
    "two-level aggregation over a left outer join — zero-order customers "
    "must survive into the c_count=0 bucket.",
)

_sql_query(
    "tpch_q22",
    ["customer", "orders", "nation"],
    f"""
    SELECT /*+ BROADCAST(nation) */
           n_name AS nation_name, COUNT(*) AS n_cust,
           {sql_dsum('c_acctbal')} AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      )
    GROUP BY n_name
    """,
    "TPC-H Q22 (global sales opportunity, adapted: nation stands in for "
    "the missing phone country code, and 'no orders since 1998' for "
    "'never ordered' — every fixture customer has some order): scalar "
    "subquery (uncorrelated, evaluated once and broadcast) + anti join, "
    "for lapsed customers above the positive-balance average.",
)
