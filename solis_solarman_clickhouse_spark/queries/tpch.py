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


# --- batch 2: the remaining classic queries expressible on the slimmed ------
# --- fixture schemas (no partsupp table; adaptations documented per query) --

_sql_query(
    "tpch_q7",
    ["supplier", "lineitem", "orders", "customer", "nation"],
    f"""
    SELECT supp_nation, cust_nation, l_year, ROUND({sql_dsum('volume')}, 4) AS revenue
    FROM (
      SELECT /*+ BROADCAST(n1), BROADCAST(n2), BROADCAST(supplier), BROADCAST(customer) */
             n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 (volume shipping): bilateral trade between two nations per "
    "ship year. nation appears twice (n1 supplier-side, n2 customer-side); "
    "both plus the small dims broadcast, so only the lineitem-orders edge "
    "shuffles. YEAR() is cast to BIGINT so Spark and DuckDB agree on the "
    "output type.",
)

_sql_query(
    "tpch_q8",
    ["part", "lineitem", "supplier", "orders", "customer", "nation", "region"],
    f"""
    SELECT o_year,
           ROUND({sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END")}
                 / {sql_dsum('volume')}, 4) AS mkt_share
    FROM (
      SELECT /*+ BROADCAST(part), BROADCAST(supplier), BROADCAST(customer),
                 BROADCAST(n1), BROADCAST(n2), BROADCAST(region) */
             CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region  ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    "TPC-H Q8 (national market share): one nation's share of ECONOMY-part "
    "revenue inside ASIA per order year — conditional-over-total ratio of "
    "two DECIMAL(38,6)-accumulated sums, so the quotient is identical on "
    "both engines before ROUND.",
)

_sql_query(
    "tpch_q9",
    ["part", "lineitem", "supplier", "orders", "nation"],
    f"""
    SELECT nation, o_year, ROUND({sql_dsum('amount')}, 4) AS sum_profit
    FROM (
      SELECT /*+ BROADCAST(part), BROADCAST(supplier), BROADCAST(nation) */
             n_name AS nation,
             CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    "TPC-H Q9 (product type profit, adapted): profit per supplier nation "
    "per year for parts matching a name pattern. The fixture has no "
    "partsupp, so supply cost is modeled as 10% of p_retailprice x quantity "
    "instead of ps_supplycost x quantity; the plan shape (5-way join, "
    "LIKE-filtered part side, two-key agg) is the classic one.",
)

_sql_query(
    "tpch_q12",
    ["orders", "lineitem"],
    """
    SELECT l_returnflag AS ship_class,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "TPC-H Q12 (shipping modes / priority, adapted): the fixture lacks "
    "l_shipmode/l_commitdate/l_receiptdate, so l_returnflag stands in for "
    "the mode buckets and 'shipped 60+ days after ordering' for the "
    "late-receipt predicate (row-vs-row date arithmetic via INTERVAL, "
    "parsed identically by Spark and DuckDB). COUNT(CASE..) keeps the "
    "counters BIGINT on both engines (SUM of INTEGER is HUGEINT in DuckDB).",
)

_sql_query(
    "tpch_q15",
    ["lineitem", "supplier"],
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_revenue, 4) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    "TPC-H Q15 (top supplier): CTE revenue view consumed twice — once "
    "joined, once reduced to a scalar MAX. The double equality is safe "
    "because both sides come from the same DECIMAL(38,6) accumulation. "
    "Spark evaluates the scalar subquery once and broadcasts it.",
)

_sql_query(
    "tpch_q16",
    ["part", "lineitem", "supplier"],
    """
    SELECT /*+ BROADCAST(part) */
           p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "TPC-H Q16 (parts/supplier relationship, adapted): distinct suppliers "
    "per surviving (brand, type, size) cell, with the supplier blacklist "
    "as a NOT IN (null-safe: s_suppkey is never null) anti join. partsupp "
    "is absent, so the part-supplier association comes from lineitem "
    "shipments instead — same plan shape (expand + two-phase distinct agg).",
)

_sql_query(
    "tpch_q17",
    ["lineitem", "part"],
    """
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0, 4)
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND p_size < 5
      AND l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = part.p_partkey
      )
    """,
    "TPC-H Q17 (small-quantity-order revenue, adapted: p_size band stands "
    "in for the missing container column): correlated scalar AVG per part, "
    "decorrelated by Catalyst into an aggregate-then-join; l_quantity is "
    "integer-valued so the inner AVG is order-independent in double.",
)

_sql_query(
    "tpch_q20",
    ["supplier", "nation", "lineitem", "part"],
    """
    SELECT /*+ BROADCAST(nation) */
           s_suppkey, s_name, ROUND(s_acctbal, 4) AS acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100.0
      )
    ORDER BY s_suppkey
    """,
    "TPC-H Q20 (potential part promotion, adapted): suppliers in one "
    "nation who shipped a significant volume of pattern-matched parts in "
    "a year — IN over an aggregated-with-HAVING subquery, planned as a "
    "left-semi join. partsupp/availqty is absent, so shipped quantity via "
    "lineitem stands in for available stock.",
)


_LINEITEM_PS = "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"

_sql_query(
    "tpch_q2",
    ["part", "supplier", "lineitem", "nation", "region"],
    f"""
    SELECT /*+ BROADCAST(part), BROADCAST(nation), BROADCAST(region) */
           s.s_suppkey, s.s_name, ROUND(s.s_acctbal, 4) AS acctbal,
           n_name AS nation_name, p_partkey, p_name
    FROM part
    JOIN {_LINEITEM_PS} ps ON p_partkey = ps.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation   ON s.s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND p_size = 15
      AND s.s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM supplier s2
        JOIN {_LINEITEM_PS} ps2 ON ps2.l_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_suppkey, p_partkey
    """,
    "TPC-H Q2 (minimum cost supplier, adapted): per part, the EUROPE "
    "supplier(s) with the minimum account balance (stand-in for the "
    "missing ps_supplycost; the part-supplier relation is distilled from "
    "lineitem shipments). The correlated scalar MIN with its own 3-way "
    "join is the classic Q2 decorrelation stress: Catalyst rewrites it "
    "into an aggregate-join on p_partkey reusing the outer distribution.",
)

_sql_query(
    "tpch_q11",
    ["lineitem", "part", "supplier", "nation"],
    f"""
    SELECT /*+ BROADCAST(part), BROADCAST(supplier), BROADCAST(nation) */
           l_partkey AS partkey,
           ROUND({sql_dsum('l_quantity * p_retailprice')}, 4) AS inv_value
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING {sql_dsum('l_quantity * p_retailprice')} > (
      SELECT 0.001 * {sql_dsum('l_quantity * p_retailprice')}
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )
    ORDER BY inv_value DESC, partkey
    """,
    "TPC-H Q11 (important stock, adapted): per-part shipped value for one "
    "nation's suppliers, kept only when above a fraction of the nation "
    "total — quantity x retailprice stands in for availqty x supplycost. "
    "The HAVING compares a grouped decimal sum against an uncorrelated "
    "scalar subquery over the SAME join tree: Spark evaluates the scalar "
    "once (subquery reuse) and broadcasts it into the aggregate filter.",
)

_sql_query(
    "tpch_q21",
    ["supplier", "lineitem", "orders", "nation"],
    """
    SELECT /*+ BROADCAST(supplier), BROADCAST(nation) */
           s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n_name = 'NATION_1'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    "TPC-H Q21 (suppliers who kept orders waiting, adapted): in finished "
    "multi-supplier orders, suppliers who were the ONLY one with a "
    "returned line (l_returnflag='R' stands in for the missing "
    "receipt-after-commit lateness). The EXISTS + NOT EXISTS pair over "
    "the same fact table is the hardest decorrelation in the suite: "
    "Catalyst plans a semi join and an anti join both keyed on "
    "l_orderkey, stacked on one exchange of the fact.",
)
