"""Q-SUB: subquery surface — scalar, IN, and correlated EXISTS/aggregate
subqueries. Catalyst decorrelates these into joins (SURVEY.md §4: subquery
decorrelation is built-in); the tests in tests/test_plans.py and the
oracle comparison confirm both the rewrite's legality and its results.

SQL-first on purpose: the subquery forms are what a ClickHouse/Grafana
user migrating to this engine writes verbatim.
"""

from __future__ import annotations

from ..tables import register_views
from .registry import query, sql_davg, sql_dsum

_SCALAR_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_big_orders
FROM orders
WHERE o_totalprice > (SELECT {sql_davg('o_totalprice')} * 1.8 FROM orders)
GROUP BY o_orderpriority
"""


@query("sub_scalar", category="subquery", oracle=_SCALAR_SQL)
def sub_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery: orders above 1.8x the global mean
    price (the fixture's price cap sits just under 2x the mean, so a 2x
    cut would select zero rows and test nothing). Catalyst evaluates the
    scalar once and broadcasts it into the filter."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


_IN_SQL = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
GROUP BY n_name
"""


@query("sub_in", category="subquery", oracle=_IN_SQL)
def sub_in(spark, sf_dir):
    """IN subquery → left-semi join after decorrelation."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


_CORR_EXISTS_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
)
GROUP BY o_orderstatus
"""


@query("sub_correlated_exists", category="subquery", oracle=_CORR_EXISTS_SQL)
def sub_correlated_exists(spark, sf_dir):
    """Correlated EXISTS (TPC-H Q4 shape) → semi join on the correlation
    key with the inner predicate pushed below it."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_EXISTS_SQL)


_CORR_AGG_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_heavy
FROM lineitem l1
WHERE l_quantity > (
  SELECT {sql_davg('l_quantity')} * 1.5 FROM lineitem l2
  WHERE l2.l_partkey = l1.l_partkey
)
GROUP BY l_returnflag
"""


@query("sub_correlated_agg", category="subquery", oracle=_CORR_AGG_SQL)
def sub_correlated_agg(spark, sf_dir):
    """Correlated aggregate subquery (TPC-H Q17 shape): rows above 1.5x
    their group's mean. Decorrelates to an aggregate + equi-join on the
    correlation key — at 100 TB this is one shuffle on l_partkey, not a
    per-row subquery execution."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_AGG_SQL)


@query(
    "sub_lateral_topn",
    category="subquery",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
           FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 2
         ) t
    """,
)
def sub_lateral_topn(spark, sf_dir):
    """LATERAL correlated table subquery (SQL:1999 / DuckDB / Spark 3.5+):
    top-2 orders per customer written as a per-row dependent subquery in
    FROM — the form BI tools emit for 'for each X, its top N Y'. Spark
    decorrelates the LATERAL LIMIT into the same window-rank plan as
    sort_topk_per_group (one shuffle on the correlation key), so the
    lateral syntax costs nothing over the hand-written window."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (
               SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
               FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               LIMIT 2
             ) t
        """
    )


_RECURSIVE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT CAST(DATE_TRUNC('month', (SELECT MIN(o_orderdate) FROM orders)) AS TIMESTAMP)
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < (SELECT CAST(DATE_TRUNC('month', MAX(o_orderdate)) AS TIMESTAMP) FROM orders)
)
SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
FROM months LEFT JOIN orders ON CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) = m
GROUP BY m
"""


@query("sql_recursive_cte", category="subquery", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark 4 SQL surface): a month calendar spine grown
    recursively between the first and last order date, left-joined to
    per-month order counts — the SQL-standard form of gap fill (months
    with zero orders appear with 0). One SQL string runs verbatim on
    Spark (UnionLoop execution) and DuckDB. The recursion depth is
    |months|, a driver-side loop of tiny steps — fine for calendar
    spines; bulk series still use sequence()+explode (ts_gap_fill)."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


@query(
    "sub_not_in_null_trap",
    category="subquery",
    oracle="""
    WITH probe AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN o_custkey ELSE NULL END AS k
      FROM orders
    )
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN (SELECT k FROM probe)) AS not_in_count,
      (SELECT COUNT(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey))
        AS not_exists_count,
      (SELECT COUNT(*) FROM probe WHERE k IS NULL) AS n_nulls
    """,
)
def sub_not_in_null_trap(spark, sf_dir):
    """The ANSI NOT IN null trap, planned correctly: when the subquery
    column contains even one NULL, ``x NOT IN (...)`` can never be TRUE
    (x <> NULL is UNKNOWN), so the NOT IN count is 0 while the NOT EXISTS
    count keeps its natural value (customers with no 'P'-status order:
    7 at sf0.001, 56 at sf0.01 — non-vacuous) — the classic silent-wrong-answer
    migration bug, pinned here as a hash-checked contract on both
    engines. Physically this is the one query shape where Spark CANNOT
    use a hash anti join: null-aware anti join (NOT IN) plans as a
    BroadcastNestedLoopJoin unless the build side is provably
    null-free, while NOT EXISTS stays a broadcast hash LeftAnti — the
    two counts side by side are also a planner-behavior regression
    test. The NULLs are injected deterministically (open orders'
    custkeys become NULL)."""
    register_views(spark, sf_dir)
    return spark.sql("""
      WITH probe AS (
        SELECT CASE WHEN o_orderstatus = 'P' THEN o_custkey ELSE NULL END AS k
        FROM orders
      )
      SELECT
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey NOT IN (SELECT k FROM probe)) AS not_in_count,
        (SELECT COUNT(*) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM probe p
                           WHERE p.k = c.c_custkey)) AS not_exists_count,
        (SELECT COUNT(*) FROM probe WHERE k IS NULL) AS n_nulls
    """)


@query(
    "sql_parameterized",
    category="subquery",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 50000.0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sql_parameterized(spark, sf_dir):
    """Spark 4 PARAMETERIZED SQL + the IDENTIFIER() clause — the
    injection-safe templating surface every query service needs
    (ClickHouse's analogue: {param:Type} binding in its HTTP
    interface): values bind as named parameters (typed literals, not
    string splices) and the table name routes through
    IDENTIFIER(:tbl), which validates it as an identifier rather than
    interpolating raw text. Binding happens at PARSE time, so the
    bound plan is byte-identical to the literal query — same pushdown,
    same pruning — which the shared oracle (plain literals) proves."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        FROM IDENTIFIER(:tbl)
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"tbl": "orders", "status": "F", "floor": 50000.0},
    )


_ANY_ALL_SQL = """
SELECT s.s_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CASE WHEN s.s_acctbal > ANY (
              SELECT c.c_acctbal FROM customer c
              WHERE c.c_nationkey = s.s_nationkey)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_above_some_customer,
       CAST(SUM(CASE WHEN s.s_acctbal > ALL (
              SELECT c.c_acctbal FROM customer c
              WHERE c.c_nationkey = s.s_nationkey)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_above_every_customer
FROM supplier s
GROUP BY s.s_nationkey
ORDER BY nationkey
"""


@query("sub_any_all_quantified", category="subquery", oracle=_ANY_ALL_SQL)
def sub_any_all_quantified(spark, sf_dir):
    """Quantified comparisons — ``> ANY`` and ``> ALL`` correlated
    subqueries (suppliers richer than SOME / EVERY customer of their
    nation). Spark's parser REJECTS quantified comparison subqueries
    (ParseException — a genuine ANSI gap), so this query IS the
    engine-side answer: the textbook decorrelation, hand-applied —
    ANY ⇒ compare against the per-nation MIN, ALL ⇒ against the MAX
    with the empty-set edge (ALL over an empty set is TRUE — the dual
    of the sub_not_in_null_trap pitfall, handled via the left join's
    null bound). The per-nation bound table is tiny and broadcasts;
    no row-vs-row comparison ever materializes — the same physical
    plan Catalyst would emit had it supported the syntax, which the
    DuckDB oracle (running the NATIVE quantifiers) certifies
    row-for-row. Grouped integer counts, nations-sized output."""
    from pyspark.sql import functions as F

    from ..tables import table

    s = table(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    bounds = c.groupBy(F.col("c_nationkey").alias("s_nationkey")).agg(
        F.min("c_acctbal").alias("mn"), F.max("c_acctbal").alias("mx")
    )
    j = s.join(F.broadcast(bounds), "s_nationkey", "left")
    return (
        j.groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(
                F.when(F.col("s_acctbal") > F.col("mn"), 1).otherwise(0)
            ).alias("n_above_some_customer"),
            F.sum(
                F.when(
                    F.col("mx").isNull() | (F.col("s_acctbal") > F.col("mx")), 1
                ).otherwise(0)
            ).alias("n_above_every_customer"),
        )
        .orderBy("nationkey")
    )
