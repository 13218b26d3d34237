"""Q-AGG: aggregation surface (SURVEY.md §2-C).

These are the analytics the reference delegates to ClickHouse over its
MergeTree table (SURVEY.md §2-B): time-bucketed gauges, last-point-per-key
(ClickHouse argMax), counter deltas. Spark expresses them as hash
aggregates with automatic partial (map-side) + final phases — at 100 TB the
partial agg collapses the shuffle to |groups| × partitions rows.

Float sums use the DECIMAL(38,6) accumulate → DOUBLE idiom (registry.dsum)
so results are independent of partition/summation order on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import register_views, spread, table
from .registry import davg, dsum, query, r4, sql_davg, sql_dsum


@query(
    "agg_tpch_q1",
    category="aggregate",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           ROUND({sql_davg('l_quantity')}, 4) AS avg_qty,
           ROUND({sql_davg('l_extendedprice')}, 4) AS avg_price,
           ROUND({sql_davg('l_discount')}, 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_tpch_q1(spark, sf_dir):
    """Q-AGG-1: TPC-H Q1 pricing summary — the hash-agg workhorse."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    filtered = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return (
        spread(filtered)  # decimal partial-agg is CPU-heavy; see tables.spread
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            r4(davg("l_quantity")).alias("avg_qty"),
            r4(davg("l_extendedprice")).alias("avg_price"),
            r4(davg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    category="aggregate",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Q-AGG-2: exact distinct aggregation (expand + two-phase agg in Spark)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_approx_distinct",
    category="aggregate",
    check="TOL",
    oracle="SELECT CAST(1 AS BOOLEAN) AS within_tolerance",
)
def agg_approx_distinct(spark, sf_dir):
    """Q-AGG-3: approx_count_distinct (HLL++) within 5% of exact.

    The tolerance check itself is computed inside the query so the output is
    a deterministic boolean the oracle can hash-match.
    """
    li = table(spark, sf_dir, "lineitem")
    res = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    return res.select(
        (
            F.abs(F.col("approx") - F.col("exact")) / F.col("exact") <= F.lit(0.05)
        ).alias("within_tolerance")
    )


_GSETS_ORACLE = f"""
SELECT CASE WHEN r_name IS NULL THEN '<all>' ELSE r_name END AS region_name,
       CASE WHEN n_name IS NULL THEN '<all>' ELSE n_name END AS nation_name,
       CASE WHEN r_name IS NULL THEN 1 ELSE 0 END AS g_region,
       CASE WHEN n_name IS NULL THEN 1 ELSE 0 END AS g_nation,
       {sql_dsum('c_acctbal')} AS sum_acctbal,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
"""


@query("agg_grouping_sets", category="aggregate", oracle=_GSETS_ORACLE)
def agg_grouping_sets(spark, sf_dir):
    """Q-AGG-4: GROUPING SETS with null-indicator columns.

    Indicator uses CASE WHEN key IS NULL (fixtures are null-free) instead of
    grouping_id() to stay dialect-neutral with the oracle.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT CASE WHEN r_name IS NULL THEN '<all>' ELSE r_name END AS region_name,
               CASE WHEN n_name IS NULL THEN '<all>' ELSE n_name END AS nation_name,
               CASE WHEN r_name IS NULL THEN 1 ELSE 0 END AS g_region,
               CASE WHEN n_name IS NULL THEN 1 ELSE 0 END AS g_nation,
               {sql_dsum('c_acctbal')} AS sum_acctbal,
               COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


@query(
    "agg_rollup",
    category="aggregate",
    oracle=f"""
    SELECT COALESCE(CAST(YEAR(o_orderdate) AS VARCHAR), '<all>') AS order_year,
           COALESCE(o_orderpriority, '<all>') AS priority,
           {sql_dsum('o_totalprice')} AS sum_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (YEAR(o_orderdate), o_orderpriority)
    """,
)
def agg_rollup(spark, sf_dir):
    """Q-AGG-5: ROLLUP over (year, priority)."""
    o = table(spark, sf_dir, "orders").withColumn("order_year_i", F.year("o_orderdate"))
    return (
        o.rollup("order_year_i", "o_orderpriority")
        .agg(dsum("o_totalprice").alias("sum_price"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("order_year_i").cast("string"), F.lit("<all>")).alias("order_year"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "sum_price",
            "n",
        )
    )


@query(
    "agg_cube",
    category="aggregate",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           {sql_dsum('o_totalprice')} AS sum_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    """Q-AGG-6: CUBE over (status, priority)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice").alias("sum_price"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "sum_price",
            "n",
        )
    )


@query(
    "agg_having",
    category="aggregate",
    oracle=f"""
    SELECT o_custkey, {sql_dsum('o_totalprice')} AS total_spent, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING CAST(SUM(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE) > 1500000
    """,
)
def agg_having(spark, sf_dir):
    """Q-AGG-7: HAVING — post-aggregation filter."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("total_spent"), F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("total_spent") > 1500000)
    )


@query(
    "agg_last_point",
    category="aggregate",
    oracle="""
    WITH m AS (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id)
    SELECT e.user_id, m.last_ts, ROUND(MAX(e.value), 4) AS last_value
    FROM events e JOIN m ON e.user_id = m.user_id AND e.ts = m.last_ts
    GROUP BY e.user_id, m.last_ts
    """,
)
def agg_last_point(spark, sf_dir):
    """Q-AGG-8: last point per key — ClickHouse ``argMax(value, time)``, the
    reference schema's headline dashboard query (SURVEY.md §2-B;
    /root/reference/tables.sql:32 orders by (inverter, time) for this).

    max(struct(ts, value)) gives a deterministic arg-max (ties on ts broken
    by value), computed as a single partial+final hash agg — no window, no
    second shuffle.
    """
    ev = table(spark, sf_dir, "events")
    pair = F.max(F.struct(F.col("ts"), F.col("value"))).alias("p")
    return (
        ev.groupBy("user_id")
        .agg(pair)
        .select("user_id", F.col("p.ts").alias("last_ts"), r4(F.col("p.value")).alias("last_value"))
    )


@query(
    "agg_global_stats",
    category="aggregate",
    oracle=f"""
    SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           ROUND({sql_davg('l_quantity')}, 4) AS avg_qty,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
           COUNT(*) AS n
    FROM lineitem
    """,
)
def agg_global_stats(spark, sf_dir):
    """Q-AGG-9: ungrouped global aggregate with statistical moments."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        r4(davg("l_quantity")).alias("avg_qty"),
        r4(F.stddev_samp("l_quantity")).alias("std_qty"),
        r4(F.var_samp("l_quantity")).alias("var_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_collect_sorted",
    category="aggregate",
    oracle="""
    SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """Q-AGG-10: sorted array_agg, emitted as a joined string so the hash
    compare stays scalar."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
    )


@query(
    "agg_salted_skew",
    category="aggregate",
    oracle=f"""
    SELECT event_type, {sql_dsum('value')} AS sum_value,
           COUNT(value) AS n, MIN(value) AS mn, MAX(value) AS mx
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark, sf_dir):
    """Skew-resilient two-stage salted aggregation (operators/skew.py):
    hot keys fan out over 16 salted partial groups before the merge.
    Semantics-preserving, so the plain GROUP BY is its oracle; decimal
    accumulation keeps the salted partial-sum order-independent."""
    from pyspark.sql import types as T

    from ..operators.skew import salted_agg

    ev = table(spark, sf_dir, "events").withColumn(
        "_v", F.col("value").cast(T.DecimalType(38, 6))
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {"sum_value": ("sum", "_v"), "n": ("count", "_v"),
         "mn": ("min", "value"), "mx": ("max", "value")},
        n_salts=16,
    )
    return out.select(
        "event_type", F.col("sum_value").cast("double").alias("sum_value"),
        "n", "mn", "mx",
    )


@query(
    "agg_percentiles",
    category="aggregate",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_quantity, 0.99), 4) AS p99,
           ROUND(quantile_disc(l_quantity, 0.5), 4) AS p50_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact grouped percentiles (interpolated + discrete): Spark
    percentile() matches DuckDB quantile_cont, percentile_disc matches
    quantile_disc. The exact form sorts per group; the approx_percentile
    sketch (mergeable, one-pass) is the 100 TB path when error tolerance
    allows — same API shape, swapped function."""
    li = spread(table(spark, sf_dir, "lineitem"))
    return li.groupBy("l_returnflag").agg(
        r4(F.percentile("l_quantity", F.lit(0.5))).alias("p50"),
        r4(F.percentile("l_quantity", F.lit(0.9))).alias("p90"),
        r4(F.percentile("l_quantity", F.lit(0.99))).alias("p99"),
        r4(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")).alias("p50_disc"),
    )


@query(
    "agg_pivot",
    category="aggregate",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS price_f,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS price_o,
           {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS price_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot: status values become columns. Spark's pivot with an explicit
    value list is a single pass (no second distinct-scan); the oracle is
    the dialect-neutral conditional-aggregation spelling, which is also
    exactly what Catalyst rewrites pivot into."""
    o = table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice"))
    )
    return p.select(
        "o_orderpriority",
        F.col("F").alias("price_f"),
        F.col("O").alias("price_o"),
        F.col("P").alias("price_p"),
    )


@query(
    "agg_unpivot",
    category="aggregate",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'price' AS metric,
           ROUND(l_extendedprice, 4) AS v
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'quantity', ROUND(l_quantity, 4)
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', ROUND(l_discount, 4)
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def agg_unpivot(spark, sf_dir):
    """Unpivot/melt: wide metric columns to long (metric, value) rows via
    DataFrame.unpivot (STACK under the hood) — one scan, row count x3,
    no shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 4).alias("price"),
            F.round("l_quantity", 4).alias("quantity"),
            F.round("l_discount", 4).alias("discount"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["price", "quantity", "discount"],
            "metric",
            "v",
        )
    )


@query(
    "agg_approx_percentile",
    category="aggregate",
    check="TOL",
    oracle="SELECT CAST(1 AS BOOLEAN) AS within_tolerance",
)
def agg_approx_percentile(spark, sf_dir):
    """ClickHouse quantileTDigest parity: approx_percentile (Greenwald-
    Khanna sketch, mergeable across partitions — the 100 TB path) of
    l_extendedprice at p50/p95/p99 within 1% relative error of the exact
    percentile. Like Q-AGG-3, the tolerance check runs inside the query so
    the output is a deterministic boolean the oracle hash-matches."""
    li = table(spark, sf_dir, "lineitem")
    pcts = [0.5, 0.95, 0.99]
    res = li.agg(
        F.percentile_approx("l_extendedprice", pcts, 10000).alias("approx"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias("exact"),
    )
    ok = F.aggregate(
        F.zip_with(
            "approx", "exact",
            lambda a, e: (F.abs(a - e) / F.abs(e)) <= F.lit(0.01),
        ),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    return res.select(ok.alias("within_tolerance"))


@query(
    "agg_histogram",
    category="aggregate",
    oracle="""
    WITH mm AS (
      SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
      FROM lineitem
    )
    SELECT CAST(LEAST(9, FLOOR((l_extendedprice - mn) / ((mx - mn) / 10)))
                AS BIGINT) AS bucket,
           COUNT(*) AS n_rows,
           ROUND(MIN(l_extendedprice), 4) AS bucket_min,
           ROUND(MAX(l_extendedprice), 4) AS bucket_max
    FROM lineitem, mm
    GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """ClickHouse ``histogram``-style distribution: 10 equal-width buckets
    of l_extendedprice between global min and max (max lands in the last
    bucket via LEAST). Two passes: a 1-row min/max aggregate broadcast-
    crossed into the scan, then one partial+final count per bucket — the
    bucket arithmetic is the same IEEE double expression on both engines,
    so bucket boundaries agree bit-for-bit."""
    li = table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    bucket = F.least(
        F.lit(9),
        F.floor(
            (F.col("l_extendedprice") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10)
        ),
    ).cast("bigint")
    return (
        li.crossJoin(F.broadcast(mm))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("l_extendedprice"), 4).alias("bucket_min"),
            F.round(F.max("l_extendedprice"), 4).alias("bucket_max"),
        )
    )


@query(
    "agg_count_if_family",
    category="aggregate",
    oracle=f"""
    SELECT event_type,
           COUNT(CASE WHEN value > 100.0 THEN 1 END) AS n_big,
           {sql_dsum('CASE WHEN value > 100.0 THEN value END')} AS sum_big,
           ROUND({sql_dsum('CASE WHEN value > 100.0 THEN value END')}
                 / NULLIF(COUNT(CASE WHEN value > 100.0 THEN 1 END), 0), 4)
             AS avg_big,
           COUNT(DISTINCT CASE WHEN value > 100.0 THEN user_id END)
             AS uniq_users_big
    FROM events GROUP BY event_type
    """,
)
def agg_count_if_family(spark, sf_dir):
    """ClickHouse -If combinator family parity: countIf / sumIf / avgIf /
    uniqExactIf in one aggregation. Each is a conditional projection
    feeding a plain aggregate — one partial+final pass, and the distinct
    branch rides Spark's expand-based multi-distinct planning (no second
    query). avgIf = decimal sumIf / countIf with NULLIF guarding empty
    groups, so both engines emit identical nulls."""
    ev = table(spark, sf_dir, "events")
    big = F.col("value") > 100.0
    sum_big = dsum(F.when(big, F.col("value")))
    n_big = F.count(F.when(big, 1))
    return ev.groupBy("event_type").agg(
        n_big.alias("n_big"),
        sum_big.alias("sum_big"),
        F.round(sum_big / F.nullif(n_big, F.lit(0)), 4).alias("avg_big"),
        F.count_distinct(F.when(big, F.col("user_id"))).alias("uniq_users_big"),
    )


@query(
    "agg_bit_ops",
    category="aggregate",
    oracle="""
    SELECT o_orderstatus,
           BIT_AND(o_orderkey) AS key_and,
           BIT_OR(o_orderkey)  AS key_or,
           BIT_XOR(o_orderkey) AS key_xor
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bit_ops(spark, sf_dir):
    """ClickHouse groupBitAnd/Or/Xor parity: bitwise aggregate reductions
    (set-membership fingerprints over integer keys). All three are
    associative+commutative, so they combine map-side like sum — one
    partial+final pass, order-independent by construction."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
    )


@query(
    "agg_hll_sketch_union",
    category="aggregate",
    check="TOL",
    oracle="SELECT CAST(1 AS BOOLEAN) AS within_tolerance",
)
def agg_hll_sketch_union(spark, sf_dir):
    """Mergeable distinct-count SKETCHES as first-class values (ClickHouse
    uniqCombinedState/-Merge parity): hll_sketch_agg builds an Apache
    DataSketches HLL per order status, hll_union_agg merges the sketch
    COLUMN into a corpus-wide sketch — the pre-aggregation pattern that
    lets 100 TB dashboards union daily sketches instead of rescanning
    raw data. The merged estimate must land within 5% of the exact
    distinct count; the check runs in-query so the output is a
    deterministic boolean (same trick as agg_approx_percentile)."""
    o = table(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = o.select(F.count_distinct("o_custkey").alias("ex"))
    return merged.crossJoin(exact).select(
        (
            (F.abs(F.col("est") - F.col("ex")) / F.col("ex")) <= F.lit(0.05)
        ).alias("within_tolerance")
    )


@query(
    "agg_mode_deterministic",
    category="aggregate",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    r AS (
      SELECT o_orderstatus, o_orderpriority, n,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY n DESC, o_orderpriority) AS rn
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
    FROM r WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark, sf_dir):
    """Deterministic mode (most frequent value per group): both engines'
    native mode() break frequency ties arbitrarily, so the portable form
    is count + arg-max with an explicit (count DESC, value) tie-break —
    here as max_by over a struct, one aggregation pipeline (count per
    pair, then arg-max per group), no window on the Spark side."""
    o = table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    # order key: maximize n, then MINIMIZE priority string => invert via
    # struct(n, negated-rank) is awkward for strings; use min_by on
    # (-n, priority) struct instead — lexicographic struct comparison
    key = F.struct((-F.col("n")).alias("neg_n"), F.col("o_orderpriority"))
    return c.groupBy("o_orderstatus").agg(
        F.min_by("o_orderpriority", key).alias("mode_priority"),
        F.min_by("n", key).alias("mode_count"),
    )


@query(
    "agg_weighted_median",
    category="aggregate",
    oracle="""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY n_chars, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS tot
      FROM documents
    ),
    q AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk
      FROM c WHERE 2 * cum >= tot
    )
    SELECT source, n_chars AS median_len, doc_id AS median_doc
    FROM q WHERE rk = 1
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Weighted median (ClickHouse ``quantileExactWeighted(0.5)``): the
    document holding the middle BYTE of each source's corpus — the first
    doc, in (size, id) order, whose cumulative size reaches half the
    total. All arithmetic is exact integer cumsum (2·cum ≥ tot instead of
    a float fraction); one shuffle on source shared by both windows and
    the ranked pick."""
    docs = table(spark, sf_dir, "documents")
    wcum = (
        W.partitionBy("source")
        .orderBy("n_chars", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("source")
    c = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(wcum).alias("cum"),
        F.sum("n_chars").over(wall).alias("tot"),
    ).where(F.lit(2) * F.col("cum") >= F.col("tot"))
    rk = W.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        c.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            "source",
            F.col("n_chars").alias("median_len"),
            F.col("doc_id").alias("median_doc"),
        )
    )


@query(
    "agg_moments_skew_kurtosis",
    category="aggregate",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(n_chars) AS DOUBLE) AS s1,
             CAST(SUM(n_chars * n_chars) AS DOUBLE) AS s2,
             CAST(SUM(n_chars * n_chars * n_chars) AS DOUBLE) AS s3
      FROM documents GROUP BY source
    )
    SELECT source, n,
           ROUND(s1 / n, 4) AS mean_len,
           ROUND((s2 / n) - (s1 / n) * (s1 / n), 4) AS var_pop,
           ROUND(((s3 / n) - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow((s2 / n) - (s1 / n) * (s1 / n), 1.5), 4) AS skewness
    FROM s
    """,
)
def agg_moments_skew_kurtosis(spark, sf_dir):
    """Population skewness from raw moments — the length-distribution
    shape check a corpus-curation pipeline runs per source (long-tail vs
    truncated sources behave differently under packing). Because n_chars
    is an INTEGER, Σx, Σx², Σx³ are all exact BIGINT sums (no decimal
    idiom needed, no float accumulation anywhere): both engines derive
    skewness from identical integers through the identical closed-form
    double expression. Spark's built-in `skewness()` would NOT hash-match
    DuckDB's (different accumulation + bias correction); the raw-moment
    spelling is the portable one. One partial+final aggregation."""
    docs = table(spark, sf_dir, "documents")
    x = F.col("n_chars")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
        F.sum(x * x * x).cast("double").alias("s3"),
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    m2 = F.col("s2") / n
    m3 = F.col("s3") / n
    var_pop = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var_pop, 1.5)
    return s.select(
        "source",
        "n",
        F.round(m1, 4).alias("mean_len"),
        F.round(var_pop, 4).alias("var_pop"),
        F.round(skew, 4).alias("skewness"),
    )


@query(
    "agg_hll_intersection",
    category="aggregate",
    check="TOL",
    oracle="SELECT CAST(1 AS BOOLEAN) AS within_tolerance",
)
def agg_hll_intersection(spark, sf_dir):
    """Sketch set algebra: |A∩B| for two event audiences (click vs view
    users) via inclusion-exclusion over DataSketches HLL — |A|+|B|-|A∪B|
    with only three mergeable sketches, the way a 100 TB audience-overlap
    dashboard avoids a distinct-join. Inclusion-exclusion amplifies HLL
    error, so the in-query tolerance is 15% of the exact intersection;
    the output is the deterministic boolean (same contract as
    agg_hll_sketch_union)."""
    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "view")
    est_a = a.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("ea"))
    est_b = b.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("eb"))
    est_u = (
        a.unionAll(b)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("eu"))
    )
    exact = (
        a.select("user_id")
        .intersect(b.select("user_id"))
        .agg(F.count(F.lit(1)).alias("ex"))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(exact)
        .select(
            (
                F.abs((F.col("ea") + F.col("eb") - F.col("eu")) - F.col("ex"))
                <= F.greatest(F.lit(0.15) * F.col("ex"), F.lit(3.0))
            ).alias("within_tolerance")
        )
    )


@query(
    "agg_count_distinct_multi",
    category="aggregate",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS u_users,
           COUNT(DISTINCT CAST(ts AS DATE)) AS u_days,
           COUNT(*) AS n_rows
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct_multi(spark, sf_dir):
    """Multiple DISTINCT aggregates over different columns in ONE
    aggregation — Catalyst plans this with an Expand operator (each input
    row replicated once per distinct set, null-masked), then a two-level
    aggregate; the single-pass alternative to running the query once per
    distinct column. The Expand shape is asserted in tests/test_plans.py
    — losing it to a naive multi-pass rewrite is a 100 TB regression
    (three scans instead of one)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("u_users"),
        F.count_distinct(F.col("ts").cast("date")).alias("u_days"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_cramers_v",
    category="aggregate",
    oracle="""
    WITH obs AS (
      SELECT event_type AS a, CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS b,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT a, b, o,
             SUM(o) OVER (PARTITION BY a) AS ra,
             SUM(o) OVER (PARTITION BY b) AS cb,
             SUM(o) OVER () AS n
      FROM obs
    ),
    chi AS (
      SELECT SUM(pow(o - ra * cb * 1.0 / n, 2) / (ra * cb * 1.0 / n)) AS chi2,
             MAX(n) AS n,
             COUNT(DISTINCT a) AS ka, COUNT(DISTINCT b) AS kb
      FROM margins
    )
    SELECT ROUND(sqrt(chi2 / (n * LEAST(ka - 1, kb - 1))), 4) AS cramers_v
    FROM chi
    """,
)
def agg_cramers_v(spark, sf_dir):
    """ClickHouse ``cramersV``: association strength between two
    categorical columns (event type × ISO weekday) from the χ²
    contingency statistic — the feature-redundancy screen of a
    training-data audit. Observed and marginal counts are exact
    integers, expected frequencies exact rationals, so both engines
    evaluate the identical double expression per cell; the ≤35-term χ²
    sum is far inside the 4-dp rounding. Zero-margin cells cannot occur
    (margins come from the observed cells themselves)."""
    ev = table(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("long")
    obs = ev.groupBy(
        F.col("event_type").alias("a"), iso_dow.alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = obs.select(
        "a",
        "b",
        "o",
        F.sum("o").over(W.partitionBy("a")).alias("ra"),
        F.sum("o").over(W.partitionBy("b")).alias("cb"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("ra") * F.col("cb") * 1.0 / F.col("n")
    chi = m.agg(
        F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
        F.max("n").alias("n"),
        F.count_distinct("a").alias("ka"),
        F.count_distinct("b").alias("kb"),
    )
    return chi.select(
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("ka") - 1, F.col("kb") - 1))
            ),
            4,
        ).alias("cramers_v")
    )


@query(
    "agg_filter_clause",
    category="aggregate",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000.0)
             AS big_spenders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark, sf_dir):
    """ANSI aggregate FILTER (WHERE …) clause, run VERBATIM through
    spark.sql — the same SQL string satisfies both engines (Spark ≥ 3.0
    parses FILTER natively; it plans to the identical conditional
    aggregate as the count_if family in agg_count_if_family, this entry
    pins the SYNTAX surface)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000.0)
                 AS big_spenders
        FROM orders GROUP BY o_orderpriority
        """
    )


@query(
    "agg_pythagorean_means",
    category="aggregate",
    oracle=f"""
    SELECT event_type,
           ROUND({sql_davg('value')}, 4) AS mean_arith,
           ROUND(exp(SUM(ln(value)) / COUNT(*)), 4) AS mean_geom,
           ROUND(COUNT(*) / SUM(1.0 / value), 4) AS mean_harm
    FROM events WHERE value > 0
    GROUP BY event_type
    """,
)
def agg_pythagorean_means(spark, sf_dir):
    """The three Pythagorean means per group: arithmetic (decimal-exact
    idiom), geometric (exp∘mean∘ln — the right average for ratios/
    growth factors), harmonic (the right average for rates). The log and
    reciprocal sums are floating-point, but their partition-order noise
    is ~1e-12 relative — far below the 4-dp rounding; the strictly
    positive filter guards ln/division. One partial+final aggregation
    computes all three."""
    ev = table(spark, sf_dir, "events").where(F.col("value") > 0)
    n = F.count(F.lit(1))
    return ev.groupBy("event_type").agg(
        r4(davg("value")).alias("mean_arith"),
        r4(F.exp(F.sum(F.log("value")) / n)).alias("mean_geom"),
        r4(n / F.sum(F.lit(1.0) / F.col("value"))).alias("mean_harm"),
    )


@query(
    "agg_mann_whitney_u",
    category="aggregate",
    oracle="""
    WITH pooled AS (
      SELECT event_type, value FROM events
      WHERE event_type IN ('view', 'purchase')
    ),
    ranked AS (
      SELECT event_type,
             -- doubled mid-rank of a tie block: 2*min_rank + ties - 1 (integer)
             2 * RANK() OVER (ORDER BY value)
               + COUNT(*) OVER (PARTITION BY value) - 1 AS r2
      FROM pooled
    )
    SELECT
      CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      ROUND(SUM(CASE WHEN event_type = 'view' THEN r2 ELSE 0 END) / 2.0
            - SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              * (SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) + 1) / 2.0,
            4) AS u1,
      ROUND(SUM(CASE WHEN event_type = 'purchase' THEN r2 ELSE 0 END) / 2.0
            - SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              * (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) + 1) / 2.0,
            4) AS u2
    FROM ranked
    """,
)
def agg_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) comparing the `value`
    distribution of two event types — the nonparametric A/B answer to
    "did purchases shift the metric?" (ClickHouse ships it as
    mannWhitneyUTest; the reference's stack would reach for it in
    ClickHouse). Entirely integer arithmetic until the final halving:
    the mid-rank of a tie block is (2*min_rank + ties - 1)/2, kept
    DOUBLED so rank sums stay exact BIGINTs; U_g = R_g - n_g(n_g+1)/2.
    One global window sort (the pooled sample is a filtered fraction of
    the table) then a single-row aggregate; at 100 TB the rank can be
    decomposed per-partition with offset correction, but the filtered
    two-arm sample is typically small enough to window directly."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    r2 = (
        2 * F.rank().over(W.orderBy("value"))
        + F.count(F.lit(1)).over(W.partitionBy("value"))
        - 1
    )
    ranked = ev.select("event_type", r2.alias("r2"))
    is1 = F.when(F.col("event_type") == "view", 1).otherwise(0)
    is2 = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    n1 = F.sum(is1)
    n2 = F.sum(is2)
    r1 = F.sum(F.when(F.col("event_type") == "view", F.col("r2")).otherwise(0))
    rr2 = F.sum(F.when(F.col("event_type") == "purchase", F.col("r2")).otherwise(0))
    return ranked.agg(
        n1.alias("n1"),
        n2.alias("n2"),
        F.round(r1 / 2.0 - n1 * (n1 + 1) / 2.0, 4).alias("u1"),
        F.round(rr2 / 2.0 - n2 * (n2 + 1) / 2.0, 4).alias("u2"),
    )


@query(
    "agg_welch_ttest",
    category="aggregate",
    oracle="""
    WITH scaled AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n, SUM(y) AS s, SUM(y * y) AS ss
      FROM scaled GROUP BY event_type
    ),
    w AS (
      SELECT
        MAX(CASE WHEN event_type = 'view' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'view' THEN s END) AS s1,
        MAX(CASE WHEN event_type = 'view' THEN ss END) AS ss1,
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'purchase' THEN s END) AS s2,
        MAX(CASE WHEN event_type = 'purchase' THEN ss END) AS ss2
      FROM m
    )
    SELECT n1, n2,
      ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / 100.0, 4)
        AS mean_diff,
      ROUND(
        (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        / SQRT(
            (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1
          + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2
          ),
        4) AS t_stat
    FROM w
    """,
)
def agg_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t statistic between two event types
    (ClickHouse welchTTest). The fixture's `value` is exactly 2-dp, so
    y = round(value*100) is an exact BIGINT and every moment (n, Σy,
    Σy²) is exact integer arithmetic — no decimal-product tie-rounding
    hazard, no accumulation-order noise. The t statistic is then a
    fixed dataflow over identical integers on both engines, so the
    IEEE double result matches bit-for-bit before the 4-dp round. One
    partial+final aggregation, single-row output; scales as a pure
    map-side-combine aggregate at any data size."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    scaled = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("y")
    )
    m = scaled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )
    pick = lambda t, c: F.max(F.when(F.col("event_type") == t, F.col(c)))
    w = m.agg(
        pick("view", "n").alias("n1"), pick("view", "s").alias("s1"),
        pick("view", "ss").alias("ss1"),
        pick("purchase", "n").alias("n2"), pick("purchase", "s").alias("s2"),
        pick("purchase", "ss").alias("ss2"),
    )
    n1, s1, ss1 = F.col("n1"), F.col("s1").cast("double"), F.col("ss1").cast("double")
    n2, s2, ss2 = F.col("n2"), F.col("s2").cast("double"), F.col("ss2").cast("double")
    mdiff = s1 / n1 - s2 / n2
    se = F.sqrt(
        (ss1 - s1 * F.col("s1") / n1) / (n1 - 1) / n1
        + (ss2 - s2 * F.col("s2") / n2) / (n2 - 1) / n2
    )
    return w.select(
        "n1", "n2",
        F.round(mdiff / 100.0, 4).alias("mean_diff"),
        F.round(mdiff / se, 4).alias("t_stat"),
    )


@query(
    "agg_regr_ols",
    category="aggregate",
    oracle="""
    WITH scaled AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM scaled GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
      ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 4) AS slope,
      ROUND((sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * (sx / n))
            / 100.0, 4) AS intercept,
      ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
    FROM m
    """,
)
def agg_regr_ols(spark, sf_dir):
    """Grouped ordinary-least-squares fit of l_extendedprice on l_quantity
    (ClickHouse simpleLinearRegression; ANSI regr_slope / regr_intercept /
    regr_r2) — slope recovers the mean unit price per return flag. Built
    from exact integer moments instead of the builtin regr_* aggregates:
    l_quantity is an exact small integer and the price is exact at 2 dp, so
    n, Σx, Σy, Σxy, Σx², Σy² accumulate exactly in DECIMAL(38,0)
    (Σy² ≈ 1e14/row overflows BIGINT at scale), making the final DOUBLE
    dataflow bit-identical on both engines before the 4-dp round. One
    partial+final hash aggregate — map-side combine collapses the shuffle to
    |groups| rows per partition at any scale."""
    li = table(spark, sf_dir, "lineitem")
    scaled = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    m = scaled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return m.select(
        "l_returnflag",
        "n",
        F.round(cov / varx / 100.0, 4).alias("slope"),
        F.round((sy / n - cov / varx * (sx / n)) / 100.0, 4).alias("intercept"),
        F.round(cov * cov / (varx * vary), 4).alias("r2"),
    ).orderBy("l_returnflag")


@query(
    "ch_rank_corr",
    category="ch-analytics",
    oracle="""
    WITH ranked AS (
      SELECT
        2 * RANK() OVER (ORDER BY l_quantity)
          + COUNT(*) OVER (PARTITION BY l_quantity) - 1 AS rx,
        2 * RANK() OVER (ORDER BY l_extendedprice)
          + COUNT(*) OVER (PARTITION BY l_extendedprice) - 1 AS ry
      FROM lineitem
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM ranked
    )
    SELECT n,
      ROUND((n * sxy - sx * sy)
            / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS rho
    FROM m
    """,
)
def ch_rank_corr(spark, sf_dir):
    """Spearman rank correlation between quantity and extended price
    (ClickHouse rankCorr) — the monotone-association answer robust to the
    price column's skew. Tie blocks get the textbook mid-rank, kept DOUBLED
    (2*min_rank + ties - 1) so every rank is an exact BIGINT (the doubling
    cancels in the correlation); the Pearson formula then runs over exact
    DECIMAL(38,0) rank moments (Σr² ≈ n³ overflows BIGINT past ~2M rows),
    so the DOUBLE dataflow is bit-identical on both engines. Two global
    sorts for the ranks; at 100 TB each becomes a range-partitioned sort
    with per-partition offset correction — still two shuffles, no
    driver-side state."""
    li = table(spark, sf_dir, "lineitem")
    mid = lambda c: (
        2 * F.rank().over(W.orderBy(c)) + F.count(F.lit(1)).over(W.partitionBy(c)) - 1
    )
    ranked = li.select(
        mid("l_quantity").alias("rx"), mid("l_extendedprice").alias("ry")
    )
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("rx")).alias("sx"),
        dec(F.col("ry")).alias("sy"),
        dec(F.col("rx") * F.col("ry")).alias("sxy"),
        dec(F.col("rx") * F.col("rx")).alias("sxx"),
        dec(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "n",
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            4,
        ).alias("rho"),
    )


@query(
    "ch_kolmogorov_smirnov",
    category="ch-analytics",
    oracle="""
    WITH arms AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY value
    ),
    ecdf AS (
      SELECT
        SUM(c1) OVER (ORDER BY value) AS cum1,
        SUM(c2) OVER (ORDER BY value) AS cum2,
        SUM(c1) OVER () AS n1,
        SUM(c2) OVER () AS n2
      FROM arms
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
           ROUND(CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                 / (MAX(n1) * MAX(n2)), 4) AS d_stat
    FROM ecdf
    """,
)
def ch_kolmogorov_smirnov(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov D statistic between the `view` and
    `purchase` value distributions (ClickHouse kolmogorovSmirnovTest) —
    D = sup |F1(x) - F2(x)| over the pooled sample. The ECDF difference is
    kept as the exact integer |cum1*n2 - cum2*n1| (cross-multiplied to
    avoid fractions) and divided once at the end, so the whole computation
    is integer arithmetic until a single exact division. Pre-aggregating
    per distinct value collapses the window input to |distinct values|
    rows; the single cumulative window is a range-partitionable prefix sum
    at scale."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    arms = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c2"),
    )
    wcum = W.orderBy("value").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.orderBy("value").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ecdf = arms.select(
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c2").over(wcum).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    return ecdf.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.round(
            F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")))
            .cast("double")
            / (F.max("n1") * F.max("n2")),
            4,
        ).alias("d_stat"),
    )


@query(
    "ch_anova",
    category="ch-analytics",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v100
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(v100 AS DECIMAL(38,0))) AS BIGINT) AS s,
             CAST(SUM(CAST(v100 * v100 AS DECIMAL(38,0))) AS BIGINT) AS q
      FROM v GROUP BY event_type
    ),
    arr AS (
      SELECT list_sort(list({'t': event_type, 'n': n, 's': s, 'q': q})) AS gs FROM g
    ),
    m AS (
      SELECT len(gs) AS k,
             list_reduce(list_transform(gs, x -> x.n), (a, b) -> a + b) AS n,
             list_reduce(list_transform(gs, x -> x.s), (a, b) -> a + b) AS s,
             list_reduce(list_transform(gs, x -> x.q), (a, b) -> a + b) AS q,
             list_reduce(list_transform(gs, x -> x.s::DOUBLE * x.s / x.n),
                         (a, b) -> a + b) AS sb_part
      FROM arr
    )
    SELECT k, n,
           ROUND(((sb_part - s::DOUBLE * s / n) / (k - 1))
                 / ((q - sb_part) / (n - k)), 4) AS f_stat
    FROM m
    """,
)
def ch_anova(spark, sf_dir):
    """One-way ANOVA F-statistic across event types (ClickHouse
    analysisOfVariance parity). 2-dp values scale to exact BIGINT
    moments per group; the cross-group reductions run as ORDER-PINNED
    sequential folds over a sorted struct array (F.aggregate ==
    list_reduce), so the double arithmetic happens in the identical
    order on both engines — the same determinism idiom as
    ts_ema_bounded / ch_rank_corr."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v100 = F.round(F.col("value") * 100).cast("long")
    g = ev.select("event_type", v100.alias("v100")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v100").cast(T.DecimalType(38, 0))).cast("long").alias("s"),
        F.sum((F.col("v100") * F.col("v100")).cast(T.DecimalType(38, 0)))
        .cast("long")
        .alias("q"),
    )
    arr = g.agg(
        F.array_sort(F.collect_list(F.struct("event_type", "n", "s", "q"))).alias("gs")
    )
    fold = lambda expr: F.aggregate(expr, F.lit(0.0), lambda a, b: a + b)  # noqa: E731
    gs = F.col("gs")
    k = F.size(gs)
    n = fold(F.transform(gs, lambda x: x["n"].cast("double"))).cast("long")
    s = fold(F.transform(gs, lambda x: x["s"].cast("double")))
    q = fold(F.transform(gs, lambda x: x["q"].cast("double")))
    sb_part = fold(F.transform(gs, lambda x: x["s"].cast("double") * x["s"] / x["n"]))
    ssb = (sb_part - s * s / n) / (k - 1)
    ssw = (q - sb_part) / (n - k)
    return arr.select(
        k.alias("k"), n.alias("n"), F.round(ssb / ssw, 4).alias("f_stat")
    )


@query(
    "ch_contingency",
    category="aggregate",
    oracle="""
    WITH obs AS (
      SELECT event_type AS a, CAST(EXTRACT(month FROM ts) AS BIGINT) AS b,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT a, b, o,
             SUM(o) OVER (PARTITION BY a) AS ra,
             SUM(o) OVER (PARTITION BY b) AS cb,
             SUM(o) OVER () AS n
      FROM obs
    ),
    chi AS (
      SELECT SUM(pow(o - ra * cb * 1.0 / n, 2) / (ra * cb * 1.0 / n)) AS chi2,
             MAX(n) AS n
      FROM margins
    )
    SELECT ROUND(sqrt(chi2 / (chi2 + n)), 4) AS contingency
    FROM chi
    """,
)
def ch_contingency(spark, sf_dir):
    """ClickHouse ``contingency``: Pearson's contingency coefficient
    sqrt(chi2/(chi2+n)) between event type and calendar month — the
    bounded-[0,1) companion of agg_cramers_v (same exact-integer
    contingency machinery, different normalizer and column pair, so the
    two queries cross-check each other's chi2 path). One groupBy on the
    two low-cardinality keys, window margins over the tiny cell table —
    the corpus-sized scan aggregates map-side."""
    ev = table(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.col("event_type").alias("a"), F.month("ts").cast("long").alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = obs.select(
        "a",
        "b",
        "o",
        F.sum("o").over(W.partitionBy("a")).alias("ra"),
        F.sum("o").over(W.partitionBy("b")).alias("cb"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("ra") * F.col("cb") * 1.0 / F.col("n")
    chi = m.agg(
        F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
        F.max("n").alias("n"),
    )
    return chi.select(
        F.round(
            F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n"))), 4
        ).alias("contingency")
    )


@query(
    "agg_theta_set_ops",
    category="aggregate",
    check="TOL",
    oracle="""
    SELECT CAST(1 AS BOOLEAN) AS union_ok,
           CAST(1 AS BOOLEAN) AS inter_ok,
           CAST(1 AS BOOLEAN) AS diff_ok
    """,
)
def agg_theta_set_ops(spark, sf_dir):
    """DataSketches Theta set algebra — the sketch family built for set
    OPERATIONS (HLL unions only; Theta intersects and differences
    natively, without inclusion-exclusion error amplification):
    click-audience ∪/∩/∖ view-audience, each from mergeable per-month
    partial sketches (theta_sketch_agg → theta_union_agg — the two-level
    merge a 100 TB dashboard ships to combine per-partition sketches
    without re-scanning). Each estimate is gated in-query against the
    exact count at 10% + 3 absolute; output is the deterministic boolean
    triple (agg_hll_intersection contract)."""
    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "view")
    ska = a.groupBy(F.month("ts").alias("m")).agg(
        F.theta_sketch_agg("user_id").alias("sk")
    ).agg(F.theta_union_agg("sk").alias("ska"))
    skb = b.groupBy(F.month("ts").alias("m")).agg(
        F.theta_sketch_agg("user_id").alias("sk")
    ).agg(F.theta_union_agg("sk").alias("skb"))
    est = ska.crossJoin(skb).select(
        F.theta_sketch_estimate(F.theta_union(F.col("ska"), F.col("skb"))).alias("eu"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("ska"), F.col("skb"))
        ).alias("ei"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("ska"), F.col("skb"))
        ).alias("ed"),
    )
    exact = (
        a.select("user_id").union(b.select("user_id")).distinct()
        .agg(F.count(F.lit(1)).alias("xu"))
        .crossJoin(
            a.select("user_id").intersect(b.select("user_id"))
            .agg(F.count(F.lit(1)).alias("xi"))
        )
        .crossJoin(
            a.select("user_id").distinct().exceptAll(b.select("user_id").distinct())
            .agg(F.count(F.lit(1)).alias("xd"))
        )
    )
    gate = lambda e, x: F.abs(F.col(e) - F.col(x)) <= F.greatest(
        F.lit(0.10) * F.col(x), F.lit(3.0)
    )
    return est.crossJoin(exact).select(
        gate("eu", "xu").alias("union_ok"),
        gate("ei", "xi").alias("inter_ok"),
        gate("ed", "xd").alias("diff_ok"),
    )


@query(
    "agg_kll_quantiles",
    category="aggregate",
    check="TOL",
    oracle="""
    SELECT CAST(1 AS BOOLEAN) AS median_ok, CAST(1 AS BOOLEAN) AS p95_ok,
           CAST(1 AS BOOLEAN) AS rank_ok
    """,
)
def agg_kll_quantiles(spark, sf_dir):
    """DataSketches KLL quantile sketch — the mergeable streaming-quantile
    structure (rank error ε≈1.7% at k=200, independent of stream size):
    per-month partial sketches of event values merged via
    kll_sketch_merge into one corpus sketch, then median / p95 /
    rank-of-100 read off it. Each is gated in-query against the exact
    percentile_approx(…, 1e6)-free truth (exact sort-based percentile
    via DOUBLE sort) at 5% relative rank tolerance; deterministic
    boolean output (agg_hll_sketch_union contract). This is the
    distributed-quantile answer at 100 TB — exact grouped quantiles
    (agg_percentiles) re-sort per query, the sketch merges in one pass
    and answers any quantile after."""
    ev = table(spark, sf_dir, "events")
    monthly = ev.groupBy(F.month("ts").alias("m")).agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    merged = monthly.agg(F.kll_merge_agg_double("sk").alias("sk"))
    est = merged.select(
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)).alias("em"),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.95)).alias("e95"),
        F.kll_sketch_get_rank_double(F.col("sk"), F.lit(100.0)).alias("er"),
    )
    exact = ev.agg(
        F.expr("percentile(value, 0.5)").alias("xm"),
        F.expr("percentile(value, 0.95)").alias("x95"),
        (
            F.sum(F.when(F.col("value") <= 100.0, 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("xr"),
    )
    return est.crossJoin(exact).select(
        (
            F.abs(F.col("em") - F.col("xm"))
            <= F.lit(0.05) * F.greatest(F.abs(F.col("xm")), F.lit(1.0))
        ).alias("median_ok"),
        (
            F.abs(F.col("e95") - F.col("x95"))
            <= F.lit(0.05) * F.greatest(F.abs(F.col("x95")), F.lit(1.0))
        ).alias("p95_ok"),
        (F.abs(F.col("er") - F.col("xr")) <= F.lit(0.05)).alias("rank_ok"),
    )


@query(
    "agg_corr_covar",
    category="aggregate",
    oracle="""
    WITH scaled AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
             CAST(o_orderkey AS BIGINT) % 7 + CAST(o_custkey AS BIGINT) % 1000 AS y
      FROM orders
    ),
    m AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM scaled GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
      ROUND((sxy - sx * sy / n) / n / 10000.0, 4) AS covar_pop,
      ROUND((sxy - sx * sy / n) / (n - 1) / 10000.0, 4) AS covar_samp,
      ROUND((n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 4) AS corr
    FROM m
    """,
)
def agg_corr_covar(spark, sf_dir):
    """ANSI covar_pop / covar_samp / corr (ClickHouse covarPop /
    covarSamp / corr) between order value and a synthetic
    customer-mix column, grouped by order priority — built from exact DECIMAL(38,0)
    integer moments like agg_regr_ols (prices exact at 2 dp; the builtin
    double-accumulating aggregates would be partitioning-dependent), so
    the final DOUBLE expressions are bit-identical on both engines
    before the 4-dp round; covariances unscale by the 100² price factor.
    One partial+final hash aggregate, map-side combinable."""
    o = table(spark, sf_dir, "orders")
    scaled = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
        (
            F.col("o_orderkey").cast("long") % 7
            + F.col("o_custkey").cast("long") % 1000
        ).alias("y"),
    )
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    m = scaled.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "o_orderpriority",
        "n",
        F.round((sxy - sx * sy / n) / n / 10000.0, 4).alias("covar_pop"),
        F.round((sxy - sx * sy / n) / (n - 1) / 10000.0, 4).alias("covar_samp"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            4,
        ).alias("corr"),
    )


@query(
    "ch_student_ttest",
    category="aggregate",
    oracle="""
    WITH scaled AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n, SUM(y) AS s, SUM(y * y) AS ss
      FROM scaled GROUP BY event_type
    ),
    w AS (
      SELECT
        MAX(CASE WHEN event_type = 'view' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'view' THEN s END) AS s1,
        MAX(CASE WHEN event_type = 'view' THEN ss END) AS ss1,
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'purchase' THEN s END) AS s2,
        MAX(CASE WHEN event_type = 'purchase' THEN ss END) AS ss2
      FROM m
    )
    SELECT n1, n2,
      ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / 100.0, 4)
        AS mean_diff,
      ROUND(
        (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
        / SQRT(
            ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
             + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
            / (n1 + n2 - 2)
            * (1.0 / n1 + 1.0 / n2)
          ),
        4) AS t_stat
    FROM w
    """,
)
def ch_student_ttest(spark, sf_dir):
    """Student's pooled-variance t statistic between two event types
    (ClickHouse studentTTest) — the equal-variance sibling of
    agg_welch_ttest, sharing its exact-integer-moment discipline: the
    2-dp fixture values scale to exact BIGINTs, so (n, Σy, Σy²) are
    exact on both engines and the pooled variance
    ((ss1 - s1²/n1) + (ss2 - s2²/n2)) / (n1 + n2 - 2) is a fixed IEEE
    dataflow over identical integers — bit-equal before the 4-dp
    round. One partial+final aggregate, single-row output; map-side
    combine all the way, so at 100 TB the reduce side sees 2 rows."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    scaled = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("y")
    )
    m = scaled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )
    pick = lambda t, c: F.max(F.when(F.col("event_type") == t, F.col(c)))
    w = m.agg(
        pick("view", "n").alias("n1"), pick("view", "s").alias("s1"),
        pick("view", "ss").alias("ss1"),
        pick("purchase", "n").alias("n2"), pick("purchase", "s").alias("s2"),
        pick("purchase", "ss").alias("ss2"),
    )
    n1, s1, ss1 = F.col("n1"), F.col("s1").cast("double"), F.col("ss1").cast("double")
    n2, s2, ss2 = F.col("n2"), F.col("s2").cast("double"), F.col("ss2").cast("double")
    mdiff = s1 / n1 - s2 / n2
    sp2 = (
        (ss1 - s1 * F.col("s1") / n1) + (ss2 - s2 * F.col("s2") / n2)
    ) / (n1 + n2 - 2)
    se = F.sqrt(sp2 * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    return w.select(
        "n1", "n2",
        F.round(mdiff / 100.0, 4).alias("mean_diff"),
        F.round(mdiff / se, 4).alias("t_stat"),
    )


@query(
    "ch_any_heavy",
    category="aggregate",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS a
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           split_part(
             list_reduce(
               list_prepend('|0', a),
               (acc, x) -> CASE
                 WHEN CAST(split_part(acc, '|', 2) AS BIGINT) = 0
                   THEN x || '|1'
                 WHEN split_part(acc, '|', 1) = x
                   THEN split_part(acc, '|', 1) || '|'
                        || CAST(CAST(split_part(acc, '|', 2) AS BIGINT) + 1 AS VARCHAR)
                 ELSE split_part(acc, '|', 1) || '|'
                      || CAST(CAST(split_part(acc, '|', 2) AS BIGINT) - 1 AS VARCHAR)
               END),
             '|', 1) AS heavy_type,
           len(a) AS n_events
    FROM ordered
    """,
)
def ch_any_heavy(spark, sf_dir):
    """ClickHouse ``anyHeavy`` parity: the Boyer-Moore majority-vote
    candidate of each user's event_type stream in time order. The
    single-pass heavy-hitter state (candidate, counter) is encoded as a
    'cand|count' string and advanced by a SEQUENTIAL left fold over the
    time-ordered list (F.aggregate ≡ DuckDB list_reduce with the state
    prepended as the first element, since list_reduce's accumulator must
    share the element type) — identical integer/string steps on both
    engines, so the emitted candidate is deterministic, unlike the
    engine-defined tie behavior of the native anyHeavy. One user_id
    exchange; the per-user list is bounded by per-user activity, and at
    100 TB the same fold runs as a streaming applyInPandasWithState pass
    without changing semantics. Event types never contain '|'."""
    ev = table(spark, sf_dir, "events")
    ordered = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("a")
    )
    bar = F.lit("|")
    cand = lambda acc: F.split_part(acc, bar, F.lit(1))
    cnt = lambda acc: F.split_part(acc, bar, F.lit(2)).cast("long")
    step = lambda acc, x: (
        F.when(cnt(acc) == 0, F.concat(x, F.lit("|1")))
        .when(
            cand(acc) == x,
            F.concat(cand(acc), bar, (cnt(acc) + 1).cast("string")),
        )
        .otherwise(F.concat(cand(acc), bar, (cnt(acc) - 1).cast("string")))
    )
    folded = F.aggregate(F.col("a"), F.lit("|0"), step)
    return ordered.select(
        "user_id",
        F.split_part(folded, bar, F.lit(1)).alias("heavy_type"),
        F.size("a").cast("long").alias("n_events"),
    )


@query(
    "ch_categorical_iv",
    category="aggregate",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS category,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_good,
             CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bad
      FROM orders GROUP BY o_orderpriority
    ),
    t AS (
      SELECT category, n_good, n_bad,
             SUM(n_good) OVER () AS tot_good,
             SUM(n_bad) OVER () AS tot_bad
      FROM c
    )
    SELECT category, n_good, n_bad,
           ROUND(ln((CAST(n_good AS DOUBLE) / tot_good)
                    / (CAST(n_bad AS DOUBLE) / tot_bad)), 4) AS woe,
           ROUND((CAST(n_good AS DOUBLE) / tot_good
                  - CAST(n_bad AS DOUBLE) / tot_bad)
                 * ln((CAST(n_good AS DOUBLE) / tot_good)
                      / (CAST(n_bad AS DOUBLE) / tot_bad)), 4) AS iv_term
    FROM t
    """,
)
def ch_categorical_iv(spark, sf_dir):
    """ClickHouse ``categoricalInformationValue`` parity: per-category
    Weight-of-Evidence and Information-Value contribution of order
    priority toward the binary outcome o_orderstatus = 'F' — the
    feature-screening statistic of credit-scoring / feature-selection
    pipelines. Counts are exact integers on both engines, so each WoE
    argument is the same rational and the single ln() per category (5
    categories) sits safely inside the 4-dp round (ch_entropy's log
    discipline). One partial+final aggregate plus an unpartitioned
    window over 5 rows — at 100 TB the reduce side sees one row per
    category, nothing else."""
    o = table(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_good"),
        F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).alias("n_bad"),
    )
    w = W.partitionBy()
    t = c.withColumn("tot_good", F.sum("n_good").over(w)).withColumn(
        "tot_bad", F.sum("n_bad").over(w)
    )
    pg = F.col("n_good").cast("double") / F.col("tot_good")
    pb = F.col("n_bad").cast("double") / F.col("tot_bad")
    woe = F.log(pg / pb)
    return t.select(
        "category", "n_good", "n_bad",
        F.round(woe, 4).alias("woe"),
        F.round((pg - pb) * woe, 4).alias("iv_term"),
    )


@query(
    "ch_stochastic_linreg",
    category="aggregate",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS grp,
             list([CAST(l_quantity AS DOUBLE) / 50.0,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) / 10000000.0]
                  ORDER BY l_orderkey, l_linenumber,
                           CAST(l_quantity AS DOUBLE) / 50.0,
                           CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           / 10000000.0) AS a
      FROM lineitem GROUP BY l_returnflag
    ),
    fit AS (
      SELECT grp, len(a) AS n,
             list_reduce(
               list_prepend([0.0::DOUBLE, 0.0::DOUBLE], a),
               (acc, e) -> [
                 acc[1] - 0.05 * ((acc[1] * e[1] + acc[2]) - e[2]) * e[1],
                 acc[2] - 0.05 * ((acc[1] * e[1] + acc[2]) - e[2])]) AS w
      FROM pts
    )
    SELECT grp, n, ROUND(w[1], 6) AS weight, ROUND(w[2], 6) AS bias
    FROM fit
    """,
)
def ch_stochastic_linreg(spark, sf_dir):
    """ClickHouse ``stochasticLinearRegression`` parity: one epoch of
    per-sample SGD (lr=0.05, no regularization) fitting normalized
    extendedprice from normalized quantity, per return flag. The
    sequential recursion w ← w − lr·(ŷ−y)·x is inherently order-
    dependent, so the sample order is PINNED to the full tuple
    (l_orderkey, l_linenumber, x, y) — the fixture's (orderkey,
    linenumber) alone is NOT unique, and any tie left unpinned would
    let the engines fold in different orders — and the update runs as
    a left fold whose accumulator is a 2-element DOUBLE LIST
    ([weight, bias], matching the element type as DuckDB list_reduce
    requires, state prepended). The state is a LIST and not a struct
    deliberately: DuckDB v1.0.0 evaluates struct_pack fold fields
    sequentially, so a y-expression reading acc.x sees the
    ALREADY-UPDATED x (verified with a 3-element probe); list-valued
    accumulators evaluate both elements against the old state. With
    that pinned, F.aggregate and list_reduce execute the identical
    +,·,− IEEE dataflow, bit-equal before the 6-dp round. Inputs are exact: quantity is an
    integer and the 2-dp price scales to an exact BIGINT before the
    normalizing division. One grp shuffle; the fold is serial per group
    by definition of SGD — at 100 TB you fit per-shard models this way
    and average (parameter mixing), which is this same query over a
    finer group key."""
    li = table(spark, sf_dir, "lineitem")
    pts = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "l_orderkey", "l_linenumber",
                        (F.col("l_quantity").cast("double") / 50.0).alias("x"),
                        (
                            F.round(F.col("l_extendedprice") * 100).cast("long")
                            / 10000000.0
                        ).alias("y"),
                    )
                )
            ),
            lambda s: F.array(s["x"], s["y"]),
        ).alias("a")
    )
    init = F.array(F.lit(0.0), F.lit(0.0))
    # residual bound once per step (timeseries._bind): the fold is serial
    # over the full group list, so halving the interpreted step tree
    # halves the dominant term; same IEEE ops, bit-identical result.
    from .timeseries import _bind

    step = lambda acc, e: _bind(
        (acc[0] * e[0] + acc[1]) - e[1],
        lambda r: F.array(
            acc[0] - 0.05 * r * e[0],
            acc[1] - 0.05 * r,
        ),
    )
    fit = pts.select(
        "grp",
        F.size("a").cast("long").alias("n"),
        F.aggregate("a", init, step).alias("w"),
    )
    return fit.select(
        "grp", "n",
        F.round(F.col("w")[0], 6).alias("weight"),
        F.round(F.col("w")[1], 6).alias("bias"),
    )


_CMS_ORACLE = """
WITH h AS (
  SELECT event_type,
         UNNEST(generate_series(0, 3)) AS row_id,
         ('0x' || substr(md5(UNNEST(generate_series(0, 3))::VARCHAR
                             || ':' || event_type), 1, 15))::BIGINT % 256
           AS bucket
  FROM events
),
counters AS (
  SELECT row_id, bucket, COUNT(*) AS c FROM h GROUP BY row_id, bucket
),
keys AS (
  SELECT DISTINCT event_type FROM events
),
probes AS (
  SELECT k.event_type, t.row_id,
         ('0x' || substr(md5(t.row_id::VARCHAR || ':' || k.event_type), 1, 15))::BIGINT
           % 256 AS bucket
  FROM keys k, (SELECT UNNEST(generate_series(0, 3)) AS row_id) t
),
est AS (
  SELECT p.event_type, MIN(c.c) AS cms_estimate
  FROM probes p JOIN counters c ON c.row_id = p.row_id AND c.bucket = p.bucket
  GROUP BY p.event_type
),
exact AS (
  SELECT event_type, COUNT(*) AS exact_count FROM events GROUP BY event_type
)
SELECT e.event_type, x.exact_count, e.cms_estimate,
       e.cms_estimate - x.exact_count AS overestimate
FROM est e JOIN exact x USING (event_type)
ORDER BY event_type
"""


@query("agg_count_min_sketch", category="aggregate", oracle=_CMS_ORACLE)
def agg_count_min_sketch(spark, sf_dir):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) built from scratch
    with the engine-portable md5 hash family — 4 rows × 256 counters,
    point estimate = min over rows of the probed counter. Unlike the
    opaque-binary sketch builtins this one is WHITE-BOX: the counter
    table is an ordinary groupBy (map-side combinable, mergeable across
    partitions/months by plain SUM — the same two-level-merge story as
    the theta/KLL rows), the estimate is a 4-way min join, and because
    the hashing is deterministic on both engines the oracle replays the
    ENTIRE sketch and the estimates hash-match EXACTly — including the
    one-sided error (estimate ≥ exact always; overestimate column shows
    the collision inflation directly against the exact counts). At
    100 TB the counter table is fixed 1024 cells regardless of stream
    size — the whole point of the sketch."""
    ev = table(spark, sf_dir, "events")
    h = ev.select(
        "event_type", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("row_id")
    ).select(
        "event_type",
        "row_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("row_id").cast("string"), F.lit(":"), F.col("event_type"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 256
        ).alias("bucket"),
    )
    counters = h.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    keys = ev.select("event_type").distinct()
    probes = keys.crossJoin(
        spark.range(4).select(F.col("id").cast("int").alias("row_id"))
    ).select(
        "event_type",
        "row_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("row_id").cast("string"), F.lit(":"), F.col("event_type"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 256
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(counters), ["row_id", "bucket"])
        .groupBy("event_type")
        .agg(F.min("c").alias("cms_estimate"))
    )
    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy("event_type")
    )


_BLOOM_WB_ORACLE = """
WITH members AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
),
mbits AS (
  SELECT ('0x' || substr(md5(j.j::VARCHAR || ':' || m.k::VARCHAR), 1, 15))::BIGINT
           % 8192 AS bitpos
  FROM members m, (SELECT UNNEST(generate_series(0, 2)) AS j) j
),
bloom AS (
  SELECT bitpos // 32 AS word, bit_or((1::BIGINT << (bitpos % 32))) AS w
  FROM mbits GROUP BY bitpos // 32
),
probes AS (
  SELECT c.c_custkey,
         ('0x' || substr(md5(j.j::VARCHAR || ':' || c.c_custkey::VARCHAR), 1, 15))::BIGINT
           % 8192 AS bitpos
  FROM customer c, (SELECT UNNEST(generate_series(0, 2)) AS j) j
),
verdict AS (
  SELECT p.c_custkey,
         MIN(CASE WHEN (COALESCE(b.w, 0) >> (p.bitpos % 32)) & 1 = 1
                  THEN 1 ELSE 0 END) AS bloom_pos
  FROM probes p LEFT JOIN bloom b ON b.word = p.bitpos // 32
  GROUP BY p.c_custkey
),
joined AS (
  SELECT v.c_custkey, v.bloom_pos,
         CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS is_member
  FROM verdict v LEFT JOIN members m ON m.k = v.c_custkey
)
SELECT COUNT(*) AS n_customers,
       CAST(SUM(is_member) AS BIGINT) AS n_members,
       CAST(SUM(bloom_pos) AS BIGINT) AS n_bloom_positive,
       CAST(SUM(CASE WHEN bloom_pos = 1 AND is_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positive,
       CAST((SUM(CASE WHEN bloom_pos = 1 AND is_member = 0 THEN 1 ELSE 0 END)
          * 1000000) // (COUNT(*) - SUM(is_member)) AS BIGINT) AS fp_rate_e6
FROM joined
"""


@query("agg_bloom_filter_membership", category="aggregate", oracle=_BLOOM_WB_ORACLE)
def agg_bloom_filter_membership(spark, sf_dir):
    """White-box Bloom filter (Bloom 1970), the manual twin of
    join_bloom_prefilter's engine-built lanes: an 8192-bit (1 KiB) filter over
    'P'-order customers as 256 x 32-bit words (positive-domain — the
    1<<63 sign corner never arises), k=3 portable md5 hashes, built by a
    plain mergeable bit_or groupBy (256-row state, the fixed-footprint
    sketch story again) and broadcast onto the probe side. Every
    customer is probed; the output prices the filter exactly: member
    count, bloom positives, FALSE positives (bloom's one-sided error —
    no false negatives is asserted by n_bloom_positive >= n_members,
    visible in the hashed row), and the 1e6-scale FP rate vs the
    theoretical (1-e^{-kn/m})^k at this fill (sized so the saturated sf0.01 member set still leaves a measurable, small FP rate). At 100 TB this is
    the shape that makes semi-join pushdown cheap: the 1 KiB filter
    ships to every scan task; only bloom-positive rows reach the
    shuffle. EXACT — DuckDB replays hashing, packing, probing, and
    counting bit-for-bit."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    members = (
        o.where(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    js = spark.range(3).select(F.col("id").cast("int").alias("j"))

    def bitpos(key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), key_col.cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 8192
        )

    mbits = members.crossJoin(F.broadcast(js)).select(bitpos(F.col("k")).alias("bitpos"))
    bloom = mbits.groupBy(F.expr("bitpos div 32").alias("word")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 32 AS INT))")
        ).alias("w")
    )
    probes = c.crossJoin(F.broadcast(js)).select(
        "c_custkey", bitpos(F.col("c_custkey")).alias("bitpos")
    )
    verdict = (
        probes.withColumn("word", F.expr("bitpos div 32"))
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("c_custkey")
        .agg(
            F.min(
                F.when(
                    F.expr(
                        "shiftright(coalesce(w, CAST(0 AS BIGINT)),"
                        " CAST(bitpos % 32 AS INT)) & 1"
                    )
                    == 1,
                    1,
                ).otherwise(0)
            ).alias("bloom_pos")
        )
    )
    joined = verdict.join(
        members.withColumnRenamed("k", "c_custkey").withColumn("is_member", F.lit(1)),
        "c_custkey",
        "left",
    ).select("c_custkey", "bloom_pos", F.coalesce("is_member", F.lit(0)).alias("is_member"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("is_member").alias("n_members"),
        F.sum("bloom_pos").alias("n_bloom_positive"),
        F.sum(
            F.when((F.col("bloom_pos") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
        ).alias("n_false_positive"),
    ).select(
        "n_customers",
        "n_members",
        "n_bloom_positive",
        "n_false_positive",
        F.expr("(n_false_positive * 1000000) div (n_customers - n_members)").alias(
            "fp_rate_e6"
        ),
    )


@query(
    "agg_regr_multi",
    category="aggregate",
    oracle="""
    WITH scaled AS (
      SELECT l_linestatus,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE) AS s11,
             CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS s12,
             CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS s22,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x1 * y AS DECIMAL(38,0))) AS DOUBLE) AS s1y,
             CAST(SUM(CAST(x2 * y AS DECIMAL(38,0))) AS DOUBLE) AS s2y
      FROM scaled GROUP BY l_linestatus
    ),
    solved AS (
      SELECT l_linestatus, n,
             n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2) AS det,
             sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
               + s2 * (s1y * s12 - s11 * s2y) AS det0,
             n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s2y - s1y * s2) AS det1,
             n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2)
               + sy * (s1 * s12 - s11 * s2) AS det2
      FROM m
    )
    SELECT l_linestatus, n,
           ROUND(det0 / det / 100.0, 4) AS intercept,
           ROUND(det1 / det / 100.0, 4) AS beta_quantity,
           ROUND(det2 / det / 100.0, 4) AS beta_discount_pct
    FROM solved
    """,
)
def agg_regr_multi(spark, sf_dir):
    """TWO-feature OLS (price on quantity AND discount-percent) solved in
    closed form by Cramer's rule over the 3×3 normal equations — the
    multivariate step past agg_regr_ols's single regressor and
    ch_stochastic_linreg's SGD: the nine sufficient moments (n, Σx₁,
    Σx₂, Σx₁², Σx₁x₂, Σx₂², Σy, Σx₁y, Σx₂y) accumulate EXACTLY in
    DECIMAL(38,0) from integer-scaled inputs in ONE map-side-combinable
    pass, then the determinant arithmetic runs on identical doubles on
    both engines — bit-equal before the 4-dp round, no iteration, no
    matrix library. This moments-then-solve shape is how distributed
    OLS actually ships at 100 TB (the XᵀX Gram matrix is p×p tiny;
    only the moment aggregation touches data)."""
    li = table(spark, sf_dir, "lineitem")
    scaled = li.select(
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    m = scaled.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dec(x1).alias("s1"), dec(x2).alias("s2"),
        dec(x1 * x1).alias("s11"), dec(x1 * x2).alias("s12"),
        dec(x2 * x2).alias("s22"),
        dec(y).alias("sy"), dec(x1 * y).alias("s1y"), dec(x2 * y).alias("s2y"),
    )
    solved = m.select(
        "l_linestatus",
        "n",
        F.expr(
            "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
            " + s2 * (s1 * s12 - s11 * s2)"
        ).alias("det"),
        F.expr(
            "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
            " + s2 * (s1y * s12 - s11 * s2y)"
        ).alias("det0"),
        F.expr(
            "n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2)"
            " + s2 * (s1 * s2y - s1y * s2)"
        ).alias("det1"),
        F.expr(
            "n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2)"
            " + sy * (s1 * s12 - s11 * s2)"
        ).alias("det2"),
    )
    return solved.select(
        "l_linestatus",
        "n",
        F.round(F.col("det0") / F.col("det") / 100.0, 4).alias("intercept"),
        F.round(F.col("det1") / F.col("det") / 100.0, 4).alias("beta_quantity"),
        F.round(F.col("det2") / F.col("det") / 100.0, 4).alias("beta_discount_pct"),
    )


@query(
    "agg_log2_histogram",
    category="aggregate",
    oracle="""
    WITH b AS (
      SELECT event_type,
             LENGTH(bin(CAST(ROUND(value * 100) AS BIGINT) + 1)) - 1 AS k
      FROM events
    )
    SELECT event_type, k,
           CAST((1::BIGINT << k) AS BIGINT) AS lo_cents,
           CAST((1::BIGINT << (k + 1)) AS BIGINT) AS hi_cents,
           COUNT(*) AS n
    FROM b GROUP BY event_type, k
    ORDER BY event_type, k
    """,
)
def agg_log2_histogram(spark, sf_dir):
    """Exponential (power-of-two) bucket histogram — the
    HdrHistogram/Prometheus-native-histogram shape for latency-like
    skewed distributions, where ch_histogram's equal-width buckets
    waste resolution: bucket k holds values in [2^k, 2^{k+1}) cents.
    The bucket index is computed with ZERO libm — it's the bit length
    of the integer cent value (length of its binary string minus one),
    identical on both engines (Spark F.bin ≡ DuckDB bin), dodging the
    floor(log2(x)) boundary hazard where a power-of-two input could
    land on either side of a last-ulp log. Fixed bucket count
    regardless of data size, plain map-side-combinable counts — the
    same bounded-state story as the count-min/KLL rows, and the
    standard wire format for latency SLO dashboards at any scale."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        (
            F.length(F.bin(F.round(F.col("value") * 100).cast("long") + 1)) - 1
        ).alias("k"),
    )
    return (
        b.groupBy("event_type", "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "k",
            F.expr("shiftleft(CAST(1 AS BIGINT), k)").alias("lo_cents"),
            F.expr("shiftleft(CAST(1 AS BIGINT), k + 1)").alias("hi_cents"),
            "n",
        )
        .orderBy("event_type", "k")
    )


@query(
    "ch_proportions_ztest",
    category="aggregate",
    oracle="""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY event_type
    ),
    w AS (
      SELECT MAX(CASE WHEN event_type = 'click' THEN k END) AS k1,
             MAX(CASE WHEN event_type = 'click' THEN n END) AS n1,
             MAX(CASE WHEN event_type = 'view' THEN k END) AS k2,
             MAX(CASE WHEN event_type = 'view' THEN n END) AS n2
      FROM g
    )
    SELECT k1, n1, k2, n2,
           ROUND((k1 * 1.0 / n1) - (k2 * 1.0 / n2), 4) AS diff,
           ROUND(((k1 * 1.0 / n1) - (k2 * 1.0 / n2))
                 / sqrt(((k1 + k2) * 1.0 / (n1 + n2))
                        * (1.0 - (k1 + k2) * 1.0 / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)), 4) AS z
    FROM w
    """,
)
def ch_proportions_ztest(spark, sf_dir):
    """ClickHouse ``proportionsZTest`` parity — the A/B-test primitive
    for conversion-rate comparison: pooled two-proportion z statistic
    between click and view events' high-value rates (value > 50 as the
    "conversion"). The four sufficient statistics are exact BIGINTs
    from one grouped count (map-side combinable, the welch/student/MWU
    family discipline); the z arithmetic then runs on identical doubles
    derived from identical integers on both engines — bit-equal before
    the 4-dp round. Completes the repo's hypothesis-testing shelf:
    means (welch/student), ranks (MWU), distributions (KS), categories
    (χ²/Cramér/Theil), and now proportions."""
    ev = table(spark, sf_dir, "events")
    g = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("k"),
        )
    )
    w = g.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("k"))).alias("k1"),
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "view", F.col("k"))).alias("k2"),
        F.max(F.when(F.col("event_type") == "view", F.col("n"))).alias("n2"),
    )
    p1 = F.col("k1") * 1.0 / F.col("n1")
    p2 = F.col("k2") * 1.0 / F.col("n2")
    pp = (F.col("k1") + F.col("k2")) * 1.0 / (F.col("n1") + F.col("n2"))
    return w.select(
        "k1",
        "n1",
        "k2",
        "n2",
        F.round(p1 - p2, 4).alias("diff"),
        F.round(
            (p1 - p2)
            / F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))),
            4,
        ).alias("z"),
    )


@query(
    "agg_median_absolute_deviation",
    category="aggregate",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y FROM events
    ),
    med AS (
      SELECT event_type, y AS m FROM (
        SELECT event_type, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY y) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v)
      WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT v.event_type, ABS(v.y - med.m) AS d
      FROM v JOIN med ON med.event_type = v.event_type
    ),
    mad AS (
      SELECT event_type, d AS mad FROM (
        SELECT event_type, d,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev)
      WHERE rn = (n + 1) // 2
    )
    SELECT med.event_type,
           CAST(med.m AS DOUBLE) / 100.0 AS median,
           CAST(mad.mad AS DOUBLE) / 100.0 AS mad
    FROM med JOIN mad ON mad.event_type = med.event_type
    ORDER BY med.event_type
    """,
)
def agg_median_absolute_deviation(spark, sf_dir):
    """Grouped median absolute deviation — the robust dispersion
    estimator (50% breakdown point vs stddev's zero: one glitched
    telemetry spike moves σ arbitrarily, MAD not at all), the GROUPED
    corpus-level sibling of ts_hampel_outliers' rolling MAD. Two exact
    lower-medians by row_number over integer cent values (the
    agg_weighted_median rank discipline — no float percentile
    interpolation to diverge on), the second over absolute deviations
    from the first. Two window passes over the same event_type
    partitioning = one exchange reused; at scale the median-of-medians
    refinement or a KLL sketch (agg_kll_quantiles) replaces the exact
    rank when a full sort per group is too dear — this query IS the
    exactness baseline those approximations are priced against."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("y")
    )
    wt = W.partitionBy("event_type")
    med = (
        v.select(
            "event_type",
            "y",
            F.row_number().over(wt.orderBy("y")).alias("rn"),
            F.count(F.lit(1)).over(wt).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("y").alias("m"))
    )
    dev = v.join(med, "event_type").select(
        "event_type", F.abs(F.col("y") - F.col("m")).alias("d")
    )
    mad = (
        dev.select(
            "event_type",
            "d",
            F.row_number().over(wt.orderBy("d")).alias("rn"),
            F.count(F.lit(1)).over(wt).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("d").alias("mad"))
    )
    return (
        med.join(mad, "event_type")
        .select(
            "event_type",
            (F.col("m").cast("double") / 100.0).alias("median"),
            (F.col("mad").cast("double") / 100.0).alias("mad"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_winsorized_mean",
    category="aggregate",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y FROM events
    ),
    ranked AS (
      SELECT event_type, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY y) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    trimmed AS (
      SELECT event_type, y, n FROM ranked
      WHERE rn > n // 20 AND rn <= n - n // 20
    )
    SELECT event_type, COUNT(*) AS n_kept,
           CAST((2 * SUM(y) * 100 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
             / 10000.0 AS trimmed_mean
    FROM trimmed GROUP BY event_type ORDER BY event_type
    """,
)
def agg_winsorized_mean(spark, sf_dir):
    """Grouped 5%-trimmed mean (the winsorize/trim robust-location
    family): drop each tail's exact bottom/top n//20 ranks, average the
    integer-cent remainder — the estimator dashboards reach for when a
    handful of glitched samples poison the plain mean but the median
    throws away too much. Rank cuts are pure integer arithmetic on
    row_number (no percentile interpolation), the kept-sum is an exact
    BIGINT, and the 4-dp mean emits via integer half-away division
    (positive domain ⇒ div ≡ //). One window pass + one aggregate on
    the same event_type exchange."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("y")
    )
    wt = W.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "y",
        F.row_number().over(wt.orderBy("y")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    trimmed = ranked.where(
        (F.col("rn") > F.expr("n div 20")) & (F.col("rn") <= F.col("n") - F.expr("n div 20"))
    )
    return (
        trimmed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            (
                F.expr("(2 * sum(y) * 100 + count(1)) div (2 * count(1))").cast(
                    "double"
                )
                / 10000.0
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_benford_deviation",
    category="aggregate",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT digit, COUNT(*) AS c FROM d GROUP BY digit),
    n AS (SELECT SUM(c) AS nt FROM obs),
    exp AS (
      SELECT g.digit,
             CAST(ROUND(ln((g.digit + 1.0) / g.digit) / ln(10.0) * 100000000)
                  AS BIGINT) AS p8
      FROM (SELECT UNNEST(generate_series(1, 9)) AS digit) g
    )
    SELECT e.digit,
           COALESCE(o.c, 0) AS observed,
           CAST((e.p8 * n.nt) // 100000000 AS BIGINT) AS expected_floor,
           CAST(COALESCE(o.c, 0) * 1000000 // n.nt AS BIGINT) AS obs_freq_e6,
           e.p8 // 100 AS benford_freq_e6
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN n
    ORDER BY e.digit
    """,
)
def agg_benford_deviation(spark, sf_dir):
    """Benford's-law first-digit audit — the classic fraud /
    synthetic-data / unit-mixup detector for financial columns: real
    multiplicative amounts put ~30.1% of first digits at 1 and ~4.6%
    at 9; fabricated or truncated data doesn't. First digits come from
    integer-cent string slicing (no float log10 on the data path), the
    Benford expectation log10(1+1/d) is quantized per digit to a 1e8
    BIGINT, and both observed and expected frequencies emit as 1e6
    integers — every output column is integer-exact. One 9-row
    expectation grid, one map-side digit count: scan-speed at any
    size. (On the uniform-ish synthetic prices the deviation is large
    and visible — which is itself the point of the audit: this fixture
    would FAIL a Benford screen, as synthetic data should.)"""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("c"))
    n = obs.agg(F.sum("c").alias("nt"))
    exp = spark.range(1, 10).select(
        F.col("id").cast("long").alias("digit"),
        F.round(
            F.log((F.col("id") + 1.0) / F.col("id")) / F.log(F.lit(10.0)) * 100000000
        )
        .cast("long")
        .alias("p8"),
    )
    return (
        exp.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("c"), F.lit(0)).alias("observed"),
            F.expr("(p8 * nt) div 100000000").alias("expected_floor"),
            F.expr("coalesce(c, 0) * 1000000 div nt").alias("obs_freq_e6"),
            F.expr("p8 div 100").alias("benford_freq_e6"),
        )
        .orderBy("digit")
    )


@query(
    "agg_gini_coefficient",
    category="aggregate",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i,
             COUNT(*) OVER () AS n, SUM(x) OVER () AS sx
      FROM spend
    ),
    s AS (
      SELECT MAX(n) AS n, MAX(sx) AS sx, SUM(i * x) AS six FROM ranked
    )
    SELECT n AS n_customers,
           ROUND((2.0 * six) / (n * 1.0 * sx) - (n + 1.0) / n, 4)
             AS gini
    FROM s
    """,
)
def agg_gini_coefficient(spark, sf_dir):
    """Gini coefficient of customer spend concentration — the
    inequality/concentration metric every revenue dashboard wants
    ("do 20% of customers drive 80% of revenue"): G = 2·Σ(i·xᵢ)/(n·Σx)
    − (n+1)/n over ascending-rank spend. The numerator Σ(i·xᵢ) and
    total Σx are EXACT BIGINTs (integer cents × integer ranks; the
    unique (x, custkey) sort key pins ranks identically on both
    engines), so the only float arithmetic is the final three-term
    expression on identical integers — bit-equal before the 4-dp
    round. One global rank window (at 100 TB: the classic two-pass
    rank — per-partition ranks + broadcast partition offsets — swaps
    in without changing the formula)."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    ranked = spend.select(
        "x",
        F.row_number().over(W.orderBy("x", "o_custkey")).alias("i"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(
            (2.0 * F.col("six")) / (F.col("n") * 1.0 * F.col("sx"))
            - (F.col("n") + 1.0) / F.col("n"),
            4,
        ).alias("gini"),
    )


@query(
    "agg_lorenz_deciles",
    category="aggregate",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, NTILE(10) OVER (ORDER BY x, o_custkey) AS decile
      FROM spend
    ),
    d AS (
      SELECT decile, SUM(x) AS dx, COUNT(*) AS nc FROM ranked GROUP BY decile
    ),
    c AS (
      SELECT decile, nc, dx,
             SUM(dx) OVER (ORDER BY decile) AS cum,
             SUM(dx) OVER () AS tot
      FROM d
    )
    SELECT decile, nc AS n_customers,
           CAST(dx * 1000000 // tot AS BIGINT) AS share_e6,
           CAST(cum * 1000000 // tot AS BIGINT) AS cum_share_e6
    FROM c ORDER BY decile
    """,
)
def agg_lorenz_deciles(spark, sf_dir):
    """Lorenz curve by spend decile — the visual companion to
    agg_gini_coefficient ("the bottom half of customers hold X% of
    revenue"): customers ntile'd into 10 ascending-spend buckets (the
    unique (x, custkey) order pins bucket membership on both engines),
    per-decile and cumulative revenue shares as 1e6 integers from
    exact cent sums carried in DECIMAL(38,0): at sf1.0 the cumulative
    cents reach ~2e13, so cum·1e6 overflows BIGINT (caught by the
    sf1.0 sweep as an ANSI ARITHMETIC_OVERFLOW) — DuckDB's SUM(BIGINT)
    widens to HUGEINT implicitly, Spark needs the explicit decimal
    (the agg_hhi_concentration discipline). One rank window + one tiny
    10-row cumulative window."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    ranked = spend.select(
        "x", F.ntile(10).over(W.orderBy("x", "o_custkey")).alias("decile")
    )
    d = ranked.groupBy("decile").agg(
        F.sum(F.col("x").cast("decimal(38,0)")).alias("dx"),
        F.count(F.lit(1)).alias("nc"),
    )
    c = d.select(
        "decile",
        "nc",
        "dx",
        F.sum("dx").over(W.orderBy("decile")).alias("cum"),
        F.sum("dx").over(W.partitionBy()).alias("tot"),
    )
    return c.select(
        "decile",
        F.col("nc").alias("n_customers"),
        F.expr("CAST(dx * 1000000 DIV tot AS BIGINT)").alias("share_e6"),
        F.expr("CAST(cum * 1000000 DIV tot AS BIGINT)").alias("cum_share_e6"),
    ).orderBy("decile")


@query(
    "agg_hhi_concentration",
    category="aggregate",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment, o.o_custkey,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    ),
    seg AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             COUNT(*) AS n_customers
      FROM spend GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_customers,
           CAST((sxx * 1000000 - (sxx * 1000000) % (sx * sx)) / (sx * sx)
                AS BIGINT) AS hhi_e6
    FROM seg ORDER BY c_mktsegment
    """,
)
def agg_hhi_concentration(spark, sf_dir):
    """Herfindahl–Hirschman concentration index per market segment —
    Σ shareᵢ² — the antitrust/portfolio-concentration cousin of
    agg_gini_coefficient (Gini measures inequality of the whole
    distribution; HHI is dominated by the largest players, which is
    what "is this segment monopolized by two customers" asks). The
    identity Σ(xᵢ/Σx)² = Σxᵢ²/(Σx)² keeps everything in exact
    DECIMAL(38,0) integer arithmetic (Σxᵢ² at sf0.1 cents overflows
    BIGINT — the agg_regr_ols decimal-moments discipline) with the final
    floor division done via the exact identity (a − a%b)/b on decimals
    (plain decimal division ROUNDS at engine-specific scales — measured
    an off-by-one between engines); no per-row share floats ever exist.
    Two map-side-combinable aggregates, broadcast dim join."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x"))
    )
    seg = spend.groupBy("c_mktsegment").agg(
        F.sum((F.col("x") * F.col("x")).cast(T.DecimalType(38, 0))).alias("sxx"),
        F.sum(F.col("x").cast(T.DecimalType(38, 0))).alias("sx"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    return seg.select(
        "c_mktsegment",
        "n_customers",
        F.expr(
            "CAST((sxx * 1000000 - (sxx * 1000000) % (sx * sx))"
            " / (sx * sx) AS BIGINT)"
        ).alias("hhi_e6"),
    ).orderBy("c_mktsegment")


@query(
    "agg_pareto_point",
    category="aggregate",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x,
             ROW_NUMBER() OVER (ORDER BY x DESC, o_custkey) AS i,
             SUM(x) OVER (ORDER BY x DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(x) OVER () AS tot,
             COUNT(*) OVER () AS n
      FROM spend
    )
    SELECT MIN(i) AS top_customers,
           MAX(n) AS n_customers,
           MIN(i) * 1000000 // MAX(n) AS top_frac_e6
    FROM ranked WHERE cum * 5 >= tot * 4
    """,
)
def agg_pareto_point(spark, sf_dir):
    """The Pareto point, answered directly: the SMALLEST count of
    top-spending customers whose cumulative revenue reaches 80% of the
    total ("do 20% of customers drive 80% of revenue" as a number, not
    a curve — the executive summary of agg_lorenz_deciles). One
    descending-rank window with a running cumulative sum (exact BIGINT
    cents, unique (x, custkey) order), the 80% cut as integer
    cross-multiplication 5·cum ≥ 4·tot, and MIN(i) over qualifying
    ranks — all integer-exact. On the uniform-ish synthetic spend the
    answer lands near 70% (no Pareto concentration), which is the
    diagnostic working: real purchase data shows 20-30%."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    wd = W.orderBy(F.col("x").desc(), F.col("o_custkey"))
    ranked = spend.select(
        "x",
        F.row_number().over(wd).alias("i"),
        F.sum("x").over(wd.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum"),
        F.sum("x").over(W.partitionBy()).alias("tot"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    return ranked.where(F.col("cum") * 5 >= F.col("tot") * 4).agg(
        F.min("i").alias("top_customers"),
        F.max("n").alias("n_customers"),
        # row_number() is INT in Spark: widen BEFORE the *1e6 or the
        # product overflows int32 once the rank passes ~2147 (bites at
        # sf0.1; ANSI mode makes it a hard error instead of a wrap)
        F.expr("CAST(min(i) AS BIGINT) * 1000000 div max(n)").alias("top_frac_e6"),
    )


@query(
    "ch_weighted_quantiles",
    category="aggregate",
    oracle="""
    WITH c AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY n_chars, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS tot
      FROM documents
    ),
    qs AS (
      SELECT c.source, q.q_pct, c.doc_id, c.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.source, q.q_pct
                                ORDER BY c.n_chars, c.doc_id) AS rk
      FROM c CROSS JOIN (SELECT UNNEST(CAST([25, 50, 75, 90] AS BIGINT[])) AS q_pct) q
      WHERE 100 * c.cum >= q.q_pct * c.tot
    )
    SELECT source, q_pct, n_chars AS q_len, doc_id AS q_doc
    FROM qs WHERE rk = 1
    ORDER BY source, q_pct
    """,
)
def ch_weighted_quantiles(spark, sf_dir):
    """ClickHouse plural ``quantilesExactWeighted(0.25, 0.5, 0.75, 0.9)``
    — the full weighted-quantile set from ONE cumulative-sum pass
    (agg_weighted_median generalized): the doc holding each source's
    25th/50th/75th/90th cumulative-BYTE percentile, with the quantile
    cut as pure integer cross-multiplication 100·cum ≥ q·tot. The
    4-quantile grid fans out over the already-computed cumsum rows
    (broadcast 4-row cross join + one rank window per (source, q)) —
    the plural-combinator point: N quantiles never re-sort the data."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    wcum = (
        W.partitionBy("source")
        .orderBy("n_chars", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("source")
    c = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars").over(wcum).alias("cum"),
        F.sum("n_chars").over(wall).alias("tot"),
    )
    qgrid = spark.range(0).sparkSession.createDataFrame(
        [(25,), (50,), (75,), (90,)], ["q_pct"]
    )
    qs = (
        c.crossJoin(F.broadcast(qgrid))
        .where(100 * F.col("cum") >= F.col("q_pct") * F.col("tot"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source", "q_pct").orderBy("n_chars", "doc_id")
            ),
        )
        .where(F.col("rk") == 1)
    )
    return qs.select(
        "source",
        "q_pct",
        F.col("n_chars").alias("q_len"),
        F.col("doc_id").alias("q_doc"),
    ).orderBy("source", "q_pct")


@query(
    "agg_cuped_adjustment",
    category="aggregate",
    oracle="""
    WITH mid AS (
      SELECT epoch_us(MIN(ts))
             + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS m
      FROM events
    ),
    per_user AS (
      SELECT e.user_id,
             SUM(CASE WHEN epoch_us(e.ts) < mid.m
                      THEN CAST(ROUND(e.value * 100) AS BIGINT) ELSE 0 END) AS pre_c,
             SUM(CASE WHEN epoch_us(e.ts) >= mid.m
                      THEN CAST(ROUND(e.value * 100) AS BIGINT) ELSE 0 END) AS post_c
      FROM events e CROSS JOIN mid GROUP BY e.user_id
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(pre_c AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(post_c AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(pre_c * post_c AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(pre_c * pre_c AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(post_c * post_c AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM per_user
    )
    SELECT n AS n_users,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
           ROUND(1.0 - (n * sxy - sx * sy) * (n * sxy - sx * sy)
                       / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS var_ratio_after_cuped
    FROM m
    """,
)
def agg_cuped_adjustment(spark, sf_dir):
    """CUPED (Deng et al. 2013, "Improving the Sensitivity of Online
    Controlled Experiments") — the variance-reduction standard of every
    experimentation platform: regress each user's experiment-period
    metric on their PRE-period covariate (first vs second half of the
    event stream, split at the exact corpus time midpoint), and the
    adjusted-metric variance shrinks by the squared correlation —
    var_ratio = 1 − ρ², reported alongside θ = cov/var, directly
    telling an A/B platform how much smaller its confidence intervals
    get for free. All five moments accumulate exactly in
    DECIMAL(38,0) from integer cents (the agg_regr_ols discipline), so
    θ and the ratio are bit-equal doubles before the 6-dp round. Two
    aggregates total; the per-user pre/post split is one conditional
    sum against a broadcast midpoint row."""
    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.expr("CAST((unix_micros(max(ts)) - unix_micros(min(ts))) div 2 AS BIGINT)")
        ).alias("m")
    )
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.unix_micros("ts") < F.col("m"),
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("pre_c"),
            F.sum(
                F.when(
                    F.unix_micros("ts") >= F.col("m"),
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("post_c"),
        )
    )
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    x, y = F.col("pre_c"), F.col("post_c")
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        dec(x).alias("sx"),
        dec(y).alias("sy"),
        dec(x * y).alias("sxy"),
        dec(x * x).alias("sxx"),
        dec(y * y).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").alias("n_users"),
        F.round(cov / vx, 6).alias("theta"),
        F.round(1.0 - cov * cov / (vx * vy), 6).alias("var_ratio_after_cuped"),
    )


@query(
    "agg_diff_in_diff",
    category="aggregate",
    oracle="""
    WITH mid AS (
      SELECT epoch_us(MIN(ts))
             + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS m
      FROM events
    ),
    cells AS (
      SELECT CASE WHEN e.user_id % 3 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN epoch_us(e.ts) < mid.m THEN 0 ELSE 1 END AS post,
             CAST(ROUND(e.value * 100) AS BIGINT) AS v
      FROM events e CROSS JOIN mid
    ),
    m AS (
      SELECT treated, post, COUNT(*) AS n, SUM(v) AS s
      FROM cells GROUP BY treated, post
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN treated=1 AND post=1 THEN s END) * 1.0
          / MAX(CASE WHEN treated=1 AND post=1 THEN n END) AS t_post,
        MAX(CASE WHEN treated=1 AND post=0 THEN s END) * 1.0
          / MAX(CASE WHEN treated=1 AND post=0 THEN n END) AS t_pre,
        MAX(CASE WHEN treated=0 AND post=1 THEN s END) * 1.0
          / MAX(CASE WHEN treated=0 AND post=1 THEN n END) AS c_post,
        MAX(CASE WHEN treated=0 AND post=0 THEN s END) * 1.0
          / MAX(CASE WHEN treated=0 AND post=0 THEN n END) AS c_pre
      FROM m
    )
    SELECT ROUND(t_pre / 100.0, 4) AS treated_pre,
           ROUND(t_post / 100.0, 4) AS treated_post,
           ROUND(c_pre / 100.0, 4) AS control_pre,
           ROUND(c_post / 100.0, 4) AS control_post,
           ROUND(((t_post - t_pre) - (c_post - c_pre)) / 100.0, 4)
             AS did_estimate
    FROM wide
    """,
)
def agg_diff_in_diff(spark, sf_dir):
    """Difference-in-differences — the workhorse quasi-experimental
    estimator when randomization isn't available (feature rollouts,
    policy changes): (treated post − treated pre) − (control post −
    control pre) cancels both group-level baselines and common time
    trends. Treatment is assigned by id hash (user_id % 3 == 0 — the
    deterministic bucketing a staged rollout actually ships), pre/post
    split at the exact corpus time midpoint; the four cell means come from ONE
    grouped pass over exact integer cents (the estimator is four
    BIGINT sums and counts — the entire causal machinery is a 4-row
    table), ratios on identical integers, 4-dp rounds at output.
    Completes the experimentation shelf: proportions z-test (decision),
    CUPED (sensitivity), DiD (no-randomization fallback)."""
    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.expr("CAST((unix_micros(max(ts)) - unix_micros(min(ts))) div 2 AS BIGINT)")
        ).alias("m")
    )
    cells = (
        ev.crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("user_id") % 3 == 0, 1).otherwise(0).alias("treated"),
            F.when(F.unix_micros("ts") < F.col("m"), 0).otherwise(1).alias("post"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
    )
    m = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    cell = lambda t, p: F.max(
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col("s"))
    ) * 1.0 / F.max(
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col("n"))
    )
    wide = m.agg(
        cell(1, 1).alias("t_post"),
        cell(1, 0).alias("t_pre"),
        cell(0, 1).alias("c_post"),
        cell(0, 0).alias("c_pre"),
    )
    return wide.select(
        F.round(F.col("t_pre") / 100.0, 4).alias("treated_pre"),
        F.round(F.col("t_post") / 100.0, 4).alias("treated_post"),
        F.round(F.col("c_pre") / 100.0, 4).alias("control_pre"),
        F.round(F.col("c_post") / 100.0, 4).alias("control_post"),
        F.round(
            ((F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre")))
            / 100.0,
            4,
        ).alias("did_estimate"),
    )


@query(
    "agg_power_sample_size",
    category="aggregate",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events WHERE event_type IN ('click', 'view')
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS ss
      FROM v GROUP BY event_type
    ),
    calc AS (
      SELECT event_type, n,
             (ss - s * s / n) / (n - 1) AS var_c,
             s / n AS mean_c
      FROM m
    )
    SELECT event_type, n AS n_observed,
           ROUND(mean_c / 100.0, 4) AS mean_value,
           CAST(CEIL(2.0 * var_c * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                / ((0.02 * mean_c) * (0.02 * mean_c))) AS BIGINT)
             AS n_per_arm_mde2pct
    FROM calc ORDER BY event_type
    """,
)
def agg_power_sample_size(spark, sf_dir):
    """A/B-test POWER ANALYSIS — the sample-size planner every
    experimentation platform runs BEFORE the test (the shelf's missing
    first step: plan → decide → sharpen → fallback): n per arm =
    2σ²(z_{α/2}+z_β)²/Δ² for 80% power at α=0.05 against a 2%-of-mean
    minimum detectable effect, from each metric's observed variance.
    The z constants are literals (1.959964, 0.841621 — quantized at 6
    dp so both engines multiply identical doubles), σ² and the mean
    come from exact DECIMAL moments, and CEIL lands on the same
    integer. One grouped aggregate — the variance estimate is the only
    thing that touches data."""
    ev = table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type").isin("click", "view")).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("y")
    )
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    m = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("y")).alias("s"),
        dec(F.col("y") * F.col("y")).alias("ss"),
    )
    var_c = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    mean_c = F.col("s") / F.col("n")
    z = (1.959964 + 0.841621) ** 2
    return m.select(
        "event_type",
        F.col("n").alias("n_observed"),
        F.round(mean_c / 100.0, 4).alias("mean_value"),
        F.ceil(
            2.0 * var_c * F.lit(z) / ((0.02 * mean_c) * (0.02 * mean_c))
        ).alias("n_per_arm_mde2pct"),
    ).orderBy("event_type")


@query(
    "agg_sprt_sequential_test",
    category="aggregate",
    oracle="""
    WITH obs AS (
      SELECT ts, event_id,
             CASE WHEN value > 50 THEN 1 ELSE 0 END AS conv
      FROM events WHERE event_type = 'click'
    ),
    walk AS (
      SELECT ts, event_id, conv,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS i,
             SUM(CASE WHEN conv = 1
                      THEN CAST(ROUND(ln(0.55 / 0.45) * 100000000) AS BIGINT)
                      ELSE CAST(ROUND(ln(0.45 / 0.55) * 100000000) AS BIGINT)
                 END) OVER (ORDER BY ts, event_id) AS llr8
      FROM obs
    ),
    bounds AS (
      SELECT CAST(ROUND(ln(0.95 / 0.05) * 100000000) AS BIGINT) AS up8,
             CAST(ROUND(ln(0.05 / 0.95) * 100000000) AS BIGINT) AS lo8
    ),
    crossings AS (
      SELECT w.i, w.llr8,
             CASE WHEN w.llr8 >= b.up8 THEN 'accept_h1'
                  WHEN w.llr8 <= b.lo8 THEN 'accept_h0'
                  ELSE NULL END AS verdict
      FROM walk w CROSS JOIN bounds b
    )
    SELECT MIN(i) AS decision_at_n,
           (SELECT verdict FROM crossings c2
            WHERE c2.verdict IS NOT NULL ORDER BY c2.i LIMIT 1) AS verdict,
           (SELECT COUNT(*) FROM walk) AS n_total
    FROM crossings WHERE verdict IS NOT NULL
    """,
)
def agg_sprt_sequential_test(spark, sf_dir):
    """Wald's Sequential Probability Ratio Test — the always-monitoring
    answer to "how big should the test be": instead of fixing n up
    front (agg_power_sample_size) you watch the cumulative
    log-likelihood ratio after EVERY observation and stop the moment it
    crosses ln((1−β)/α) or ln(β/(1−α)) — provably the minimum expected
    sample size for given error rates. Testing click conversion
    (value > 50) p₀=0.45 vs p₁=0.55 at α=β=0.05: each observation adds
    one of exactly TWO 1e8-quantized constants (libm touches four
    numbers total — two increments, two boundaries), so the walk is an
    integer cumulative window in (ts, event_id) order and the first
    crossing is integer-exact. Reports the decision index, verdict,
    and total stream length (how much the sequential design saved)."""
    from pyspark.sql import Window as W
    import math as _m

    up8 = round(_m.log(0.95 / 0.05) * 100000000)
    lo8 = round(_m.log(0.05 / 0.95) * 100000000)
    inc1 = round(_m.log(0.55 / 0.45) * 100000000)
    inc0 = round(_m.log(0.45 / 0.55) * 100000000)
    ev = table(spark, sf_dir, "events")
    obs = ev.where(F.col("event_type") == "click").select(
        "ts",
        "event_id",
        F.when(F.col("value") > 50, 1).otherwise(0).alias("conv"),
    )
    wo = W.orderBy("ts", "event_id")
    walk = obs.select(
        F.row_number().over(wo).alias("i"),
        F.sum(
            F.when(F.col("conv") == 1, F.lit(inc1)).otherwise(F.lit(inc0))
        )
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("llr8"),
    )
    crossings = walk.select(
        "i",
        F.when(F.col("llr8") >= up8, "accept_h1")
        .when(F.col("llr8") <= lo8, "accept_h0")
        .alias("verdict"),
    ).where(F.col("verdict").isNotNull())
    first = (
        crossings.orderBy("i")
        .limit(1)
        .select(F.col("i").alias("decision_at_n"), "verdict")
    )
    n_total = walk.agg(F.count(F.lit(1)).alias("n_total"))
    return first.crossJoin(F.broadcast(n_total))


@query(
    "agg_srm_check",
    category="aggregate",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id,
             CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS treated
      FROM events
    ),
    m AS (
      SELECT COUNT(*) AS n, CAST(SUM(treated) AS BIGINT) AS nt FROM u
    )
    SELECT n AS n_users, nt AS n_treated, n - nt AS n_control,
           ROUND(
             (nt - n / 3.0) * (nt - n / 3.0) / (n / 3.0)
             + ((n - nt) - 2.0 * n / 3.0) * ((n - nt) - 2.0 * n / 3.0)
               / (2.0 * n / 3.0), 4) AS chi2,
           CASE WHEN
             (nt - n / 3.0) * (nt - n / 3.0) / (n / 3.0)
             + ((n - nt) - 2.0 * n / 3.0) * ((n - nt) - 2.0 * n / 3.0)
               / (2.0 * n / 3.0) > 3.841 THEN 1 ELSE 0 END AS srm_alarm
    FROM m
    """,
)
def agg_srm_check(spark, sf_dir):
    """Sample Ratio Mismatch check — the experiment-HEALTH gate every
    platform runs before reading any metric (a treatment share that
    drifts from its intended allocation means broken assignment or
    differential dropout, and every downstream readout is garbage):
    χ² goodness-of-fit of the observed user split against the intended
    1/3 : 2/3 allocation of agg_diff_in_diff's id-hash rollout, alarm
    at the 95% critical value 3.841. The counts are exact integers
    from one distinct-user aggregate; the χ² runs on identical doubles
    from identical integers — bit-equal before the 4-dp round, and the
    alarm threshold compares BEFORE rounding so the verdict is the
    statistic's, not the display's. Completes the experimentation
    shelf's guardrail tier."""
    ev = table(spark, sf_dir, "events")
    u = ev.select(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, 1).otherwise(0).alias("treated"),
    ).distinct()
    m = u.agg(F.count(F.lit(1)).alias("n"), F.sum("treated").alias("nt"))
    chi2 = (
        (F.col("nt") - F.col("n") / 3.0) * (F.col("nt") - F.col("n") / 3.0)
        / (F.col("n") / 3.0)
        + ((F.col("n") - F.col("nt")) - 2.0 * F.col("n") / 3.0)
        * ((F.col("n") - F.col("nt")) - 2.0 * F.col("n") / 3.0)
        / (2.0 * F.col("n") / 3.0)
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.col("nt").alias("n_treated"),
        (F.col("n") - F.col("nt")).alias("n_control"),
        F.round(chi2, 4).alias("chi2"),
        F.when(chi2 > 3.841, 1).otherwise(0).alias("srm_alarm"),
    )


@query(
    "agg_anova_oneway",
    category="aggregate",
    oracle="""
    WITH scaled AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS y FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n_g, SUM(y) AS s_g, SUM(y * y) AS ss_g
      FROM scaled GROUP BY event_type
    ),
    tot AS (
      SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
             SUM(s_g) AS s, SUM(ss_g) AS ss,
             -- sequential fold in event_type order: the k per-group
             -- double terms add in one fixed order on both engines
             list_reduce(
               list_prepend(0.0,
                 list(CAST(s_g AS DOUBLE) * s_g / n_g ORDER BY event_type)),
               (a, b) -> a + b) AS p
      FROM m
    )
    SELECT k, n,
           ROUND((p - CAST(s AS DOUBLE) * s / n) / 10000.0, 4) AS ss_between,
           ROUND((CAST(ss AS DOUBLE) - p) / 10000.0, 4) AS ss_within,
           ROUND(((p - CAST(s AS DOUBLE) * s / n) / (k - 1))
                 / ((CAST(ss AS DOUBLE) - p) / (n - k)), 4) AS f_stat,
           ROUND((p - CAST(s AS DOUBLE) * s / n)
                 / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 4) AS eta_sq
    FROM tot
    """,
)
def agg_anova_oneway(spark, sf_dir):
    """One-way ANOVA across ALL event types on `value` — the k-group
    generalization of agg_welch_ttest ("does the metric differ across
    variants?" for k variants at once; ClickHouse ships it as
    analysisOfVariance/anova). Same exactness discipline as the t-test:
    the 2-dp fixture metric scales to exact BIGINT cents, so every
    moment (n_g, Σy, Σy²) is exact integer arithmetic; the only
    accumulation across groups of non-integer terms — P = Σ s_g²/n_g —
    is folded SEQUENTIALLY in event_type order (sort_array ∘
    collect_list, DuckDB list_reduce over an ORDER BY list) so the k
    doubles add in one fixed order on both engines. Then
    SSB = P − s²/n, SSW = Σss − P, F = (SSB/(k−1))/(SSW/(n−k)) — a
    fixed dataflow over identical numbers. SS outputs are reported in
    value² units (/1e4 de-scales cents²). One partial+final aggregation
    plus a k-row fold: map-side-combinable at any scale."""
    ev = table(spark, sf_dir, "events")
    scaled = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("y")
    )
    m = scaled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("y").alias("s_g"),
        F.sum(F.col("y") * F.col("y")).alias("ss_g"),
    )
    tb = (F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")).alias("tb")
    tot = m.select("event_type", "n_g", "s_g", "ss_g", tb).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ss"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "tb"))),
            F.lit(0.0),
            lambda acc, x: acc + x["tb"],
        ).alias("p"),
    )
    s, n, ss, p, k = (F.col(c) for c in ("s", "n", "ss", "p", "k"))
    ssb = p - s.cast("double") * s / n
    ssw = ss.cast("double") - p
    return tot.select(
        "k",
        "n",
        F.round(ssb / 10000.0, 4).alias("ss_between"),
        F.round(ssw / 10000.0, 4).alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 4).alias("f_stat"),
        F.round(ssb / (ss.cast("double") - s.cast("double") * s / n), 4).alias(
            "eta_sq"
        ),
    )


@query(
    "ch_cramers_v_bias_corrected",
    category="aggregate",
    oracle="""
    WITH obs AS (
      SELECT event_type AS a, CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS b,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT a, b, o,
             SUM(o) OVER (PARTITION BY a) AS ra,
             SUM(o) OVER (PARTITION BY b) AS cb,
             SUM(o) OVER () AS n
      FROM obs
    ),
    chi AS (
      SELECT list_reduce(
               list_prepend(0.0,
                 list(pow(o - ra * cb * 1.0 / n, 2) / (ra * cb * 1.0 / n)
                      ORDER BY a, b)),
               (x, y) -> x + y) AS chi2,
             MAX(n) AS n,
             COUNT(DISTINCT a) AS ka, COUNT(DISTINCT b) AS kb
      FROM margins
    )
    SELECT ROUND(sqrt(
             GREATEST(chi2 / n - (ka - 1.0) * (kb - 1.0) / (n - 1), 0.0)
             / LEAST(ka - pow(ka - 1.0, 2) / (n - 1) - 1,
                     kb - pow(kb - 1.0, 2) / (n - 1) - 1)
           ), 4) AS cramers_v_bc
    FROM chi
    """,
)
def ch_cramers_v_bias_corrected(spark, sf_dir):
    """ClickHouse ``cramersVBiasCorrected``: the Bergsma (2013) small-
    sample correction of Cramér's V — φ²_corr = max(0, φ² −
    (ka−1)(kb−1)/(n−1)), with the category counts shrunk the same way —
    the version to trust when cells are thin (raw V is biased upward;
    on this fixture the correction moves the 4th decimal, which is
    exactly what the row verifies against the uncorrected
    agg_cramers_v). Same exact-integer contingency discipline; the
    ≤35-cell χ² fold runs in (a, b) order on both engines."""
    ev = table(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("long")
    obs = ev.groupBy(
        F.col("event_type").alias("a"), iso_dow.alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = obs.select(
        "a",
        "b",
        "o",
        F.sum("o").over(W.partitionBy("a")).alias("ra"),
        F.sum("o").over(W.partitionBy("b")).alias("cb"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("ra") * F.col("cb") * 1.0 / F.col("n")
    chi = m.select(
        "a", "b", (F.pow(F.col("o") - e, 2) / e).alias("term"), "n"
    ).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("a", "b", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("chi2"),
        F.max("n").alias("n"),
        F.count_distinct("a").alias("ka"),
        F.count_distinct("b").alias("kb"),
    )
    n, ka, kb, chi2 = (F.col(c) for c in ("n", "ka", "kb", "chi2"))
    phi2c = F.greatest(
        chi2 / n - (ka - 1.0) * (kb - 1.0) / (n - 1), F.lit(0.0)
    )
    kac = ka - F.pow(ka - 1.0, 2) / (n - 1)
    kbc = kb - F.pow(kb - 1.0, 2) / (n - 1)
    return chi.select(
        F.round(F.sqrt(phi2c / F.least(kac - 1, kbc - 1)), 4).alias(
            "cramers_v_bc"
        )
    )


@query(
    "agg_tukey_fences",
    category="aggregate",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    ),
    f AS (
      SELECT event_type, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
      FROM q
    )
    SELECT e.event_type,
           ROUND(f.lo, 4) AS fence_lo, ROUND(f.hi, 4) AS fence_hi,
           CAST(COUNT(*) FILTER (WHERE e.value < f.lo) AS BIGINT) AS n_below,
           CAST(COUNT(*) FILTER (WHERE e.value > f.hi) AS BIGINT) AS n_above,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM events e JOIN f ON e.event_type = f.event_type
    GROUP BY e.event_type, f.lo, f.hi
    """,
)
def agg_tukey_fences(spark, sf_dir):
    """Tukey's fences — the boxplot outlier rule (values beyond
    Q1 − 1.5·IQR / Q3 + 1.5·IQR) per event type, the distribution-free
    anomaly screen next to the parametric ts_anomaly_zscore. Two passes
    by necessity (exact quantiles need the data before the fences can
    cut it): pass 1 computes per-group Q1/Q3 (Spark percentile() ==
    DuckDB quantile_cont, the agg_percentiles-proven pairing), pass 2
    re-scans with the ≤5-row fence table BROADCAST — so the second scan
    is filter+count, no shuffle of the fact stream. Fence comparisons
    use the identical interpolated doubles on both engines; only the
    reported fence values round."""
    ev = table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    f = q.select(
        "event_type",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        ev.join(F.broadcast(f), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.when(F.col("value") < F.col("lo"), 1)).alias("n_below"),
            F.count(F.when(F.col("value") > F.col("hi"), 1)).alias("n_above"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "event_type",
            F.round("lo", 4).alias("fence_lo"),
            F.round("hi", 4).alias("fence_hi"),
            "n_below",
            "n_above",
            "n_total",
        )
    )


@query(
    "agg_ttest_paired",
    category="aggregate",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    ),
    pair AS (
      SELECT user_id,
             MAX(CASE WHEN rn_d = 1 THEN vc END)
             - MIN(CASE WHEN rn_a = 1 THEN vc END) AS d
      FROM s GROUP BY user_id
      HAVING COUNT(*) >= 2
    ),
    m AS (SELECT COUNT(*) AS n, SUM(d) AS s1, SUM(d * d) AS s2 FROM pair)
    SELECT n,
           ROUND(CAST(s1 AS DOUBLE) / n / 100.0, 4) + 0.0 AS mean_diff,
           ROUND(CAST(s1 AS DOUBLE) / n
                 / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                        / (n - 1) / n),
                 4) + 0.0 AS t_stat
    FROM m
    """,
)
def agg_ttest_paired(spark, sf_dir):
    """Paired (dependent-samples) t statistic — the third leg of the
    t-test shelf next to agg_welch_ttest (unpaired, unequal variance)
    and agg_mann_whitney_u (rank-based): each USER is a pair, the
    difference is last-minus-first observed value (exact cents via the
    same deterministic (ts, event_id) first/last pick as
    ch_bounding_ratio), and t = d̄ / (s_d/√n). The per-user differences
    are exact BIGINTs, so all moments (n, Σd, Σd²) are exact integers
    and the t statistic is one fixed IEEE dataflow on both engines —
    bit-identical before the 4-dp round, with +0.0 normalizing a
    potential -0.0 mean. Shapes: one per-user min_by/max_by hash
    aggregation, one single-row moment fold — two
    map-side-combinable aggregations, no window on the Spark side,
    scales to any corpus."""
    ev = table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    vc = F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vc")
    pair = (
        ev.select("user_id", "ts", "event_id", vc)
        .groupBy("user_id")
        .agg(
            (F.max_by("vc", key) - F.min_by("vc", key)).alias("d"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where(F.col("cnt") >= 2)
    )
    m = pair.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d") * F.col("d")).alias("s2"),
    )
    return m.select(
        "n",
        F.expr("ROUND(CAST(s1 AS DOUBLE) / n / 100.0, 4) + 0.0D").alias(
            "mean_diff"
        ),
        F.expr(
            "ROUND(CAST(s1 AS DOUBLE) / n"
            " / SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)"
            "        / (n - 1) / n), 4) + 0.0D"
        ).alias("t_stat"),
    )


@query(
    "agg_kendall_tau",
    category="aggregate",
    oracle="""
    WITH u AS (
      SELECT user_id, COUNT(*) AS x,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tiex,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tiey
      FROM u a JOIN u b ON a.user_id < b.user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(conc) AS BIGINT) AS c, CAST(SUM(disc) AS BIGINT) AS d,
             CAST(SUM(tiex) AS BIGINT) AS tx, CAST(SUM(tiey) AS BIGINT) AS ty
      FROM p
    )
    SELECT n0, c, d, tx AS ties_x, ty AS ties_y,
           ROUND((c - d) / sqrt(CAST((n0 - tx) AS DOUBLE) * (n0 - ty)), 4) + 0.0
             AS tau_b
    FROM m
    """,
)
def agg_kendall_tau(spark, sf_dir):
    """Kendall's tau-b between per-user activity volume (event count)
    and per-user total value — the rank-concordance coefficient that,
    next to ch_rank_corr's Spearman, completes the robust-correlation
    shelf (tau-b handles ties explicitly via its denominator). Stage 1
    collapses the corpus to a USERS-sized summary (one exact integer
    aggregation — value quantized to cents); stage 2 is the tie-aware
    concordant/discordant pair count over that bounded summary, an
    explicit self-join on user_id inequality whose cost is U²/2 pairs —
    the documented contract for exact tau (the vec_neardup_cosine
    audit-tier convention: at 100 TB you either sample users first or
    fall back to Spearman, which needs only ranks; the corpus itself is
    never pair-joined). Everything through C, D, and the tie counts is
    exact BIGINT; tau_b = (C−D)/√((n0−tx)(n0−ty)) runs the identical
    IEEE expression on both engines, rounded once at 4 dp with −0.0
    normalized."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("y"),
    )
    a = u.select(F.col("user_id").alias("ia"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = u.select(F.col("user_id").alias("ib"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    prod = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    p = a.join(b, F.col("ia") < F.col("ib")).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias("tiex"),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias("tiey"),
    )
    m = p.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("conc").alias("c"),
        F.sum("disc").alias("d"),
        F.sum("tiex").alias("tx"),
        F.sum("tiey").alias("ty"),
    )
    return m.select(
        "n0", "c", "d",
        F.col("tx").alias("ties_x"), F.col("ty").alias("ties_y"),
        F.expr(
            "ROUND((c - d) / SQRT(CAST((n0 - tx) AS DOUBLE) * (n0 - ty)), 4)"
            " + 0.0D"
        ).alias("tau_b"),
    )


@query(
    "agg_cohens_d",
    category="aggregate",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)
                      * CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY event_type
    ),
    m AS (
      SELECT
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'purchase' THEN s1 END) AS a1,
        MAX(CASE WHEN event_type = 'purchase' THEN s2 END) AS q1,
        MAX(CASE WHEN event_type = 'view' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'view' THEN s1 END) AS a2,
        MAX(CASE WHEN event_type = 'view' THEN s2 END) AS q2
      FROM g
    )
    SELECT n1, n2,
           ROUND((CAST(a1 AS DOUBLE) / n1 - CAST(a2 AS DOUBLE) / n2)
                 / sqrt(((CAST(q1 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1)
                         + (CAST(q2 AS DOUBLE) - CAST(a2 AS DOUBLE) * a2 / n2))
                        / (n1 + n2 - 2)), 4) + 0.0 AS cohens_d,
           ROUND(((CAST(a1 AS DOUBLE) / n1 - CAST(a2 AS DOUBLE) / n2)
                 / sqrt(((CAST(q1 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1)
                         + (CAST(q2 AS DOUBLE) - CAST(a2 AS DOUBLE) * a2 / n2))
                        / (n1 + n2 - 2)))
                 * (1 - 3.0 / (4 * (n1 + n2) - 9)), 4) + 0.0 AS hedges_g
    FROM m
    """,
)
def agg_cohens_d(spark, sf_dir):
    """Cohen's d (pooled-SD standardized mean difference) between the
    purchase and view value distributions, plus the small-sample
    Hedges' g correction (1 − 3/(4(n1+n2)−9)) — the effect-size number
    that belongs next to the t-statistics (agg_welch_ttest,
    agg_ttest_paired) and agg_power_sample_size: significance says
    whether, d says HOW MUCH. One grouped pass collapses the corpus to
    two rows of exact integer moments (n, Σy, Σy²) from cent-quantized
    values; the d/g arithmetic is one fixed IEEE dataflow over those
    identical integers on both engines — the agg_welch_ttest
    discipline — rounded once at 4 dp, −0.0 normalized. Map-side
    combinable all the way; output is one row."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    q = F.floor(F.col("value") * 100).cast("bigint")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    )
    m = g.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("s1"))).alias("a1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("s2"))).alias("q1"),
        F.max(F.when(F.col("event_type") == "view", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "view", F.col("s1"))).alias("a2"),
        F.max(F.when(F.col("event_type") == "view", F.col("s2"))).alias("q2"),
    )
    d_expr = (
        "(CAST(a1 AS DOUBLE) / n1 - CAST(a2 AS DOUBLE) / n2)"
        " / SQRT(((CAST(q1 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1)"
        "         + (CAST(q2 AS DOUBLE) - CAST(a2 AS DOUBLE) * a2 / n2))"
        "        / (n1 + n2 - 2))"
    )
    return m.select(
        "n1", "n2",
        F.expr(f"ROUND({d_expr}, 4) + 0.0D").alias("cohens_d"),
        F.expr(
            f"ROUND(({d_expr}) * (1 - 3.0D / (4 * (n1 + n2) - 9)), 4) + 0.0D"
        ).alias("hedges_g"),
    )


@query(
    "agg_trimmed_mean",
    category="aggregate",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY floor(value * 100), event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    kept AS (
      SELECT event_type, cents, n FROM q
      WHERE rk > n // 10 AND rk <= n - n // 10
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS trimmed_mean_cents
    FROM kept GROUP BY event_type ORDER BY event_type
    """,
)
def agg_trimmed_mean(spark, sf_dir):
    """10 % two-sided TRIMMED mean per event type — the robust-location
    sibling of agg_winsorized_mean (winsorizing clamps the tails into
    the estimate, trimming removes them; both belong on the
    heavy-tailed-metrics shelf). Rank-based and integer-exact: one
    window pass assigns a TOTAL order by (cents, event_id) — event_id
    breaks ties, so both engines trim the identical row set — the keep
    band is rank ∈ (⌊n/10⌋, n−⌊n/10⌋] by integer floor division, and
    the mean is a flooring division of exact cent sums. One exchange
    on event_type serves the rank window, the count window, and the
    final rollup. At 100 TB an exact global trim needs the rank sort
    per group (this plan); the approximate path is percentile_approx
    cuts (agg_approx_percentile) feeding a filtered mean."""
    ev = table(spark, sf_dir, "events")
    q = ev.select(
        "event_type", "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wrk = W.partitionBy("event_type").orderBy("cents", "event_id")
    wn = W.partitionBy("event_type")
    r = q.select(
        "event_type", "cents",
        F.row_number().over(wrk).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = r.where(
        (F.col("rk") > F.expr("n DIV 10")) & (F.col("rk") <= F.col("n") - F.expr("n DIV 10"))
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.max("n").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.expr("SUM(cents) DIV COUNT(*)").alias("trimmed_mean_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_ratio_delta_method",
    category="aggregate",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(floor(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM u
    )
    SELECT n,
           ROUND(CAST(sx AS DOUBLE) / sy, 4) + 0.0 AS ratio,
           ROUND((1.0 / (CAST(sy AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n))
                 * ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
                    - 2 * (CAST(sx AS DOUBLE) / sy)
                        * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1))
                    + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                        * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)))
                 / n, 4) + 0.0 AS var_ratio
    FROM m
    """,
)
def agg_ratio_delta_method(spark, sf_dir):
    """Delta-method variance of a RATIO metric (revenue per event,
    clustered by user) — the experimentation-infrastructure staple the
    naive per-row variance gets WRONG when the randomization unit
    (user) differs from the analysis unit (event): Var(X̄/Ȳ) ≈
    (1/μy²)(σx² − 2r·σxy + r²σy²)/n over per-user totals (Deng et al.
    2018's cluster-ratio correction). Completes the A/B shelf next to
    agg_srm_check / agg_cuped_adjustment / agg_diff_in_diff. One pass
    collapses events to per-user exact integer totals (purchase cents,
    event count); the second is one row of exact BIGINT cross-moments;
    the delta formula is a single fixed IEEE dataflow over those
    identical integers, rounded once at 4 dp, −0.0 normalized."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return m.select(
        "n",
        F.expr("ROUND(CAST(sx AS DOUBLE) / sy, 4) + 0.0D").alias("ratio"),
        F.expr(
            "ROUND((1.0D / (CAST(sy AS DOUBLE) / n) / (CAST(sy AS DOUBLE) / n))"
            " * ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)"
            "    - 2 * (CAST(sx AS DOUBLE) / sy)"
            "        * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1))"
            "    + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)"
            "        * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)))"
            " / n, 4) + 0.0D"
        ).alias("var_ratio"),
    )


@query(
    "agg_k_anonymity_check",
    category="aggregate",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey AS nation, c_mktsegment AS seg,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS k
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_classes,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             AS n_exposed_rows,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000
                // SUM(k) AS BIGINT) AS exposed_ppm,
           CAST(MIN(k) AS BIGINT) AS min_k
    FROM qi
    """,
)
def agg_k_anonymity_check(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier tuple (nation,
    market segment, account-balance band): how many equivalence
    classes fall below k = 5, and what share of ROWS they expose — the
    release-gate every governed dataset export runs before quasi-
    identifiers leave the boundary (Sweeney 2002; the banded balance
    is the generalization step, floor(bal/1000) so the band edge is
    integer-exact on both engines). One map-side-combinable groupBy
    builds the class-size table; the audit is a second tiny aggregate
    over it — classes-sized, never row-sized. Flooring ppm division;
    min_k reports the worst class so the re-generalization loop
    (widen bands until min_k ≥ 5) has its control signal."""
    c = table(spark, sf_dir, "customer")
    qi = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("k"))
    small = F.when(F.col("k") < 5, F.col("k")).otherwise(F.lit(0))
    return qi.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0)).alias("n_small_classes"),
        F.sum(small).alias("n_exposed_rows"),
        F.expr(
            "SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000 DIV SUM(k)"
        ).alias("exposed_ppm"),
        F.min("k").alias("min_k"),
    )


@query(
    "agg_population_stability_index",
    category="aggregate",
    oracle="""
    WITH mid AS (
      SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2
               AS m
      FROM events
    ),
    lab AS (
      SELECT LEAST(CAST(floor(value / 60) AS BIGINT), 9) AS bin,
             CASE WHEN epoch_us(ts) < mid.m THEN 0 ELSE 1 END AS period
      FROM events CROSS JOIN mid
    ),
    c AS (
      SELECT bin,
             SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS b
      FROM lab GROUP BY bin
    ),
    t AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM c)
    SELECT c.bin, CAST(c.a AS BIGINT) AS n_before, CAST(c.b AS BIGINT) AS n_after,
           ROUND((CAST(c.a AS DOUBLE) / t.ta - CAST(c.b AS DOUBLE) / t.tb)
                 * ln((CAST(c.a AS DOUBLE) / t.ta)
                      / (CAST(c.b AS DOUBLE) / t.tb)), 6) + 0.0 AS psi_term
    FROM c CROSS JOIN t
    WHERE c.a > 0 AND c.b > 0
    ORDER BY c.bin
    """,
)
def agg_population_stability_index(spark, sf_dir):
    """Population Stability Index between the first and second half of
    the event stream, per value decile-band — THE model-ops drift
    alarm (PSI > 0.25 = retrain): psi = Σ_bins (p−q)·ln(p/q). Emitted
    as the per-bin term table (exact before/after counts + the 6-dp
    term) so the alarm threshold AND the culprit bins read from one
    result; the scalar is the term sum (≤10 values — the safe small-
    sum class). The period split keys off the integer midpoint of the
    time range (epoch-µs floor division — engine-identical); bins are
    integer value bands (floor(v/60), capped at 9). Counts are exact
    integers from ONE grouped pass (the period CASE rides the same
    scan); p/q ratios feed one fixed IEEE dataflow both engines share,
    rounded once. Zero-count bins are excluded (standard PSI practice
    — ln diverges; production smooths instead). Scan-parallel,
    bins-sized output."""
    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.expr("(MAX(unix_micros(ts)) - MIN(unix_micros(ts))) DIV 2")
        ).alias("m")
    )
    lab = ev.crossJoin(F.broadcast(mid)).select(
        F.least(F.floor(F.col("value") / 60).cast("bigint"), F.lit(9)).alias("bin"),
        F.when(F.unix_micros("ts") < F.col("m"), 0).otherwise(1).alias("period"),
    )
    c = lab.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("b"),
    )
    t = c.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    p = F.col("a").cast("double") / F.col("ta")
    q = F.col("b").cast("double") / F.col("tb")
    return (
        c.crossJoin(F.broadcast(t))
        .where((F.col("a") > 0) & (F.col("b") > 0))
        .select(
            "bin",
            F.col("a").alias("n_before"),
            F.col("b").alias("n_after"),
            (F.round((p - q) * F.log(p / q), 6) + F.lit(0.0)).alias("psi_term"),
        )
        .orderBy("bin")
    )


@query(
    "agg_histogram_equi_depth",
    category="aggregate",
    oracle="""
    WITH q AS (
      SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             NTILE(8) OVER (ORDER BY floor(l_extendedprice * 100),
                            l_orderkey, l_linenumber) AS bucket
      FROM lineitem
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM q GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram_equi_depth(spark, sf_dir):
    """EQUI-DEPTH histogram of lineitem price (8 buckets of equal row
    count) — the histogram a query OPTIMIZER keeps (equal-depth bounds
    selectivity estimates uniformly; agg_histogram's equal-WIDTH
    variant starves the dense buckets), and what Spark itself stores
    under `spark.sql.statistics.histogram.enabled`. NTILE over a TOTAL
    order — cents then the unique (l_orderkey, l_linenumber) key, so
    both engines assign the identical bucket to every tied-price row —
    then per-bucket count and exact integer bounds. The global sort is
    the cost (at 100 TB: sample first, exactly as Spark's ANALYZE
    does; this is the exact reference the sampled sketch is judged
    against — the agg_approx_percentile pairing). All-integer
    output."""
    li = table(spark, sf_dir, "lineitem")
    q = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.ntile(8)
        .over(W.orderBy(F.expr("floor(l_extendedprice * 100)"), "l_orderkey", "l_linenumber"))
        .alias("bucket"),
    )
    return (
        q.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("bucket")
    )


@query(
    "agg_table_checksum",
    category="aggregate",
    oracle="""
    WITH h AS (
      SELECT ('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|'
               || CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR)
               || '|' || strftime(o_orderdate, '%Y-%m-%d')), 1, 15))::BIGINT
               AS hv
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(hv AS HUGEINT)) % 9223372036854775807 AS BIGINT)
             AS checksum_sum,
           CAST(bit_xor(hv) AS BIGINT) AS checksum_xor
    FROM h
    """,
)
def agg_table_checksum(spark, sf_dir):
    """Order-independent TABLE CHECKSUM over orders (ClickHouse's
    ``groupBitXor(cityHash64(*))`` replication-verification idiom,
    re-expressed portably): each row canonicalizes to a delimited
    string (cents-quantized price, ISO date), hashes through the
    engine-portable md5-prefix integer, and the table fingerprint is
    BOTH the mod-2⁶³−1 SUM and the XOR of row hashes — commutative, so
    the result is independent of partitioning, ordering, and engine
    (the check a migration runs on both sides of a copy; sum AND xor
    together because xor alone cancels even-multiplicity corruption,
    the doc_winnowing_fingerprint caveat). One scan, one
    map-side-combinable aggregate, three integers out — the cheapest
    possible 100 TB integrity gate."""
    o = table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    h = o.select(
        F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("bigint").alias("hv")
    )
    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "CAST(SUM(CAST(hv AS DECIMAL(38,0))) % 9223372036854775807"
            " AS BIGINT)"
        ).alias("checksum_sum"),
        F.expr("bit_xor(hv)").alias("checksum_xor"),
    )


@query(
    "agg_contingency_residuals",
    category="aggregate",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CASE WHEN user_id % 3 = 0 THEN 'cohort_a'
                  WHEN user_id % 3 = 1 THEN 'cohort_b'
                  ELSE 'cohort_c' END AS cohort,
             COUNT(*) AS obs
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT c.*,
             SUM(obs) OVER (PARTITION BY event_type) AS row_tot,
             SUM(obs) OVER (PARTITION BY cohort) AS col_tot,
             SUM(obs) OVER () AS n
      FROM c
    )
    SELECT event_type, cohort, CAST(obs AS BIGINT) AS obs,
           CAST((2 * row_tot * col_tot * 10000 + n) // (2 * n) AS BIGINT)
             / 10000.0 + 0.0 AS expected,
           ROUND((obs - CAST(row_tot AS DOUBLE) * col_tot / n)
                 / sqrt(CAST(row_tot AS DOUBLE) * col_tot / n), 4) + 0.0
             AS std_residual
    FROM m ORDER BY event_type, cohort
    """,
)
def agg_contingency_residuals(spark, sf_dir):
    """Standardized residuals of the event-type × cohort contingency
    table — the DRILL-DOWN behind ch_contingency's single χ² number:
    the χ² says THAT the table deviates, the per-cell residual
    (obs − exp)/√exp says WHERE (|residual| > 2 marks the driving
    cells — the post-hoc every A/B readout needs before acting). Cell
    counts and both margins are exact integers from one grouped pass
    (the margins ride window sums over the cells-sized frame, no
    second scan); EXPECTED is emitted via exact integer half-away
    division (row·col·1e4 ≈ 1e15, safely int64) because at sf1.0 one
    cell's true expected lands exactly on a .00005 boundary where
    Spark's ROUND half-up and DuckDB's half-even disagree (caught by
    the sf1.0 sweep); the residual keeps the shared fixed IEEE
    dataflow, rounded once at 4 dp with −0.0 normalized. Output is a
    15-cell table; everything after the count shuffle is cells-sized."""
    ev = table(spark, sf_dir, "events")
    cohort = (
        F.when(F.col("user_id") % 3 == 0, "cohort_a")
        .when(F.col("user_id") % 3 == 1, "cohort_b")
        .otherwise("cohort_c")
    )
    c = ev.groupBy("event_type", cohort.alias("cohort")).agg(
        F.count(F.lit(1)).alias("obs")
    )
    m = c.select(
        "event_type", "cohort", "obs",
        F.sum("obs").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("obs").over(W.partitionBy("cohort")).alias("col_tot"),
        F.sum("obs").over(W.partitionBy()).alias("n"),
    )
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    return m.select(
        "event_type", "cohort", "obs",
        (
            F.expr(
                "(2 * row_tot * col_tot * 10000 + n) DIV (2 * n)"
            ) / 10000.0
            + F.lit(0.0)
        ).alias("expected"),
        (F.round((F.col("obs") - exp) / F.sqrt(exp), 4) + F.lit(0.0)).alias(
            "std_residual"
        ),
    ).orderBy("event_type", "cohort")
