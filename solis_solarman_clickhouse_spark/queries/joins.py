"""Q-JOIN: the join surface (SURVEY.md §2-C Q-JOIN-1..9).

Physical strategy notes (what we want Catalyst/AQE to pick, verified with
.explain in tests/test_plans.py):
- star joins broadcast every dimension side (explicit F.broadcast on the
  constant-size dims; AQE converts the rest when below threshold);
- fact-fact joins shuffle on the join key (sort-merge / shuffled-hash by
  Spark's choice) — at 100 TB these are the queries where bucketed layout
  on the join key removes the shuffle entirely;
- as-of and interval joins use the custom operators in
  solis_solarman_clickhouse_spark.operators (no native Spark primitive).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.asof_join import asof_join
from ..operators.bloom import bloom_semi_join
from ..operators.interval_join import interval_self_join
from ..tables import spread, table
from .registry import dsum, query, r4, sql_dsum


@query(
    "join_star_revenue",
    category="join",
    oracle=f"""
    SELECT r_name AS region_name, n_name AS nation_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_star_revenue(spark, sf_dir):
    """Q-JOIN-1: 5-way star join, revenue per (region, nation).

    lineitem⋈orders is the only fact-fact edge (shuffle on orderkey);
    customer/nation/region are broadcast so the probe side streams through
    without further shuffles.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # no spread() here: the orderkey exchange below already redistributes
    # the fact — a pre-join repartition would be a second full shuffle
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


@query(
    "join_left_outer",
    category="join",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark, sf_dir):
    """Q-JOIN-2: left outer join preserving orderless customers (zero counts)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    category="join",
    oracle="""
    SELECT
      CASE WHEN c_custkey IS NULL THEN -1 ELSE c_custkey END AS cust_side,
      CASE WHEN o_orderkey IS NULL THEN -1 ELSE o_orderkey END AS order_side
    FROM orders FULL OUTER JOIN customer ON o_custkey = c_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Q-JOIN-3: full outer join, null-extended on both sides."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    j = o.join(c, o.o_custkey == c.c_custkey, "full")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.lit(-1)).alias("cust_side"),
        F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("order_side"),
    )


@query(
    "join_semi",
    category="join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi(spark, sf_dir):
    """Q-JOIN-4: left semi (EXISTS) — customers with at least one order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    category="join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_anti(spark, sf_dir):
    """Q-JOIN-5: left anti (NOT EXISTS) — customers with no FINISHED
    order. (The fixture gives every customer at least one order, so the
    unfiltered anti join would be vacuously empty and test nothing — the
    status filter keeps the result set non-trivial at every SF.)"""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    category="join",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark, sf_dir):
    """Q-JOIN-6: Cartesian product (both sides tiny; broadcast NLJ)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@query(
    "join_theta_prior_orders",
    category="join",
    oracle="""
    SELECT o.o_custkey AS custkey, COUNT(*) AS n_prior_pairs,
           MAX(o.o_orderkey) AS max_orderkey
    FROM orders o JOIN orders p
      ON o.o_custkey = p.o_custkey AND o.o_orderdate > p.o_orderdate
    GROUP BY o.o_custkey
    """,
)
def join_theta_prior_orders(spark, sf_dir):
    """Q-JOIN-7: non-equi (theta) self-join — (order, strictly-earlier order)
    pairs per customer. Equi part (custkey) carries the shuffle; the date
    inequality is a post-join filter, so this is a hash join, not NLJ."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    a, p = o.alias("a"), o.alias("p")
    return (
        a.join(
            p,
            (F.col("a.o_custkey") == F.col("p.o_custkey"))
            & (F.col("a.o_orderdate") > F.col("p.o_orderdate")),
        )
        .groupBy(F.col("a.o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_prior_pairs"),
            F.max("a.o_orderkey").alias("max_orderkey"),
        )
    )


@query(
    "join_asof_latest_event",
    category="join",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events GROUP BY user_id, ts
    )
    SELECT o.o_orderkey, o.o_custkey, ev.ts AS asof_ts,
           ROUND(ev.value, 4) AS asof_value
    FROM orders o
    ASOF LEFT JOIN ev ON o.o_custkey = ev.user_id AND o.o_orderdate >= ev.ts
    """,
)
def join_asof_latest_event(spark, sf_dir):
    """Q-JOIN-8: as-of join — for each order, the latest event at or before
    the order date for the same user. Custom operator (operators/asof_join):
    one shuffle, union+window carry-forward; see module docstring for the
    100 TB cost argument. Events are pre-aggregated per (user, ts) so ties
    are deterministic on both engines."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    ev = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .withColumnRenamed("user_id", "o_custkey")
    )
    joined = asof_join(
        o,
        ev,
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ts",
        right_payload=["value"],
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        F.col("asof_ts"),
        F.round(F.col("asof_value"), 4).alias("asof_value"),
    )


@query(
    "join_interval_pairs",
    category="join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR
    GROUP BY a.user_id
    """,
)
def join_interval_pairs(spark, sf_dir):
    """Q-JOIN-9: interval join — event pairs per user within ±1 h. Custom
    bucketed-range operator (operators/interval_join): equi-join on
    (key, time-bucket) + exact post-filter instead of an NLJ inequality
    join; scales with data density, not |table|²."""
    ev = table(spark, sf_dir, "events")
    pairs = interval_self_join(
        ev, key="user_id", ts="ts", id_col="event_id", tolerance_seconds=3600
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "join_asof_next_event",
    category="join",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events GROUP BY user_id, ts
    )
    SELECT o.o_orderkey, o.o_custkey, ev.ts AS asof_ts,
           ROUND(ev.value, 4) AS asof_value
    FROM orders o
    ASOF LEFT JOIN ev ON o.o_custkey = ev.user_id AND o.o_orderdate <= ev.ts
    """,
)
def join_asof_next_event(spark, sf_dir):
    """Forward as-of join: for each order, the EARLIEST event at or after
    the order date for the same user (the "next reading" lookup — e.g.
    first telemetry sample after a maintenance event). Same one-shuffle
    union+window operator as the backward variant with the traversal
    reversed; DuckDB expresses it natively as ASOF with a <= inequality."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    ev = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .withColumnRenamed("user_id", "o_custkey")
    )
    joined = asof_join(
        o,
        ev,
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ts",
        right_payload=["value"],
        direction="forward",
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        F.col("asof_ts"),
        F.round(F.col("asof_value"), 4).alias("asof_value"),
    )


@query(
    "join_null_safe_eq",
    category="join",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS k,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT COALESCE(a.k, '<null>') AS k, a.n * b.n AS n_pairs
    FROM a JOIN a b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — the semantics ClickHouse
    gives with join_use_nulls and ANSI with IS NOT DISTINCT FROM. Spark
    plans eqNullSafe as a regular hash join (null gets a hash bucket),
    NOT a nested loop — same single shuffle as a plain equi-join; the
    side tables here are pre-aggregated so the pair counts are scale-free."""
    o = table(spark, sf_dir, "orders")
    k = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    a = o.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("n"))
    b = a.select(F.col("k").alias("kb"), F.col("n").alias("nb"))
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("kb")))
        .select(
            F.coalesce(F.col("k"), F.lit("<null>")).alias("k"),
            (F.col("n") * F.col("nb")).alias("n_pairs"),
        )
    )


@query(
    "join_bloom_prefilter",
    category="join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
    GROUP BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark, sf_dir):
    """Bloom-prefiltered semi join — the 100 TB pattern for selective
    fact⋈dim filters: k broadcast bloom lanes discard fact rows before the
    exact join, so the wide side is never shuffled (operators/bloom.py;
    Spark's own runtime bloom injection isn't SQL-surfaced in this build).
    Final semantics are EXACTLY the plain semi join, so the oracle is a
    plain IN-subquery."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000.0)
    kept = bloom_semi_join(o, "o_custkey", c, "c_custkey", n_buckets=1 << 14)
    return kept.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "join_skew_salted",
    category="join",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n_events,
           ROUND({sql_dsum('value')}, 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_skew_salted(spark, sf_dir):
    """Skew-mitigated fact⋈dim join: events.user_id is Zipf-skewed, so a
    plain shuffle join sends the hot keys to one task. The salted plan
    appends a deterministic 8-way salt (hash of the fact PK) to the fact
    key and replicates the dim side 8x, so each hot key fans out over 8
    tasks; the post-join aggregate is unchanged. This is the manual
    spelling of AQE's skew-join split (kept explicit because AQE only
    rebalances sort-merge joins it can see stats for); results are
    identical to the plain join, which is the oracle."""
    salt_n = 8
    ev = table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(salt_n)).cast("int")
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    salts = spark.range(salt_n).select(F.col("id").cast("int").alias("salt"))
    dim = cust.crossJoin(F.broadcast(salts))
    joined = ev.join(dim, on=["user_id", "salt"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        r4(dsum("value")).alias("total_value"),
    )


@query(
    "join_broadcast_range_lookup",
    category="join",
    oracle=f"""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0),
             ('high', 200.0, 400.0), ('extreme', 400.0, 1000.0)
    )
    SELECT tier, COUNT(*) AS n_events,
           ROUND({sql_dsum('value')}, 4) AS total_value
    FROM events JOIN tiers ON value >= lo AND value < hi
    GROUP BY tier
    """,
)
def join_broadcast_range_lookup(spark, sf_dir):
    """Range-bracket dimension lookup (tax brackets / rate tiers /
    alerting thresholds): the dim rows carry [lo, hi) intervals, the join
    predicate is a pure inequality. With the dim broadcast this is a
    BroadcastNestedLoopJoin over 4 rows — O(|fact| · |tiers|) with tiny
    constant and NO shuffle of the fact side, the right plan whenever the
    bracket table is human-sized. Brackets are half-open so the engine
    never double-counts a boundary value."""
    ev = table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0),
         ("high", 200.0, 400.0), ("extreme", 400.0, 1000.0)],
        "tier string, lo double, hi double",
    )
    joined = ev.join(
        F.broadcast(tiers),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        r4(dsum("value")).alias("total_value"),
    )


@query(
    "join_unmatched_audit",
    category="join",
    oracle="""
    SELECT CASE WHEN o_custkey IS NULL THEN 'customer_only'
                WHEN c_custkey IS NULL THEN 'orders_only'
                ELSE 'matched' END AS bucket,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT COALESCE(c_custkey, o_custkey)) AS n_keys
    FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY 1
    """,
)
def join_unmatched_audit(spark, sf_dir):
    """Reconciliation audit: one full-outer join classified into
    matched / left-only / right-only with row and key counts — the
    referential-integrity report run before trusting a landed batch
    (reference A10's sink has no FK checks; this is the downstream
    guard). Single shuffle on the key; the classification is a pure
    projection over the join's null pattern."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
    bucket = (
        F.when(F.col("o_custkey").isNull(), "customer_only")
        .when(F.col("c_custkey").isNull(), "orders_only")
        .otherwise("matched")
    )
    return j.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.coalesce("c_custkey", "o_custkey")).alias("n_keys"),
    )


@query(
    "join_scd2_point_in_time",
    category="join",
    oracle="""
    WITH versions AS (
      SELECT user_id, value, ts AS valid_from,
             COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      TIMESTAMP '9999-12-31') AS valid_to
      FROM events
      WHERE event_type = 'signup'
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
    )
    SELECT o.o_orderkey, o.o_custkey, v.valid_from,
           ROUND(v.value, 4) AS version_value
    FROM orders o
    LEFT JOIN versions v
      ON o.o_custkey = v.user_id
     AND o.o_orderdate >= v.valid_from AND o.o_orderdate < v.valid_to
    """,
)
def join_scd2_point_in_time(spark, sf_dir):
    """SCD2 point-in-time join: 'signup' events become type-2 dimension
    versions with [valid_from, valid_to) windows built from lead() (one
    version per (user, ts) — duplicates collapsed deterministically), and
    each order picks the version valid at its date. Spark side rides the
    as-of operator (one shuffle, union+window — no interval NLJ); the
    oracle spells the same thing as an interval join, which is exactly
    the equivalence SCD2 relies on: at most ONE version interval covers
    any point in time."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    wdedup = W.partitionBy("user_id", "ts").orderBy("event_id")
    versions = (
        ev.withColumn("rn", F.row_number().over(wdedup))
        .where(F.col("rn") == 1)
        .select(F.col("user_id").alias("o_custkey"), "ts", "value")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    joined = asof_join(
        o,
        versions,
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ts",
        right_payload=["value"],
        direction="backward",
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        F.col("asof_ts").alias("valid_from"),
        F.round(F.col("asof_value"), 4).alias("version_value"),
    )


@query(
    "join_asof_tolerance",
    category="join",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events GROUP BY user_id, ts
    ),
    m AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, ev.ts AS asof_ts, ev.value
      FROM orders o
      ASOF LEFT JOIN ev ON o.o_custkey = ev.user_id AND o.o_orderdate >= ev.ts
    )
    SELECT o_orderkey, o_custkey,
           CASE WHEN asof_ts IS NOT NULL
                 AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) - epoch_us(asof_ts)
                     <= 2592000000000
                THEN asof_ts END AS asof_ts,
           CASE WHEN asof_ts IS NOT NULL
                 AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) - epoch_us(asof_ts)
                     <= 2592000000000
                THEN ROUND(value, 4) END AS asof_value
    FROM m
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a STALENESS TOLERANCE (pandas merge_asof
    tolerance= / kdb wj within-window): the latest event at or before the
    order date matches only if it is at most 30 days old — older state is
    treated as missing, the semantics a feature-store lookup needs so a
    dead sensor doesn't serve year-old features forever. Same one-shuffle
    as-of operator; the tolerance is a post-filter in integer
    MICROSECONDS (2 592 000 000 000 = 30 d) because truncating casts to
    seconds diverge between engines at the boundary."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    ev = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .withColumnRenamed("user_id", "o_custkey")
    )
    j = asof_join(
        o,
        ev,
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ts",
        right_payload=["value"],
        direction="backward",
    )
    fresh = (
        F.col("asof_ts").isNotNull()
        & (
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            - F.unix_micros(F.col("asof_ts"))
            <= 2592000000000
        )
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        F.when(fresh, F.col("asof_ts")).alias("asof_ts"),
        F.when(fresh, F.round(F.col("asof_value"), 4)).alias("asof_value"),
    )


@query(
    "join_left_mark",
    category="join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(CASE WHEN EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey
                                     AND o.o_orderstatus = 'F')
                      THEN 1 END) AS n_with_f_order
    FROM customer c
    GROUP BY c.c_mktsegment
    """,
)
def join_left_mark(spark, sf_dir):
    """Mark join: EXISTS as a BOOLEAN COLUMN instead of a filter — the
    shape BI tools emit for "flag customers with a finished order" and
    engines plan as a left-mark/left-outer + distinct probe. Spark has no
    mark-join syntax; the portable plan is a left join against the
    DISTINCT key set (semantically identical because the build side is
    deduped — no row multiplication) with the null-ness as the mark."""
    c = table(spark, sf_dir, "customer")
    f_cust = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("__mark", F.lit(1))
    )
    marked = c.join(F.broadcast(f_cust), "c_custkey", "left")
    return marked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count("__mark").alias("n_with_f_order"),
    )


@query(
    "join_asof_nearest",
    category="join",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events GROUP BY user_id, ts
    ),
    bwd AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, ev.ts AS b_ts, ev.value AS b_v
      FROM orders o
      ASOF LEFT JOIN ev ON o.o_custkey = ev.user_id AND o.o_orderdate >= ev.ts
    ),
    fwd AS (
      SELECT o.o_orderkey, ev.ts AS f_ts, ev.value AS f_v
      FROM orders o
      ASOF LEFT JOIN ev ON o.o_custkey = ev.user_id AND o.o_orderdate <= ev.ts
    ),
    j AS (
      SELECT b.o_orderkey, b.o_custkey,
             epoch_us(CAST(b.o_orderdate AS TIMESTAMP)) AS t0,
             epoch_us(b.b_ts) AS bt, b.b_v,
             epoch_us(f.f_ts) AS ft, f.f_v
      FROM bwd b JOIN fwd f ON b.o_orderkey = f.o_orderkey
    )
    SELECT o_orderkey, o_custkey,
           CASE WHEN bt IS NULL THEN ROUND(f_v, 4)
                WHEN ft IS NULL THEN ROUND(b_v, 4)
                WHEN t0 - bt <= ft - t0 THEN ROUND(b_v, 4)
                ELSE ROUND(f_v, 4) END AS nearest_value,
           CASE WHEN bt IS NULL THEN ft - t0
                WHEN ft IS NULL THEN t0 - bt
                ELSE LEAST(t0 - bt, ft - t0) END AS dist_us
    FROM j
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest as-of join (pandas merge_asof direction='nearest'): each
    order takes whichever event is CLOSER in time — backward and forward
    as-of passes composed, ties to the backward (past) match, distances
    compared in integer microseconds. Two one-shuffle as-of operators
    over the same key partitioning plus a PK-equi join to combine; the
    tie rule is deterministic on both engines."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    ev = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
        .withColumnRenamed("user_id", "o_custkey")
    )
    bwd = asof_join(
        o, ev, on="o_custkey", left_ts="o_orderdate", right_ts="ts",
        right_payload=["value"], direction="backward",
    ).select(
        "o_orderkey", "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t0"),
        F.unix_micros("asof_ts").alias("bt"),
        F.col("asof_value").alias("b_v"),
    )
    fwd = asof_join(
        o, ev, on="o_custkey", left_ts="o_orderdate", right_ts="ts",
        right_payload=["value"], direction="forward",
    ).select(
        F.col("o_orderkey").alias("f_key"),
        F.unix_micros("asof_ts").alias("ft"),
        F.col("asof_value").alias("f_v"),
    )
    j = bwd.join(fwd, bwd["o_orderkey"] == fwd["f_key"])
    near_b = (F.col("t0") - F.col("bt")) <= (F.col("ft") - F.col("t0"))
    value = (
        F.when(F.col("bt").isNull(), F.round(F.col("f_v"), 4))
        .when(F.col("ft").isNull(), F.round(F.col("b_v"), 4))
        .when(near_b, F.round(F.col("b_v"), 4))
        .otherwise(F.round(F.col("f_v"), 4))
    )
    dist = (
        F.when(F.col("bt").isNull(), F.col("ft") - F.col("t0"))
        .when(F.col("ft").isNull(), F.col("t0") - F.col("bt"))
        .otherwise(F.least(F.col("t0") - F.col("bt"), F.col("ft") - F.col("t0")))
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        value.alias("nearest_value"),
        dist.alias("dist_us"),
    )


@query(
    "join_bucketed_colocated",
    category="join",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_bucketed_colocated(spark, sf_dir):
    """Fact-fact join over a bucketed+sorted physical layout — the 100 TB
    answer to the recurring orders⋈lineitem shuffle: both sides are
    written `bucketBy(8, orderkey).sortBy(orderkey)`, so the layout
    carries the hash distribution and the SortMergeJoin runs
    exchange-free and sort-free (asserted in
    tests/test_plans.py::test_bucketed_layout_removes_fact_fact_shuffle);
    only the tiny post-join status aggregate shuffles. Result
    hash-matches the plain-join oracle — layout changes the plan, never
    the answer. Tables are dropped per run; revenue uses the
    DECIMAL(38,6) idiom shared with Q1/Q3."""
    import tempfile
    import uuid

    base = tempfile.mkdtemp(prefix="bucketed_join_")
    suf = uuid.uuid4().hex[:8]
    ot, lt = f"b_orders_{suf}", f"b_lineitem_{suf}"
    (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{base}/o").format("parquet").saveAsTable(ot)
    )
    (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{base}/l").format("parquet").saveAsTable(lt)
    )
    try:
        j = (
            spark.table(ot).hint("merge")
            .join(
                spark.table(lt).hint("merge"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                    "revenue"
                ),
            )
        )
        # tracked: harness releases the (rows-few) materialized result
        from ..caching import tracked_checkpoint

        return tracked_checkpoint(j)
    finally:
        for t in (ot, lt):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@query(
    "join_feature_store_pit",
    category="join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT o.o_orderkey, o.o_custkey,
           ROUND(c.click_value, 4) AS f_click,
           ROUND(p.purchase_value, 4) AS f_purchase
    FROM orders o
    ASOF LEFT JOIN clicks c
      ON o.o_custkey = c.user_id AND o.o_orderdate >= c.ts
    ASOF LEFT JOIN purchases p
      ON o.o_custkey = p.user_id AND o.o_orderdate >= p.ts
    """,
)
def join_feature_store_pit(spark, sf_dir):
    """Feature-store POINT-IN-TIME join — the training-data correctness
    primitive every feature platform (Feast/Tecton-style) is built
    around: each label row (an order) picks up, from EACH feature table
    independently, the latest value known AT OR BEFORE the label
    timestamp — never a later one (that would be target leakage). Two
    backward as-of joins composed over different feature streams
    (click-value and purchase-value features derived from events),
    each the repo's union+window asof_join operator: per feature table
    one shuffle on the entity key, no range explosion, missing features
    stay NULL rather than dropping the label row. At 100 TB the
    composition matters: feature tables join one at a time (each
    bounded state), not as one N-way interval monster. Oracle: DuckDB's
    native chained ASOF LEFT JOINs."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    ev = table(spark, sf_dir, "events")

    def feat(event_type, out):
        return (
            ev.where(F.col("event_type") == event_type)
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias(out))
            .withColumnRenamed("user_id", "o_custkey")
        )

    j1 = asof_join(
        o,
        feat("click", "click_value"),
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ts",
        right_payload=["click_value"],
    ).select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.col("asof_click_value").alias("click_value"),
    )
    j2 = asof_join(
        j1,
        feat("purchase", "purchase_value"),
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ts",
        right_payload=["purchase_value"],
    )
    return j2.select(
        "o_orderkey",
        "o_custkey",
        F.round("click_value", 4).alias("f_click"),
        F.round("asof_purchase_value", 4).alias("f_purchase"),
    )


@query(
    "join_lateral_api",
    category="join",
    oracle="""
    SELECT r.r_name, t.n_name, t.top_bal
    FROM region r,
    LATERAL (
      SELECT n.n_name,
             (SELECT MAX(c.c_acctbal) FROM customer c
              WHERE c.c_nationkey = n.n_nationkey) AS top_bal
      FROM nation n WHERE n.n_regionkey = r.r_regionkey
      ORDER BY n.n_name LIMIT 2
    ) t
    ORDER BY r.r_name, t.n_name
    """,
)
def join_lateral_api(spark, sf_dir):
    """Spark 4 ``DataFrame.lateralJoin`` — the DataFrame-API face of
    correlated table subqueries (sub_lateral_topn covers the SQL
    LATERAL keyword; this covers the new API surface): for each region,
    its first two nations alphabetically, each with that nation's top
    customer balance. The right side references the left row via
    ``F.col(...).outer()`` — a per-row dependent subquery by
    CONSTRUCTION, which Catalyst decorrelates into the same
    window-rank + join plan the SQL form gets (no nested-loop
    re-execution per outer row; that decorrelation is what makes
    LATERAL usable at 100 TB). Deterministic: alphabetical LIMIT 2 with
    a unique sort key, MAX over balances."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    top_bal = (
        c.groupBy("c_nationkey").agg(F.max("c_acctbal").alias("top_bal"))
    )
    sub = (
        n.join(top_bal, n["n_nationkey"] == top_bal["c_nationkey"], "left")
        .where(F.col("n_regionkey") == F.col("r_regionkey").outer())
        .orderBy("n_name")
        .limit(2)
        .select("n_name", "top_bal")
    )
    return (
        r.lateralJoin(sub)
        .select("r_name", "n_name", "top_bal")
        .orderBy("r_name", "n_name")
    )


@query(
    "join_context_window_count",
    category="join",
    oracle="""
    WITH od AS (
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    ed AS (
      SELECT user_id, CAST(ts AS DATE) AS ed, COUNT(*) AS n
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(COALESCE(SUM(e.n), 0) AS BIGINT) AS events_within_1d
    FROM od o
    LEFT JOIN ed e ON e.user_id = o.o_custkey
      AND e.ed BETWEEN o.od - INTERVAL 1 DAY AND o.od + INTERVAL 1 DAY
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def join_context_window_count(spark, sf_dir):
    """Context-window activity count — for each order, how many events
    its customer produced within ±1 day: the contextual feature a
    fraud/propensity model joins next to the point-in-time features
    (join_feature_store_pit gives the latest VALUE before the label;
    this gives the surrounding DENSITY). The scale-correct plan
    pre-aggregates events to per-(user, day) counts FIRST — the range
    join then touches day-granular rows (365×|users| at most), never
    raw events, and the ±1-day band makes it a 3-candidate banded
    equi-join in disguise (the operators/interval_join discipline).
    A 10%-of-orders probe keeps the result bounded; exact integer
    counts, LEFT join preserves zero-activity orders."""
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("od"))
    )
    ed = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("user_id"), F.to_date("ts").alias("ed"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = o.join(
        ed,
        (ed["user_id"] == o["o_custkey"])
        & (ed["ed"] >= F.date_sub(o["od"], 1))
        & (ed["ed"] <= F.date_add(o["od"], 1)),
        "left",
    )
    return j.groupBy("o_orderkey", "o_custkey").agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("events_within_1d")
    )


@query(
    "join_null_skew_isolation",
    category="joins",
    oracle="""
    WITH e AS (
      SELECT CASE WHEN value < 50 THEN NULL
                  ELSE user_id % 1500 + 1 END AS k,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT COALESCE(c.c_mktsegment, '_unmatched_') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(e.cents) AS BIGINT) AS cents
    FROM e LEFT JOIN customer c ON c.c_custkey = e.k
    GROUP BY 1 ORDER BY 1
    """,
)
def join_null_skew_isolation(spark, sf_dir):
    """NULL-key skew isolation — the physical pattern for the classic
    production incident: a LEFT join whose key is often NULL (here
    ~10 % of events carry no account linkage) sorts/hashes every NULL
    row into ONE partition of a shuffle join, and that straggler IS
    the job. The isolation rewrite splits the fact side FIRST: NULL
    keys can never match, so they bypass the join entirely (a pure
    projection to the null-padded shape) and only the non-null slice
    joins — here against a BROADCAST dim, so the fact side never
    shuffles at all; the two branches re-unite with unionByName. The
    result is provably identical to the naive LEFT join (the oracle
    runs exactly that), which is the point: this query pins that the
    rewrite is semantics-free. At 100 TB with a non-broadcastable dim
    the same split feeds a shuffle join whose partitions are now
    null-free and balanced."""
    ev = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    e = ev.select(
        F.when(F.col("value") < 50, F.lit(None).cast("bigint"))
        .otherwise(F.col("user_id") % 1500 + 1)
        .alias("k"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    nulls = e.where(F.col("k").isNull()).select(
        F.lit(None).cast("string").alias("c_mktsegment"), "cents"
    )
    matched = (
        e.where(F.col("k").isNotNull())
        .join(F.broadcast(c), F.col("k") == F.col("c_custkey"), "left")
        .select("c_mktsegment", "cents")
    )
    return (
        matched.unionByName(nulls)
        .groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("_unmatched_")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("segment")
    )
