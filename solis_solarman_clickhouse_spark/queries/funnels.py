"""ClickHouse-parity behavioral analytics over the `events` table.

The reference delegates ALL querying to ClickHouse (`/root/reference/
tables.sql:5-32` is its only query-side artifact), so its users have
ClickHouse's signature time-series/behavioral functions available over the
landed data: ``windowFunnel``, ``retention``, ``sequenceMatch`` and
``topK``. This module re-expresses each one Spark-first so a user of the
reference deployment keeps those dashboards when switching engines.

Scale notes (100 TB): every query here shuffles at most ONCE, on
`user_id` — the three funnel stages are chained window functions over the
SAME partitioning, so Catalyst plans a single Exchange reused by all three
Window operators; retention/sequence-match are single partial+final
aggregations; top-k is a partial count + TakeOrderedAndProject (no global
sort). Zipf-skewed `user_id` is safe because per-user state is O(1)
columns, not collected rows.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import table
from .registry import query

_FUNNEL_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click'
    AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 1 HOUR
  GROUP BY 1
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e
  JOIN t1 ON e.user_id = t1.user_id
  JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > t2.t2 AND e.ts <= t1.t1 + INTERVAL 1 HOUR
  GROUP BY 1
)
SELECT CASE WHEN t3.t3 IS NOT NULL THEN 3
            WHEN t2.t2 IS NOT NULL THEN 2
            WHEN t1.t1 IS NOT NULL THEN 1
            ELSE 0 END AS funnel_level,
       COUNT(*) AS n_users
FROM u
LEFT JOIN t1 USING (user_id)
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)
GROUP BY 1
"""


@query("ch_window_funnel", category="funnels", oracle=_FUNNEL_ORACLE)
def ch_window_funnel(spark, sf_dir):
    """ClickHouse ``windowFunnel(1h)(ts, view, click, purchase)`` parity
    (greedy-from-earliest-entry variant, documented determinism): per user,
    the deepest prefix of view -> click -> purchase reachable with strictly
    increasing timestamps inside 1 h of the FIRST view. Implemented as three
    chained conditional-min window functions over one `user_id`
    partitioning — a single shuffle, no self-joins."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    hour = F.expr("INTERVAL 1 HOUR")
    d = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    d = d.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t1"))
                & (F.col("ts") <= F.col("t1") + hour),
                F.col("ts"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= F.col("t1") + hour),
                F.col("ts"),
            )
        ).over(w),
    )
    level = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        d.select("user_id", level.alias("funnel_level"))
        .groupBy("user_id")
        .agg(F.max("funnel_level").alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "ch_retention",
    category="funnels",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(c1) AS BIGINT) AS r_view,
           CAST(SUM(c1 * c2) AS BIGINT) AS r_view_click,
           CAST(SUM(c1 * c3) AS BIGINT) AS r_view_purchase
    FROM f
    """,
)
def ch_retention(spark, sf_dir):
    """ClickHouse ``retention(view, click, purchase)`` parity: r1 counts
    users satisfying the anchor condition; rN counts users satisfying the
    anchor AND condition N (CH semantics: later flags are AND-ed with the
    first). Two-level aggregation — per-user conditional-max flags (partial
    agg combines map-side), then one global sum row."""
    ev = table(spark, sf_dir, "events")

    def flag(t):
        return F.max(F.when(F.col("event_type") == t, 1).otherwise(0))

    f = ev.groupBy("user_id").agg(
        flag("view").alias("c1"), flag("click").alias("c2"), flag("purchase").alias("c3")
    )
    return f.select(
        F.sum("c1").alias("r_view"),
        F.sum(F.col("c1") * F.col("c2")).alias("r_view_click"),
        F.sum(F.col("c1") * F.col("c3")).alias("r_view_purchase"),
    )


@query(
    "ch_sequence_match",
    category="funnels",
    oracle="""
    SELECT user_id,
           CASE WHEN MIN(CASE WHEN event_type = 'signup' THEN ts END)
                     < MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                THEN 1 ELSE 0 END AS matched
    FROM events GROUP BY user_id
    """,
)
def ch_sequence_match(spark, sf_dir):
    """ClickHouse ``sequenceMatch('(?1).*(?2)')(ts, signup, purchase)``
    parity: per user, does ANY signup strictly precede ANY purchase —
    equivalent to first(signup) < last(purchase), so it folds to one
    conditional min/max aggregation (no per-user event sorting, no state
    beyond two timestamps; NULL-safe: missing either event => 0)."""
    ev = table(spark, sf_dir, "events")
    first_signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    last_purchase = F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
    return ev.groupBy("user_id").agg(
        F.when(first_signup < last_purchase, 1).otherwise(0).alias("matched")
    )


@query(
    "agg_topk_heavy_hitters",
    category="funnels",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id LIMIT 10
    """,
)
def agg_topk_heavy_hitters(spark, sf_dir):
    """ClickHouse ``topK(10)(user_id)`` parity, exact variant: top-10 users
    by event count, ties broken by user_id. Partial+final count then
    TakeOrderedAndProject — per-partition top-10 heaps merged on the
    driver, never a global sort. (At 100 TB the exact groupBy on a zipf key
    is still one shuffle of pre-combined partial counts, bounded by
    distinct-key cardinality, not row count.)"""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "ch_cohort_retention",
    category="funnels",
    oracle="""
    WITH base AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
    ),
    c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM base GROUP BY user_id)
    SELECT c.cohort_wk, b.wk - c.cohort_wk AS weeks_since,
           COUNT(DISTINCT b.user_id) AS n_active
    FROM base b JOIN c ON b.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def ch_cohort_retention(spark, sf_dir):
    """Cohort retention matrix (the ClickHouse/product-analytics staple):
    users bucketed by first-active week, counted per week-offset of
    activity. Weeks are pure integer arithmetic on epoch microseconds
    (epoch_us div 1-week-of-micros) — no calendar functions, so both
    engines bucket identically; note `div`, not `/`: epoch micros exceed
    2^53 and double division would lose exactness. Three shuffles total:
    distinct (user, week), per-user min-week window, final cohort-cell
    count-distinct."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", F.expr("unix_micros(ts) div 604800000000").alias("wk")
    ).distinct()
    w = W.partitionBy("user_id")
    j = base.withColumn("cohort_wk", F.min("wk").over(w))
    return (
        j.select("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("weeks_since"), "user_id")
        .groupBy("cohort_wk", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
