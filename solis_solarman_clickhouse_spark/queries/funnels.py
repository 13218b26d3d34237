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

from ..caching import tracked_persist
from ..operators.asof_join import asof_join
from ..tables import table
from .registry import dsum, query, r4, sql_dsum

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


# --- ClickHouse aggregate-combinator parity (batch 2) ----------------------


@query(
    "ch_sum_map",
    category="clickhouse",
    oracle=f"""
    WITH per AS (
      SELECT user_id, event_type,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v_c
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           array_to_string(list(event_type ORDER BY event_type), ',')
             AS sum_map_keys,
           array_to_string(list(v_c ORDER BY event_type), ',')
             AS sum_map_values_c
    FROM per GROUP BY user_id
    """,
)
def ch_sum_map(spark, sf_dir):
    """ClickHouse ``sumMap(k, v)`` parity: per user, parallel sorted arrays
    of (event_type, summed value) — CH returns exactly this tuple-of-arrays
    shape, keys sorted. Two-level aggregation: partial sums per (user, key)
    shuffle once on the composite key, then the per-user re-grouping rides
    the same hash distribution. Element sums accumulate as exact integer
    cents, and both arrays are emitted as comma-joined strings (raw array
    columns crash the driver's pandas canonicalizer)."""
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v_c")
    )
    pairs = F.array_sort(F.collect_list(F.struct("event_type", "v_c")))
    return per.groupBy("user_id").agg(
        F.array_join(
            F.transform(pairs, lambda s: s["event_type"]), ","
        ).alias("sum_map_keys"),
        F.array_join(
            F.transform(pairs, lambda s: s["v_c"].cast("string")), ","
        ).alias("sum_map_values_c"),
    )


@query(
    "ch_quantiles_exact",
    category="clickhouse",
    oracle="""
    SELECT event_type,
           array_to_string(
             list_transform(quantile_cont(value, [0.25, 0.5, 0.75, 0.9]),
                            x -> CAST(ROUND(ROUND(x, 4) * 10000) AS BIGINT)),
             ',') AS quantiles_e4
    FROM events GROUP BY event_type
    """,
)
def ch_quantiles_exact(spark, sf_dir):
    """ClickHouse ``quantilesExact(0.25,...)(x)`` parity: the plural
    combinator returns ALL requested quantiles as one array from a single
    per-group sort — Spark's percentile() accepts an array of percentages
    and does the same (one sort, n interpolated picks), matching DuckDB's
    quantile_cont(list) element-for-element. Emitted as a comma-joined
    string of 1e-4-unit integers: the 4-dp round happens once per element
    (same granularity both engines), and the second ROUND only snaps the
    ulp-level *10000 product onto its integer — never a .5 boundary."""
    ev = table(spark, sf_dir, "events")
    qs = F.percentile(
        "value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.9))
    )
    return ev.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                qs,
                lambda x: F.round(F.round(x, 4) * 10000)
                .cast("long")
                .cast("string"),
            ),
            ",",
        ).alias("quantiles_e4")
    )


@query(
    "ch_arg_min_max",
    category="clickhouse",
    oracle="""
    WITH ranked AS (
      SELECT event_type, user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type,
           MIN(CASE WHEN rn = 1 THEN user_id END) AS first_user,
           MIN(CASE WHEN rn_d = 1 THEN user_id END) AS last_user,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM ranked GROUP BY event_type
    """,
)
def ch_arg_min_max(spark, sf_dir):
    """ClickHouse ``argMin(x, t)`` / ``argMax(x, t)`` parity: who produced
    the earliest/latest event per type. Spark's min_by/max_by ARE argMin/
    argMax; the ordering key is a (ts, event_id) struct so ties are broken
    deterministically (struct comparison is lexicographic). One partial+
    final aggregation, no window, no sort — the oracle needs ROW_NUMBER
    only because ANSI SQL lacks a tie-broken arg-min aggregate."""
    ev = table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return ev.groupBy("event_type").agg(
        F.min_by("user_id", key).alias("first_user"),
        F.max_by("user_id", key).alias("last_user"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "ch_moving_sum_array",
    category="clickhouse",
    oracle=f"""
    WITH m AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms_c
      FROM events
    )
    SELECT user_id,
           array_to_string(list(ms_c ORDER BY ts, event_id), ',')
             AS moving_sums_c
    FROM m GROUP BY user_id
    """,
)
def ch_moving_sum_array(spark, sf_dir):
    """ClickHouse ``groupArrayMovingSum(3)(v)`` parity: per user, the
    time-ordered array of trailing-3-row sums. The window and the final
    collect share the user_id partitioning, so Catalyst plans ONE exchange
    feeding both; array order is pinned by array_sort over (ts, event_id,
    value) structs rather than trusting collect_list's arrival order."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    ms = F.sum(F.round(F.col("value") * 100).cast("long")).over(w)
    with_ms = ev.select("user_id", "ts", "event_id", ms.alias("ms_c"))
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "ms_c")))
    # serialized as a comma-joined string of exact cent integers — a raw
    # array column crashes the driver's pandas canonicalizer and double
    # rendering differs across engines
    return with_ms.groupBy("user_id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["ms_c"].cast("string")), ","
        ).alias("moving_sums_c")
    )


@query(
    "ch_sequence_count",
    category="clickhouse",
    oracle="""
    WITH f AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    c AS (
      SELECT user_id, COUNT(*) AS n
      FROM f WHERE event_type = 'purchase' AND prev = 'view'
      GROUP BY user_id
    )
    SELECT u.user_id, COALESCE(c.n, 0) AS seq_count
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN c ON u.user_id = c.user_id
    """,
)
def ch_sequence_count(spark, sf_dir):
    """ClickHouse ``sequenceCount('(?1).*(?2)')(ts, A, B)`` parity: how many
    NON-OVERLAPPING view->purchase chains each user produced. Greedy
    non-overlapping matching reduces to a run-length argument: each match
    completes exactly at a 'purchase' whose predecessor in the A/B-filtered
    event sequence is a 'view' — so one lag() over the filtered stream
    counts matches with no stateful scan. Users with zero matches are kept
    via left join against the distinct-user set (CH reports 0, not
    absence). Shuffles once on user_id."""
    ev = table(spark, sf_dir, "events")
    f = ev.filter(F.col("event_type").isin("view", "purchase"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    matches = (
        f.withColumn("prev", F.lag("event_type").over(w))
        .filter((F.col("event_type") == "purchase") & (F.col("prev") == "view"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    users = ev.select("user_id").distinct()
    return users.join(matches, "user_id", "left").select(
        "user_id", F.coalesce(F.col("n"), F.lit(0)).alias("seq_count")
    )


@query(
    "ch_group_concat",
    category="clickhouse",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
    FROM events GROUP BY user_id
    """,
)
def ch_group_concat(spark, sf_dir):
    """groupConcat / string_agg parity (ClickHouse groupUniqArray +
    arrayStringConcat): the distinct event types per user as one sorted
    CSV string. collect_set -> array_sort -> concat_ws pins the element
    order BEFORE concatenation — a raw string_agg's order is
    engine-arbitrary, which is exactly the nondeterminism the suite's
    conventions exist to remove."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types_csv")
    )


@query(
    "ch_window_funnel_strict_order",
    category="clickhouse",
    oracle="""
    WITH f AS (
      SELECT user_id,
             CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
                             ELSE 2 END AS code,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    p AS (
      SELECT user_id, MIN(rn) AS p FROM f WHERE code = 0 GROUP BY user_id
    ),
    lv AS (
      SELECT p.user_id,
             CASE WHEN c1.code = 1 AND c2.code = 2 THEN 3
                  WHEN c1.code = 1 THEN 2
                  ELSE 1 END AS funnel_level
      FROM p
      LEFT JOIN f c1 ON c1.user_id = p.user_id AND c1.rn = p.p + 1
      LEFT JOIN f c2 ON c2.user_id = p.user_id AND c2.rn = p.p + 2
    ),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT COALESCE(lv.funnel_level, 0) AS funnel_level,
           COUNT(*) AS n_users
    FROM u LEFT JOIN lv USING (user_id)
    GROUP BY 1
    """,
)
def ch_window_funnel_strict_order(spark, sf_dir):
    """ClickHouse ``windowFunnel(... 'strict_order')`` parity (defined
    variant, no time bound): walking the user's view/click/purchase
    events in time order, the level advances only while each event is
    exactly the next expected step and FREEZES at the first out-of-order
    funnel event — CH's strict_order. Implemented as a pure integer fold
    (aggregate) over the sorted per-user code array: state = level,
    negated to freeze; abs() at the end. One grouped collect per user,
    the fold is a codegen'd lambda.

    ORACLE NOTE: the oracle uses the fold's CLOSED FORM — with the
    -0 == 0 convention the state only leaves 0 at the first code-0
    event and afterwards freezes at the first non-consecutive step, so
    level = f(position of first 0, the two codes after it) — because
    DuckDB v1.0.0's list_reduce MISFOLDS inside a large grouped query:
    at sf1.0 (1 M events / 30 k groups) it returned 2 for a list whose
    literal re-fold (same lambda, same list) returns 1. Caught by the
    sf1.0 sweep; the relational form is engine-bug-free and identical
    on all fixtures. Equivalence of fold and closed form: a=0 absorbs
    non-zero codes (−0 == 0); after the first 0, a ≥ 1 and each
    subsequent event either equals a (advance) or permanently freezes,
    so the level is 1 + [next == 1] (+ [next-next == 2] if so), capped
    at 3 since codes ≤ 2 can never equal a state of 3."""
    ev = table(spark, sf_dir, "events")
    f = ev.filter(F.col("event_type").isin("view", "click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", 0)
        .when(F.col("event_type") == "click", 1)
        .otherwise(2)
        .alias("code"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "code")))
    codes = F.transform(ordered, lambda s: s["code"])
    step = lambda a, x: (  # noqa: E731
        F.when(a < 0, a).when(x == a, a + 1).otherwise(-a)
    )
    folded = f.groupBy("user_id").agg(
        F.abs(F.aggregate(codes, F.lit(0), step)).alias("funnel_level")
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(folded, "user_id", "left")
        .groupBy(F.coalesce(F.col("funnel_level"), F.lit(0)).alias("funnel_level"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "ch_delta_sum",
    category="funnels",
    oracle=f"""
    WITH d AS (
      SELECT user_id,
             value - LAG(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS d
      FROM events
    )
    SELECT user_id,
           ROUND({sql_dsum('CASE WHEN d > 0 THEN d ELSE 0 END')}, 4) AS delta_sum
    FROM d GROUP BY user_id
    """,
)
def ch_delta_sum(spark, sf_dir):
    """ClickHouse ``deltaSum``: sum of the POSITIVE deltas of a
    time-ordered series per key — total energy produced from a kwh counter
    that occasionally resets (reference columns tables.sql:27-30). One
    shuffle on user_id shared by the lag window and the final aggregate;
    deltas accumulate in DECIMAL so the result is partition-order-free."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id", (F.col("value") - F.lag("value").over(w)).alias("d")
    )
    return d.groupBy("user_id").agg(
        r4(dsum(F.when(F.col("d") > 0, F.col("d")).otherwise(F.lit(0.0)))).alias(
            "delta_sum"
        )
    )


@query(
    "ch_topk_weighted",
    category="funnels",
    oracle=f"""
    WITH s AS (
      SELECT event_type, user_id,
             {sql_dsum('value')} AS w
      FROM events GROUP BY event_type, user_id
    ),
    rk AS (
      SELECT event_type, user_id, w,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY w DESC, user_id) AS rk
      FROM s
    )
    SELECT event_type, rk, user_id, ROUND(w, 4) AS weight
    FROM rk WHERE rk <= 3
    """,
)
def ch_topk_weighted(spark, sf_dir):
    """ClickHouse ``topKWeighted(3)(user_id, value)``: heaviest keys by
    summed weight, not occurrence count. Exact two-stage plan: partial
    decimal-sum per (type, user) group, then a per-type row_number —
    Catalyst turns the rank filter into WindowGroupLimit so only 3 rows
    per type survive the final exchange (no global sort at 100 TB)."""
    ev = table(spark, sf_dir, "events")
    s = ev.groupBy("event_type", "user_id").agg(dsum("value").alias("w"))
    win = W.partitionBy("event_type").orderBy(F.col("w").desc(), F.col("user_id"))
    return (
        s.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= 3)
        .select("event_type", "rk", "user_id", r4(F.col("w")).alias("weight"))
    )


@query(
    "ch_uniq_up_to",
    category="funnels",
    oracle="""
    SELECT event_type,
           LEAST(COUNT(DISTINCT user_id), 11) AS uniq_up_to_10,
           COUNT(DISTINCT user_id) <= 10 AS is_exact
    FROM events GROUP BY event_type
    """,
)
def ch_uniq_up_to(spark, sf_dir):
    """ClickHouse ``uniqUpTo(10)``: exact distinct count while it's ≤ N,
    saturating at N+1 — the "is this column low-cardinality?" probe used
    before choosing a dictionary encoding. In Spark the saturation cannot
    stop the exact count early, but the same contract (exact below the
    cap, sentinel above) is LEAST over count_distinct; at scale the cap
    would ride on approx_count_distinct instead."""
    ev = table(spark, sf_dir, "events")
    u = F.count_distinct(F.col("user_id"))
    return ev.groupBy("event_type").agg(
        F.least(u, F.lit(11)).alias("uniq_up_to_10"),
        (u <= 10).alias("is_exact"),
    )


@query(
    "ch_entropy",
    category="funnels",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    t AS (
      SELECT user_id, event_type, n, SUM(n) OVER (PARTITION BY user_id) AS tot
      FROM c
    )
    SELECT user_id,
           ROUND(-SUM((CAST(n AS DOUBLE) / tot) * log2(CAST(n AS DOUBLE) / tot)), 4)
             AS entropy
    FROM t GROUP BY user_id
    """,
)
def ch_entropy(spark, sf_dir):
    """ClickHouse ``entropy()``: Shannon entropy (bits) of each user's
    event-type distribution — the behavioral-diversity score. Counts are
    exact integers, so p is the same rational on both engines; the ≤6-term
    log2 sum is safely inside the 4-dp rounding. Two aggregations over the
    SAME user_id partitioning (the window reuses the groupBy exchange)."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.withColumn("tot", F.sum("n").over(W.partitionBy("user_id")))
    p = F.col("n").cast("double") / F.col("tot")
    return t.groupBy("user_id").agg(r4(-F.sum(p * F.log2(p))).alias("entropy"))


@query(
    "ch_max_intersections",
    category="funnels",
    oracle="""
    WITH b AS (
      SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + 1800000000, -1 FROM events
    ),
    r AS (
      SELECT event_type,
             SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS conc
      FROM b
    )
    SELECT event_type, CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM r GROUP BY event_type
    """,
)
def ch_max_intersections(spark, sf_dir):
    """ClickHouse ``maxIntersections``: peak number of concurrent
    half-open intervals (each event held open 30 min) — peak simultaneous
    sessions per type. Classic sweep line as pure relational algebra:
    ±1 boundary rows, one running sum ordered by (t, delta) so closings
    at t precede openings at t (half-open semantics). Within a tie group
    the running sum moves monotonically, so MAX is order-independent even
    though rows within equal (t, delta) are unordered. One union + one
    shuffle on event_type; time compared in integer microseconds."""
    ev = table(spark, sf_dir, "events")
    t = F.unix_micros("ts")
    starts = ev.select("event_type", t.alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        "event_type", (t + 1800000000).alias("t"), F.lit(-1).alias("delta")
    )
    b = starts.unionAll(ends)
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = b.select("event_type", F.sum("delta").over(w).alias("conc"))
    return r.groupBy("event_type").agg(F.max("conc").alias("max_concurrent"))


@query(
    "ch_sequence_next_node",
    category="funnels",
    oracle="""
    WITH nxt AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    c AS (
      SELECT cur, nxt, COUNT(*) AS n FROM nxt
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    r AS (
      SELECT cur, nxt, n,
             ROW_NUMBER() OVER (PARTITION BY cur ORDER BY n DESC, nxt) AS rk
      FROM c
    )
    SELECT cur AS event_type, nxt AS next_type, n AS n_transitions
    FROM r WHERE rk = 1
    """,
)
def ch_sequence_next_node(spark, sf_dir):
    """ClickHouse ``sequenceNextNode``: the most common event immediately
    following each event type across all user timelines — the Markov
    next-step of the behavioral graph. lead() over (user, time), exact
    transition counts, deterministic mode via row_number tie-broken on the
    successor name. The lead window and nothing else touches the raw
    table; the transition matrix is |types|² rows regardless of scale."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    c = nxt.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    rk = W.partitionBy("cur").orderBy(F.col("n").desc(), F.col("nxt"))
    return (
        c.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            F.col("cur").alias("event_type"),
            F.col("nxt").alias("next_type"),
            F.col("n").alias("n_transitions"),
        )
    )


@query(
    "ch_funnel_time_to_convert",
    category="funnels",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT user_id, t_buy - t_view AS dt_us
      FROM firsts
      WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_view
    ),
    rk AS (
      SELECT user_id, dt_us,
             ROW_NUMBER() OVER (ORDER BY dt_us, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM conv
    )
    SELECT COUNT(*) AS n_converted,
           MIN(dt_us) AS min_us,
           MAX(dt_us) AS max_us,
           MIN(CASE WHEN 2 * rn >= n + 1 THEN dt_us END) AS median_us
    FROM rk
    """,
)
def ch_funnel_time_to_convert(spark, sf_dir):
    """Time-to-convert (ClickHouse funnel follow-up: how long from first
    'view' to first 'purchase'): conditional-min firsts per user, the gap
    in integer MICROSECONDS (truncating second casts diverge at the
    boundary between engines), and a lower-median via rank — the
    conversion-latency KPI next to every windowFunnel dashboard. One
    aggregation + one global rank over the (tiny) converted-user set."""
    ev = table(spark, sf_dir, "events")
    tu = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", tu)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", tu)).alias("t_buy"),
    )
    conv = firsts.where(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select("user_id", (F.col("t_buy") - F.col("t_view")).alias("dt_us"))
    w = W.orderBy("dt_us", "user_id")
    rk = conv.select(
        "dt_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    return rk.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("dt_us").alias("min_us"),
        F.max("dt_us").alias("max_us"),
        F.min(F.when(2 * F.col("rn") >= F.col("n") + 1, F.col("dt_us"))).alias(
            "median_us"
        ),
    )


@query(
    "ch_bounding_ratio",
    category="funnels",
    oracle="""
    WITH span AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
             epoch_us(ts) AS tu,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    ),
    g AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN rn_d = 1 THEN vc END)
              - MIN(CASE WHEN rn_a = 1 THEN vc END) AS HUGEINT) * 3600000000 AS num,
             CAST(MAX(tu) - MIN(tu) AS HUGEINT) * 100 AS den
      FROM span GROUP BY user_id
    )
    -- slope to 4 dp via exact integer half-away division over cent-
    -- quantized values and integer-µs spans: a float ROUND lands exactly
    -- on .00005 at sf0.1 where engine rounding modes disagree.
    -- HUGEINT numerator: 2*diff*3.6e9*1e4 wraps int64 once |diff| >
    -- ~128k cents; the Spark twin widens to DECIMAL(38,0).
    SELECT user_id,
           CASE WHEN den = 0 THEN NULL
                WHEN num < 0
                THEN -CAST((2 * (-num) * 10000 + den) // (2 * den) AS BIGINT) / 10000.0 + 0.0
                ELSE CAST((2 * num * 10000 + den) // (2 * den) AS BIGINT) / 10000.0 + 0.0 END
             AS slope_per_hour
    FROM g
    """,
)
def ch_bounding_ratio(spark, sf_dir):
    """ClickHouse ``boundingRatio``: (last value − first value) / elapsed
    time — the cheapest possible trend estimate, used as the sanity check
    next to the OLS slope (ts_degradation_trend). First/last are min_by/
    max_by over a (ts, event_id) struct key — ONE partial+final hash
    aggregation, no window on the Spark side (the oracle needs
    ROW_NUMBER only because ANSI arg-min has no tie-break); elapsed time
    in integer microseconds, converted to hours only at the final
    division."""
    ev = table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    tu = F.unix_micros("ts")
    vc = F.floor(F.col("value") * 100 + 0.5).alias("vc")
    s = ev.select("user_id", "ts", "event_id", vc).groupBy("user_id").agg(
        F.min_by("vc", key).alias("first_c"),
        F.max_by("vc", key).alias("last_c"),
        F.min(tu).alias("t0"),
        F.max(tu).alias("t1"),
    )
    # slope to 4 dp via exact integer half-away division over cent-
    # quantized values and integer-µs spans (see oracle comment).
    # DECIMAL(38,0) numerator: the int64 product 2*diff*3.6e9*1e4 wraps
    # silently (non-ANSI) once |diff| > ~128k cents while DuckDB errors —
    # widen before multiplying, exactly like the ts_spectral sums.
    return s.select(
        "user_id",
        F.expr(
            "CASE WHEN t1 = t0 THEN NULL"
            " WHEN last_c < first_c"
            " THEN -CAST((2 * CAST(first_c - last_c AS DECIMAL(38,0)) * 3600000000 * 10000"
            "         + CAST(t1 - t0 AS DECIMAL(38,0)) * 100)"
            "       DIV (2 * CAST(t1 - t0 AS DECIMAL(38,0)) * 100) AS BIGINT) / 10000.0D + 0.0D"
            " ELSE CAST((2 * CAST(last_c - first_c AS DECIMAL(38,0)) * 3600000000 * 10000"
            "        + CAST(t1 - t0 AS DECIMAL(38,0)) * 100)"
            "      DIV (2 * CAST(t1 - t0 AS DECIMAL(38,0)) * 100) AS BIGINT) / 10000.0D + 0.0D END"
        ).alias("slope_per_hour"),
    )


@query(
    "ch_interval_length_sum",
    category="funnels",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                    -9223372036854775807)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island_id, MAX(e) - MIN(s) AS len_us
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(len_us) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def ch_interval_length_sum(spark, sf_dir):
    """ClickHouse ``intervalLengthSum``: total time covered by the UNION
    of per-key intervals (each event held open 30 min), overlaps merged —
    actual uptime from heartbeats, where naive SUM(duration)
    double-counts overlap. Sweep: an interval starts a new island iff its
    start exceeds the running max end of ALL prior intervals (not just
    the previous row — an earlier long interval can swallow later ones);
    island count via prefix sum, length via per-island (max e − min s).
    One user_id shuffle shared by both windows and the final aggregates;
    all arithmetic integer microseconds."""
    ev = table(spark, sf_dir, "events")
    tu = F.unix_micros("ts")
    iv = ev.select(
        "user_id", "event_id", tu.alias("s"), (tu + 1800000000).alias("e")
    )
    wprev = (
        W.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.coalesce(F.max("e").over(wprev), F.lit(-9223372036854775807)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    wrun = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(wrun).alias("island_id")
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("len_us").alias("covered_us"),
    )


@query(
    "ch_group_concat_distinct",
    category="funnels",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
    FROM events GROUP BY user_id
    """,
)
def ch_group_concat_distinct(spark, sf_dir):
    """groupUniqArray / string_agg(DISTINCT … ORDER BY): each user's
    distinct event vocabulary as one deterministic CSV — the profile
    column a segmentation export writes. Spark spells it
    collect_set → array_sort → array_join (collect_set dedupes map-side,
    so the shuffle carries ≤|types| values per user)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "types_csv"
        )
    )


@query(
    "ch_group_array_ordered",
    category="funnels",
    oracle="""
    SELECT user_id,
           array_to_string(list(event_type ORDER BY ts, event_id), ',')
             AS journey,
           len(list(event_type ORDER BY ts, event_id)) AS n_steps
    FROM events
    WHERE event_type IN ('signup', 'purchase')
    GROUP BY user_id
    """,
)
def ch_group_array_ordered(spark, sf_dir):
    """ClickHouse ``groupArray`` with guaranteed TIME order (ANSI
    array_agg … ORDER BY): each user's signup/purchase journey as an
    ordered array — the input every sequence-mining/funnel model
    consumes. Spark's collect_list has no ORDER BY clause and makes no
    ordering promise, so the portable spelling collects (ts, event_id,
    value) structs and sorts the ARRAY after collection — deterministic
    regardless of partial-aggregation order; the sort key is then
    projected away with transform()."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "purchase")
    )
    packed = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    journey = F.transform(packed, lambda s: s["event_type"])
    g = ev.groupBy("user_id").agg(journey.alias("j"))
    # comma-joined string: a raw array column crashes the driver's
    # pandas canonicalizer (unhashable list)
    return g.select(
        "user_id",
        F.array_join("j", ",").alias("journey"),
        F.size("j").alias("n_steps"),
    )


@query(
    "ch_min_max_avg_map",
    category="clickhouse",
    oracle=f"""
    WITH per AS (
      SELECT user_id, event_type,
             -- value is exactly 2-dp, so cents are exact BIGINTs and the
             -- half-up 4-dp mean is (2*s100*100 + c) // (2*c) in 1e-4 units
             MIN(CAST(ROUND(value * 100) AS BIGINT)) AS vmin_c,
             MAX(CAST(ROUND(value * 100) AS BIGINT)) AS vmax_c,
             CAST((2 * SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100
                   + COUNT(value)) // (2 * COUNT(value)) AS BIGINT) AS vavg_e4
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           array_to_string(list(event_type ORDER BY event_type), ',')
             AS map_keys,
           array_to_string(list(vmin_c ORDER BY event_type), ',')
             AS min_values_c,
           array_to_string(list(vmax_c ORDER BY event_type), ',')
             AS max_values_c,
           array_to_string(list(vavg_e4 ORDER BY event_type), ',')
             AS avg_values_e4
    FROM per GROUP BY user_id
    """,
)
def ch_min_max_avg_map(spark, sf_dir):
    """ClickHouse ``minMap/maxMap/avgMap(k, v)`` parity alongside the
    existing sumMap: per user, key-sorted parallel arrays of per-key min,
    max, and mean — CH's Map combinators all share this keys+values
    tuple-of-arrays shape. Same two-level plan as sumMap: partial
    aggregates per (user, key) shuffle once on the composite key, and the
    per-user array assembly rides the same hash distribution (no second
    shuffle). All values are exact integers (cents for min/max, 1e-4
    units for the half-up mean) and every array is emitted as a
    comma-joined string — raw array columns crash the driver's pandas
    canonicalizer, and integer rendering is engine-identical."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    per = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.min(cents).alias("vmin_c"),
            F.max(cents).alias("vmax_c"),
            F.sum(cents).alias("s100"),
            F.count("value").alias("c"),
        )
        .withColumn(
            # exact half-up 4-dp mean from integer moments — double ROUND
            # half-up/half-even divergence at .xxxx5 boundaries can't occur
            "vavg_e4",
            F.expr("(2 * s100 * 100 + c) DIV (2 * c)"),
        )
        .drop("s100", "c")
    )
    pairs = F.array_sort(
        F.collect_list(F.struct("event_type", "vmin_c", "vmax_c", "vavg_e4"))
    )

    def joined(field):
        return F.array_join(
            F.transform(pairs, lambda s: s[field].cast("string")), ","
        )

    return per.groupBy("user_id").agg(
        joined("event_type").alias("map_keys"),
        joined("vmin_c").alias("min_values_c"),
        joined("vmax_c").alias("max_values_c"),
        joined("vavg_e4").alias("avg_values_e4"),
    )


@query(
    "ch_theils_u",
    category="funnels",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS x,
             CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS y
      FROM events
    ),
    cxy AS (SELECT x, y, COUNT(*) AS nxy FROM pairs GROUP BY x, y),
    tot AS (
      SELECT x, y, nxy,
             SUM(nxy) OVER () AS n,
             SUM(nxy) OVER (PARTITION BY x) AS nx,
             SUM(nxy) OVER (PARTITION BY y) AS ny
      FROM cxy
    )
    SELECT
      ROUND(
        SUM((CAST(nxy AS DOUBLE) / n)
            * log2(CAST(nxy AS DOUBLE) * n / (CAST(nx AS DOUBLE) * ny)))
        / (-SUM((CAST(nxy AS DOUBLE) / n) * log2(CAST(nx AS DOUBLE) / n))),
        4) AS theils_u
    FROM tot
    """,
)
def ch_theils_u(spark, sf_dir):
    """ClickHouse ``theilsU(x, y)``: the uncertainty coefficient
    U(X|Y) = I(X;Y)/H(X) — how much knowing the props bucket reduces
    uncertainty about the event type (asymmetric, unlike Cramér's V which
    this complements). H(X) = -Σ_x p(x) log2 p(x) is reconstructed by
    summing p(x,y) log2 p(x) over every (x,y) cell, which telescopes to
    the same value because Σ_y p(x,y) = p(x) — so numerator and
    denominator are one aggregation over the same contingency rows.
    Counts are exact integers so every log argument is the same rational
    on both engines; the ≤24-term sum sits far inside the 4-dp round.
    Two hash aggregations and two windows over the small contingency
    table."""
    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        F.col("event_type").alias("x"),
        (F.get_json_object("props", "$.k").cast("long") % 4).alias("y"),
    )
    cxy = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("nxy"))
    tot = cxy.select(
        "x", "y", "nxy",
        F.sum("nxy").over(W.partitionBy()).alias("n"),
        F.sum("nxy").over(W.partitionBy("x")).alias("nx"),
        F.sum("nxy").over(W.partitionBy("y")).alias("ny"),
    )
    pxy = F.col("nxy").cast("double") / F.col("n")
    mi = F.sum(
        pxy
        * F.log2(
            F.col("nxy").cast("double")
            * F.col("n")
            / (F.col("nx").cast("double") * F.col("ny"))
        )
    )
    # H(X) = -Σ_xy p(x,y) log2 p(x)  (telescopes over y)
    hx = -F.sum(pxy * F.log2(F.col("nx").cast("double") / F.col("n")))
    return tot.agg(F.round(mi / hx, 4).alias("theils_u"))


@query(
    "ch_sparkbar",
    category="funnels",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS h, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT event_type, MAX(cnt) AS maxc FROM c GROUP BY 1),
    grid AS (
      SELECT mx.event_type, mx.maxc, gs.h
      FROM mx, LATERAL (SELECT UNNEST(generate_series(0, 23)) AS h) gs
    )
    SELECT g.event_type,
           string_agg(
             CASE WHEN c.cnt IS NULL THEN '_'
                  ELSE substr('▁▂▃▄▅▆▇█',
                              CAST((c.cnt * 8 + g.maxc - 1) // g.maxc AS INT), 1)
             END, '' ORDER BY g.h) AS bar
    FROM grid g
    LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
    GROUP BY g.event_type
    """,
)
def ch_sparkbar(spark, sf_dir):
    """ClickHouse ``sparkbar(24)(hour, count)``: the inline unicode
    histogram CH renders in dashboards — one 24-char bar per event type,
    hour-of-day on the x axis, per-hour count mapped to the 8 block
    glyphs by exact ceiling division against the row's max bucket (so the
    tallest bucket is always a full block and any non-empty bucket is at
    least ▁; empty hours render '_'). All bucket math is integer, so both
    engines pick identical glyphs. One small hash aggregate, then the bar
    assembles from a per-group hour→count map via transform over
    sequence(0,23) — no second shuffle, no UDF."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", F.hour("ts").cast("int").alias("h")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per = c.groupBy("event_type").agg(
        F.map_from_entries(F.collect_list(F.struct("h", "cnt"))).alias("m"),
        F.max("cnt").alias("maxc"),
    )
    return per.select(
        "event_type",
        F.expr(
            "concat_ws('', transform(sequence(0, 23), h -> "
            "CASE WHEN try_element_at(m, h) IS NULL THEN '_' "
            "ELSE substring('▁▂▃▄▅▆▇█', "
            "CAST((try_element_at(m, h) * 8 + maxc - 1) DIV maxc AS INT), 1) "
            "END))"
        ).alias("bar"),
    )


@query(
    "ch_group_array_last_k",
    category="funnels",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    )
    SELECT user_id,
           array_to_string(list(event_type ORDER BY ts, event_id), ',')
             AS last5_types,
           array_to_string(list(event_id ORDER BY ts, event_id), ',')
             AS last5_ids
    FROM r WHERE rk <= 5
    GROUP BY user_id
    """,
)
def ch_group_array_last_k(spark, sf_dir):
    """ClickHouse ``groupArrayLast(5)(x)`` parity with pinned time order:
    each user's 5 most recent events, emitted oldest→newest — the
    'recent activity' strip every behavioral dashboard renders. The
    row_number cut runs DESC so Spark plans it as WindowGroupLimit
    (per-partition top-5 heaps before the window sort — no full
    per-user sort materialization), then the kept quintuple re-sorts
    ascending inside array_sort on a (ts, event_id, type) struct —
    tie-broken, deterministic, one user_id exchange end to end."""
    ev = table(spark, sf_dir, "events")
    wd = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    kept = (
        ev.withColumn("rk", F.row_number().over(wd))
        .where(F.col("rk") <= 5)
    )
    pairs = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    # comma-joined strings: raw array columns crash the driver's
    # pandas canonicalizer
    return kept.groupBy("user_id").agg(
        F.array_join(
            F.transform(pairs, lambda s: s["event_type"]), ","
        ).alias("last5_types"),
        F.array_join(
            F.transform(pairs, lambda s: s["event_id"].cast("string")), ","
        ).alias("last5_ids"),
    )


@query(
    "ch_array_cumsum_diff",
    category="clickhouse",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    m AS (
      SELECT user_id, ts, event_id,
             SUM(v_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cs_c,
             COALESCE(v_c - LAG(v_c) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                      v_c) AS df_c
      FROM e
    )
    SELECT user_id,
           array_to_string(list(cs_c ORDER BY ts, event_id), ',')
             AS cum_sums_c,
           array_to_string(list(df_c ORDER BY ts, event_id), ',')
             AS diffs_c
    FROM m GROUP BY user_id
    """,
)
def ch_array_cumsum_diff(spark, sf_dir):
    """ClickHouse ``arrayCumSum`` + ``arrayDifference`` parity over each
    user's time-ordered value array (the per-device cumulative-energy and
    step-change views of the reference's kwh counters, tables.sql:5-32).
    Values accumulate as exact integer cents so both the running sums and
    the adjacent differences are exact regardless of length; array order
    is pinned by array_sort over (ts, event_id, …) structs and the arrays
    are emitted as comma-joined strings (raw array columns crash the
    driver's pandas canonicalizer). Both engines run the identical linear
    plan: one running-sum window + lag, then one per-user collect —
    window and groupBy share the user_id exchange."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    e = ev.select("user_id", "ts", "event_id", cents.alias("v_c"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    lagv = F.lag("v_c").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    rows = e.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("v_c").over(w).alias("cs_c"),
        F.coalesce(F.col("v_c") - lagv, F.col("v_c")).alias("df_c"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "cs_c", "df_c"))
    )
    return rows.groupBy("user_id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["cs_c"].cast("string")), ","
        ).alias("cum_sums_c"),
        F.array_join(
            F.transform(ordered, lambda s: s["df_c"].cast("string")), ","
        ).alias("diffs_c"),
    )


@query(
    "ch_array_enumerate_compact",
    category="clickhouse",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS occ,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT user_id,
           array_to_string(list(occ ORDER BY ts, event_id), ',')
             AS enumerate_uniq,
           -- COALESCE: DuckDB array_to_string(empty) is NULL, Spark
           -- array_join(empty) is ''
           COALESCE(array_to_string(
             list(event_type ORDER BY ts, event_id)
               FILTER (WHERE prev IS NULL OR event_type <> prev),
             ','), '') AS compacted
    FROM seq GROUP BY user_id
    """,
)
def ch_array_enumerate_compact(spark, sf_dir):
    """ClickHouse ``arrayEnumerateUniq`` + ``arrayCompact`` parity over
    each user's time-ordered event-type sequence: the first array gives
    each element's occurrence index among equal values (1st click, 2nd
    click, …) — the per-user repeat counter behind frequency capping;
    the second collapses consecutive duplicates — the state-transition
    view of a status stream (the reference's inverter state column
    compacts the same way). Both derive from plain windows over ONE
    user_id exchange shared with the final collect; array order pinned
    by array_sort over (ts, event_id, …) structs."""
    ev = table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.row_number().over(wu).alias("occ"),
        F.lag("event_type").over(wseq).alias("prev"),
    )
    ordered_occ = F.array_sort(F.collect_list(F.struct("ts", "event_id", "occ")))
    keep = F.col("prev").isNull() | (F.col("event_type") != F.col("prev"))
    ordered_types = F.array_sort(
        F.collect_list(
            F.when(keep, F.struct("ts", "event_id", "event_type")).otherwise(None)
        )
    )
    # comma-joined strings: raw array columns crash the driver's
    # pandas canonicalizer
    return seq.groupBy("user_id").agg(
        F.array_join(
            F.transform(ordered_occ, lambda s: s["occ"].cast("string")), ","
        ).alias("enumerate_uniq"),
        F.array_join(
            F.transform(ordered_types, lambda s: s["event_type"]), ","
        ).alias("compacted"),
    )


@query(
    "ch_top_event_paths",
    category="funnels",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
      FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    ),
    counted AS (
      SELECT path, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rk
      FROM paths GROUP BY path
    )
    SELECT rk AS rank, path, n FROM counted WHERE rk <= 10 ORDER BY rk
    """,
)
def ch_top_event_paths(spark, sf_dir):
    """Top user PATHS — the "what do users actually do" view product
    analytics tools build from event streams (Amplitude/GA path
    exploration; ClickHouse deployments roll it from sequence
    functions): every consecutive 3-event sequence per user becomes a
    path string via two LEADs over the one (user, time) window, counted
    corpus-wide, top-10 with full-path tie-break. Complements the
    funnel family's "did this FIXED sequence happen" with the open
    question "which sequences dominate". One user_id exchange + one
    path count — at 100 TB the path strings dictionary-encode and the
    count is map-side combinable."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    counted = (
        s.select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("n").desc(), F.col("path"))),
        )
        .where(F.col("rank") <= 10)
    )
    return counted.select("rank", "path", "n").orderBy("rank")


@query(
    "ch_cohort_ltv",
    category="funnels",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT f.cohort_week, e.user_id,
             CAST((epoch_us(date_trunc('week', e.ts))
                   - epoch_us(f.cohort_week)) // 604800000000 AS BIGINT) AS age_w,
             CAST(ROUND(e.value * 100) AS BIGINT) AS v
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    ),
    weekly AS (
      SELECT cohort_week, age_w, SUM(v) AS wv
      FROM rev GROUP BY cohort_week, age_w
    ),
    sizes AS (SELECT cohort_week, COUNT(*) AS n_users FROM firsts GROUP BY cohort_week),
    cum AS (
      SELECT w.cohort_week, w.age_w, s.n_users,
             SUM(w.wv) OVER (PARTITION BY w.cohort_week ORDER BY w.age_w) AS cv
      FROM weekly w JOIN sizes s ON s.cohort_week = w.cohort_week
    )
    SELECT strftime(CAST(cohort_week AS DATE), '%Y-%m-%d') AS cohort_week, age_w, n_users,
           CAST((2 * cv * 100 + n_users) // (2 * n_users) AS DOUBLE) / 10000.0
             AS cum_ltv_per_user
    FROM cum ORDER BY cohort_week, age_w
    """,
)
def ch_cohort_ltv(spark, sf_dir):
    """Cohort LTV curves — cumulative value per user by cohort age, the
    revenue-side sibling of ch_cohort_retention (retention asks "did
    they come back", LTV asks "what are they worth by week N", and the
    pair is how growth teams read payback periods): users cohorted by
    first-event week, event value accumulated per (cohort, age-week),
    cumulative window over age, divided per capita. Integer-cent exact
    BIGINT sums all the way; the per-user 4-dp mean emits via integer
    half-away division (positive domain). Two count/sum aggregates +
    one small cumulative window per cohort — mergeable incremental
    state at any scale."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    rev = ev.join(firsts, "user_id").select(
        "cohort_week",
        (
            (
                F.unix_micros(F.date_trunc("week", F.col("ts")))
                - F.unix_micros("cohort_week")
            )
            / F.lit(604800000000)
        )
        .cast("long")
        .alias("age_w"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    weekly = rev.groupBy("cohort_week", "age_w").agg(F.sum("v").alias("wv"))
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    cum = weekly.join(sizes, "cohort_week").select(
        "cohort_week",
        "age_w",
        "n_users",
        F.sum("wv")
        .over(
            W.partitionBy("cohort_week")
            .orderBy("age_w")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cv"),
    )
    return cum.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "age_w",
        "n_users",
        (
            F.expr("(2 * cv * 100 + n_users) div (2 * n_users)").cast("double")
            / 10000.0
        ).alias("cum_ltv_per_user"),
    ).orderBy("cohort_week", "age_w")


@query(
    "ch_event_transition_matrix",
    category="funnels",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type AS efrom,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS eto
      FROM events
    ),
    t AS (
      SELECT efrom, eto, COUNT(*) AS n FROM s
      WHERE eto IS NOT NULL GROUP BY efrom, eto
    ),
    tot AS (SELECT efrom, SUM(n) AS nf FROM t GROUP BY efrom)
    SELECT t.efrom, t.eto, t.n,
           CAST(t.n * 1000000 // tot.nf AS BIGINT) AS p_e6
    FROM t JOIN tot ON tot.efrom = t.efrom
    ORDER BY t.efrom, t.eto
    """,
)
def ch_event_transition_matrix(spark, sf_dir):
    """The full first-order Markov TRANSITION MATRIX over event types —
    the data behind every user-flow Sankey diagram and the
    generalization of ch_sequence_next_node's single next-step mode:
    P(to | from) for all 6×6 type pairs as exact integer-1e6 ratios of
    transition counts over from-totals. One LEAD window per user, one
    count, one from-total join — the matrix is |types|² rows of
    mergeable state regardless of corpus size (the same
    parametric-model-as-small-table shape as doc_naive_bayes_langid's
    grid)."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("efrom"),
        F.lead("event_type").over(w).alias("eto"),
    ).where(F.col("eto").isNotNull())
    t = s.groupBy("efrom", "eto").agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy("efrom").agg(F.sum("n").alias("nf"))
    return (
        t.join(tot, "efrom")
        .select("efrom", "eto", "n", F.expr("n * 1000000 div nf").alias("p_e6"))
        .orderBy("efrom", "eto")
    )


@query(
    "ch_last_touch_attribution",
    category="funnels",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purch AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS rev_c
      FROM events WHERE event_type = 'purchase'
    ),
    attributed AS (
      SELECT p.user_id, p.event_id, p.rev_c, c.ts AS click_ts,
             CASE WHEN c.ts IS NOT NULL
                       AND epoch_us(p.ts) - epoch_us(c.ts) <= 604800000000
                  THEN 1 ELSE 0 END AS attributed
      FROM purch p
      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT attributed,
           COUNT(*) AS n_purchases,
           CAST(SUM(rev_c) AS BIGINT) AS revenue_cents
    FROM attributed GROUP BY attributed ORDER BY attributed
    """,
)
def ch_last_touch_attribution(spark, sf_dir):
    """LAST-TOUCH marketing attribution with a 7-day lookback — the
    canonical ad-analytics join: each purchase credits the latest prior
    click by the same user IF it happened within the attribution
    window; purchases with no qualifying touch fall into the organic
    bucket. Composition of two existing operator disciplines: the
    backward as-of join (union+window, one shuffle — join_asof family)
    picks the latest prior click, and the window cut is integer-µs
    arithmetic (join_asof_tolerance's staleness discipline), then
    revenue rolls up per attribution verdict in exact cents. At 100 TB
    this is the shape ad planners run hourly: one key-shuffle, no
    range explosion, mergeable rollup."""
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("rev_c"),
    )
    j = asof_join(
        purch,
        clicks.withColumnRenamed("ts", "cts").select(
            "user_id", F.col("cts").alias("ts"), "click_id"
        ),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_id"],
    )
    att = j.select(
        "event_id",
        "rev_c",
        F.when(
            F.col("asof_ts").isNotNull()
            & (F.unix_micros("ts") - F.unix_micros("asof_ts") <= 604800000000),
            1,
        )
        .otherwise(0)
        .alias("attributed"),
    )
    return (
        att.groupBy("attributed")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("rev_c").alias("revenue_cents"),
        )
        .orderBy("attributed")
    )


@query(
    "ch_repurchase_latency",
    category="funnels",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             CAST((epoch_us(LEAD(ts) OVER w) - epoch_us(ts)) // 3600000000
                  AS BIGINT) AS gap_h
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (SELECT user_id, gap_h FROM gaps WHERE gap_h IS NOT NULL),
    med AS (
      SELECT user_id, gap_h FROM (
        SELECT user_id, gap_h,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_h) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM g) WHERE rn = (n + 1) // 2
    )
    SELECT user_id, gap_h AS median_repurchase_hours,
           (SELECT COUNT(*) FROM g g2 WHERE g2.user_id = med.user_id) + 1
             AS n_purchases
    FROM med ORDER BY user_id
    """,
)
def ch_repurchase_latency(spark, sf_dir):
    """Repurchase latency — the repeat-behavior metric between the
    funnel family's FIRST-conversion latency (ch_funnel_time_to_convert)
    and cohort LTV: the median whole-hour gap between each user's
    consecutive purchases (median, not mean — one vacation gap
    shouldn't move the reorder-reminder timing this number feeds).
    Consecutive gaps via one LEAD over the per-user purchase stream,
    exact integer hours, the integer lower-median rank pick
    (agg_median_absolute_deviation discipline). One user_id exchange
    end to end."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = p.select(
        "user_id",
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
            / F.lit(3600000000)
        )
        .cast("long")
        .alias("gap_h"),
    ).where(F.col("gap_h").isNotNull())
    wu = W.partitionBy("user_id")
    med = (
        gaps.select(
            "user_id",
            "gap_h",
            F.row_number().over(wu.orderBy("gap_h")).alias("rn"),
            F.count(F.lit(1)).over(wu).alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("user_id", F.col("gap_h").alias("median_repurchase_hours"),
                (F.col("n") + 1).alias("n_purchases"))
    )
    return med.orderBy("user_id")


@query(
    "ch_moving_avg_array",
    category="clickhouse",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s_c,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt
      FROM events
    ),
    r AS (
      SELECT user_id, ts, event_id,
             CASE WHEN s_c < 0
                  THEN -((2 * (-s_c) * 10000 + cnt * 100) // (2 * cnt * 100))
                  ELSE (2 * s_c * 10000 + cnt * 100) // (2 * cnt * 100) END
               AS ma_e4
      FROM m
    )
    SELECT user_id,
           array_to_string(list(ma_e4 ORDER BY ts, event_id), ',')
             AS moving_avgs_e4
    FROM r GROUP BY user_id
    """,
)
def ch_moving_avg_array(spark, sf_dir):
    """ClickHouse ``groupArrayMovingAvg(3)(v)`` parity — the averaging
    sibling of ch_moving_sum_array: per user, the time-ordered array of
    trailing-3-row means (head rows average over 1 and 2 samples, the CH
    semantics). The metric is 2-dp so each window sum is exact cents;
    the mean is rounded to 4 dp by integer half-away division (the
    round-3 discipline — a float ROUND lands on .00005 boundaries at
    scale). Window and collect share one user_id exchange; array order
    is pinned by array_sort over (ts, event_id) structs."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    vc = F.round(F.col("value") * 100).cast("long")
    m = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(vc).over(w).alias("s_c"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    ma = F.expr(
        "CASE WHEN s_c < 0"
        " THEN -((2 * (-s_c) * 10000 + cnt * 100) DIV (2 * cnt * 100))"
        " ELSE (2 * s_c * 10000 + cnt * 100) DIV (2 * cnt * 100) END"
    )
    with_ma = m.select("user_id", "ts", "event_id", ma.alias("ma_e4"))
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "ma_e4")))
    # serialized as a comma-joined string of exact 1e-4-unit integers —
    # a raw array column crashes the driver's pandas canonicalizer
    # (unhashable list) and double rendering differs across engines
    return with_ma.groupBy("user_id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["ma_e4"].cast("string")), ","
        ).alias("moving_avgs_e4")
    )


@query(
    "ch_group_bitmap_ops",
    category="funnels",
    oracle="""
    WITH d AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    card AS (
      SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS and_card
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b, i.and_card,
           ca.n + cb.n - i.and_card AS or_card,
           ca.n + cb.n - 2 * i.and_card AS xor_card
    FROM inter i
    JOIN card ca ON ca.event_type = i.type_a
    JOIN card cb ON cb.event_type = i.type_b
    ORDER BY type_a, type_b
    """,
)
def ch_group_bitmap_ops(spark, sf_dir):
    """ClickHouse ``groupBitmapAnd / groupBitmapOr / groupBitmapXor``:
    set-algebra cardinalities between the per-event-type audience
    bitmaps (which users clicked AND purchased, clicked OR purchased,
    exactly-one-of). ClickHouse holds roaring bitmaps per group and
    intersects the compressed states; the relational re-expression
    never materializes a set: one distinct pass builds the (type, user)
    membership relation, the AND cardinality is a self-equi-join on
    user_id counted per type pair (fan-out per user is bounded by the
    type cardinality, a dictionary-sized constant — never user²), and
    OR/XOR derive by inclusion-exclusion from the per-type counts
    (|A|+|B|−|A∩B|, |A|+|B|−2|A∩B|) — no second pass over the data. At
    100 TB the distinct pass is the only corpus-sized shuffle; the
    membership relation shuffles once on user_id and the pair counts
    combine map-side into a types²-sized result. All-integer, EXACT."""
    ev = table(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct().transform(tracked_persist)
    card = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(F.col("event_type").alias("type_a"), "user_id")
    b = d.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("and_card"))
    )
    return (
        inter.join(
            F.broadcast(card.withColumnRenamed("event_type", "type_a")
                        .withColumnRenamed("n", "na")), "type_a")
        .join(
            F.broadcast(card.withColumnRenamed("event_type", "type_b")
                        .withColumnRenamed("n", "nb")), "type_b")
        .select(
            "type_a", "type_b", "and_card",
            (F.col("na") + F.col("nb") - F.col("and_card")).alias("or_card"),
            (F.col("na") + F.col("nb") - 2 * F.col("and_card")).alias("xor_card"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "ch_quantile_exact_low_high",
    category="funnels",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY floor(value * 100), event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(MAX(CASE WHEN rk = (n - 1) * 5 // 10 + 1 THEN cents END)
             AS BIGINT) AS p50_low,
           CAST(MAX(CASE WHEN rk = (n - 1) * 5 // 10 + 1
                              + CASE WHEN (n - 1) * 5 % 10 = 0 THEN 0 ELSE 1 END
                     THEN cents END) AS BIGINT) AS p50_high,
           CAST(MAX(CASE WHEN rk = (n - 1) * 9 // 10 + 1 THEN cents END)
             AS BIGINT) AS p90_low,
           CAST(MAX(CASE WHEN rk = (n - 1) * 9 // 10 + 1
                              + CASE WHEN (n - 1) * 9 % 10 = 0 THEN 0 ELSE 1 END
                     THEN cents END) AS BIGINT) AS p90_high
    FROM q GROUP BY event_type ORDER BY event_type
    """,
)
def ch_quantile_exact_low_high(spark, sf_dir):
    """ClickHouse ``quantileExactLow`` / ``quantileExactHigh`` parity at
    p50 and p90: the floor- and ceil-rank ELEMENT picks (no
    interpolation — the estimator that returns a value that actually
    occurred, which ch_quantiles_exact's interpolating variant does
    not guarantee). Rank k_low = ⌊(n−1)q⌋+1 and k_high = ⌈(n−1)q⌉+1
    in 1-based (cents, event_id) total order — the ceil is written as
    floor + (remainder≠0) so BOTH engines use pure integer arithmetic
    (no float rank boundary). One exchange on event_type serves the
    rank window, the count window, and the conditional-pick rollup;
    the element picks are MAX(CASE WHEN rk = k) — map-side
    combinable. At 100 TB exact per-group quantiles need the per-group
    sort (this plan); the sketch path is agg_kll_quantiles."""
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
    def pick(mul: int, hi: bool) -> F.Column:
        base = F.expr(f"(n - 1) * {mul} DIV 10 + 1")
        if hi:
            base = base + F.expr(
                f"CASE WHEN (n - 1) * {mul} % 10 = 0 THEN 0 ELSE 1 END"
            )
        return F.max(F.when(F.col("rk") == base, F.col("cents")))
    return (
        r.groupBy("event_type")
        .agg(
            pick(5, False).alias("p50_low"),
            pick(5, True).alias("p50_high"),
            pick(9, False).alias("p90_low"),
            pick(9, True).alias("p90_high"),
        )
        .orderBy("event_type")
    )
