"""Q-WIN: window-function surface (SURVEY.md §2-C Q-WIN-1..6).

Includes the reference schema's counter-delta query (kwh_* monotonic
counters → rate via lag, SURVEY.md §2-B; reference columns
/root/reference/tables.sql:27-30). A window over (key, time) shuffles once
on the key — the same partitioning the reference bakes into its MergeTree
ORDER BY (inverter, time), tables.sql:32.

Running sums accumulate in DECIMAL so cumulative float error can't flip the
4-decimal rounding vs the oracle.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import table
from .registry import dsum, query, r4, sql_dsum

_DEC = T.DecimalType(38, 6)


@query(
    "window_ranking",
    category="window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_ranking(spark, sf_dir):
    """Q-WIN-1: ranking family over a deterministic (date, pk) order."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_counter_delta",
    category="window",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS delta
    FROM events
    """,
)
def window_counter_delta(spark, sf_dir):
    """Q-WIN-2: lag delta — the counter-rate query the reference's kwh_*
    cumulative columns imply (tables.sql:27-30; ClickHouse runningDifference
    / Grafana rate)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        r4(F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "window_running_sum",
    category="window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark, sf_dir):
    """Q-WIN-3: cumulative sum with an explicit ROWS frame."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_moving_avg",
    category="window",
    oracle="""
    SELECT event_id, user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS ma7
    FROM events
    """,
)
def window_moving_avg(spark, sf_dir):
    """Q-WIN-4: 7-row trailing mean (sum/count so the accumulation is exact)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return ev.select(
        "event_id",
        "user_id",
        r4(
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("ma7"),
    )


@query(
    "window_analytic",
    category="window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark, sf_dir):
    """Q-WIN-5: first/last value with explicit frames, percent_rank, cume_dist."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(wfull).alias("last_key"),
        r4(F.percent_rank().over(w)).alias("pct_rank"),
        r4(F.cume_dist().over(w)).alias("cdist"),
    )


@query(
    "window_range_frame",
    category="window",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
             AS n_within_1k
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """Q-WIN-6: RANGE frame on a numeric order key — count of orders priced
    within 1000 below the current row's price."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
    )


@query(
    "window_range_interval",
    category="window",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_10m,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
             AS n_10m
    FROM events
    """,
)
def window_range_interval(spark, sf_dir):
    """Time-range window frame (the Grafana/IoT trailing-window shape):
    per-user sum/count of `value` over the trailing 10 minutes of EVENT
    time — a RANGE frame over epoch MICROseconds (whole seconds would
    silently truncate sub-second timestamps and disagree with the oracle),
    so co-timestamped rows share one frame (unlike the rows-based moving
    average of Q-WIN-4). The decimal accumulator makes the sum
    order-independent; sum_10m is rounded at compare time. One shuffle on
    user_id; the frame is maintained incrementally by Spark's window exec,
    not recomputed per row."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("sum_10m"),
        F.count(F.lit(1)).over(w).alias("n_10m"),
    )


@query(
    "window_lead_lag_offsets",
    category="window",
    oracle="""
    SELECT user_id, ts,
           ROUND(value, 4) AS value,
           ROUND(LAG(value, 3, -1.0) OVER w, 4) AS lag3_dflt,
           ROUND(LEAD(value, 2) OVER w, 4) AS lead2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lead_lag_offsets(spark, sf_dir):
    """lag/lead with multi-row offsets and an explicit default: lag(3)
    with -1.0 fill (ClickHouse neighbor(col, -3, default) parity) and
    lead(2) with the native NULL tail. Same single user_id exchange as
    every other window in the suite."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "ts",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value", 3, -1.0).over(w), 4).alias("lag3_dflt"),
        F.round(F.lead("value", 2).over(w), 4).alias("lead2"),
    )


@query(
    "window_ratio_to_report",
    category="window",
    oracle=f"""
    WITH rev AS (
      SELECT r_name, n_name, ROUND({sql_dsum('l_extendedprice * (1 - l_discount)')}, 4) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, revenue,
           ROUND(revenue / CAST(SUM(CAST(revenue AS DECIMAL(38,6)))
                                OVER (PARTITION BY r_name) AS DOUBLE), 4)
             AS share_of_region
    FROM rev
    """,
)
def window_ratio_to_report(spark, sf_dir):
    """Ratio-to-report: each nation's share of its region's revenue —
    aggregate once, then a partition-total window divides through (the
    OLAP RATIO_TO_REPORT idiom). The window re-sums the already-rounded
    per-nation revenues in DECIMAL so the denominator is order-independent
    — a raw double window-SUM would drift between engines. groupBy and
    window share the r_name-prefixed distribution; the window input is
    only |nations| rows."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(r4(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("r_name")
    denom = F.sum(F.col("revenue").cast("decimal(38,6)")).over(w).cast("double")
    return rev.select(
        "r_name", "n_name", "revenue",
        F.round(F.col("revenue") / denom, 4).alias("share_of_region"),
    )


@query(
    "window_nth_value",
    category="window",
    oracle="""
    SELECT user_id, ts,
           ROUND(nth_value(value, 2) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND CURRENT ROW), 4)
             AS second_seen
    FROM events
    """,
)
def window_nth_value(spark, sf_dir):
    """nth_value with an explicit running frame: each row sees the second
    value its user ever produced (NULL until two exist) — the 'second
    touch' attribution primitive. Frame-sensitive analytic function over
    the standard single user_id exchange."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "ts",
        F.round(F.nth_value("value", 2).over(w), 4).alias("second_seen"),
    )


@query(
    "window_distribution",
    category="window",
    oracle="""
    SELECT event_id, event_type,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_distribution(spark, sf_dir):
    """Distribution window family: percent_rank + cume_dist over a
    deterministic (value, pk) order — the "where does this reading sit in
    its fleet's distribution" query (ClickHouse rank()/count() spelling).
    The tie-break key makes every row its own peer group, so both
    functions are rational numbers identical across engines before the
    4-dp rounding. One shuffle on event_type, both functions share the
    same Window operator."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        r4(F.percent_rank().over(w)).alias("pct_rank"),
        r4(F.cume_dist().over(w)).alias("cume"),
    )


@query(
    "window_cumulative_distinct",
    category="window",
    oracle="""
    WITH f AS (
      SELECT event_type, ts, event_id,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_type, ts, event_id,
           CAST(SUM(first_seen) OVER (
                  PARTITION BY event_type ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_users_so_far
    FROM f
    """,
)
def window_cumulative_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) — which no SQL engine allows directly in a
    window — via the first-occurrence decomposition: flag each (type,
    user)'s first event with row_number()=1, then a plain running SUM of
    flags over (type, time). Exactly the cumulative-uniques curve of a
    growth dashboard. Two windows but ONE shuffle: the second partitions
    on a prefix of the first's key."""
    ev = table(spark, sf_dir, "events")
    wfirst = W.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    f = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.row_number().over(wfirst) == 1, 1).otherwise(0).alias("first_seen"),
    )
    wrun = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return f.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("first_seen").over(wrun).alias("distinct_users_so_far"),
    )


@query(
    "window_pattern_vshape",
    category="window",
    oracle="""
    WITH n AS (
      SELECT user_id, event_id, ts, value,
             LAG(value)  OVER w AS pv,
             LEAD(value) OVER w AS nv
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(CASE WHEN value < pv AND value < nv THEN 1 END) AS n_troughs,
           COUNT(CASE WHEN value > pv AND value > nv THEN 1 END) AS n_peaks,
           MIN(CASE WHEN value < pv AND value < nv THEN event_id END)
             AS first_trough_event
    FROM n GROUP BY user_id
    """,
)
def window_pattern_vshape(spark, sf_dir):
    """Row-pattern recognition (SQL MATCH_RECOGNIZE's DOWN+UP / V-shape,
    which Spark lacks as syntax): strict local minima and maxima of each
    user's series via lag/lead — dip-and-recover detection for telemetry.
    The pattern predicate is a pure projection over one (user, time)
    window; counts + first-match aggregate on the same partitioning, so
    the whole query is one shuffle."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    n = ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("pv"),
        F.lead("value").over(w).alias("nv"),
    )
    trough = (F.col("value") < F.col("pv")) & (F.col("value") < F.col("nv"))
    peak = (F.col("value") > F.col("pv")) & (F.col("value") > F.col("nv"))
    return n.groupBy("user_id").agg(
        F.count(F.when(trough, 1)).alias("n_troughs"),
        F.count(F.when(peak, 1)).alias("n_peaks"),
        F.min(F.when(trough, F.col("event_id"))).alias("first_trough_event"),
    )


@query(
    "window_rolling_median",
    category="window",
    oracle="""
    WITH ar AS (
      SELECT user_id, event_id, ts,
             list_sort(list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS a
      FROM events
    )
    SELECT user_id, event_id, ts,
           a[(len(a) + 1) // 2] AS rolling_median
    FROM ar
    """,
)
def window_rolling_median(spark, sf_dir):
    """Rolling median over a trailing 20-sample frame — the robust
    alternative to the moving average for spiky telemetry (ClickHouse
    ``medianExact`` over a window). No engine allows percentile functions
    as window aggregates, so the portable spelling is collect → sort →
    middle element (lower median: an actual input value, no
    interpolation — which keeps the result EXACT, not a float blend).
    One user_id shuffle; the 20-element sort is O(1) per row."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    ar = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.array_sort(F.collect_list("value").over(w)).alias("a"),
    )
    mid = F.floor((F.size("a") + 1) / 2).cast("int")
    return ar.select(
        "user_id", "event_id", "ts", F.element_at("a", mid).alias("rolling_median")
    )


@query(
    "window_peer_comparison",
    category="window",
    oracle="""
    WITH s AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 1000000) AS BIGINT) AS v_mic,
             CAST(SUM(CAST(value AS DECIMAL(38,6)))
                    OVER (PARTITION BY event_type) * 1000000 AS BIGINT) AS tot_mic,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    d AS (
      SELECT event_id, event_type,
             v_mic * (n - 1) - (tot_mic - v_mic) AS a,
             (n - 1) * 100 AS b
      FROM s WHERE n > 1
    )
    SELECT event_id, event_type,
           (CASE WHEN a >= 0 THEN (2 * a + b) // (2 * b)
                 ELSE -((2 * (-a) + b) // (2 * b)) END) / 10000.0 AS vs_peers
    FROM d
    """,
)
def window_peer_comparison(spark, sf_dir):
    """Peer comparison — ANSI's ``EXCLUDE CURRENT ROW`` frame, which
    Spark's frame spec lacks: each reading vs the mean of the OTHER rows
    in its group, emulated algebraically as value − (total − value)/(n−1) from one
    whole-partition window. Fully integer-exact: value and the decimal
    partition total become micro-units, and the defining division uses
    the half-away-from-zero integer idiom with POSITIVE operands only —
    Spark's `div` truncates while DuckDB's `//` floors, so the sign is
    split out before dividing."""
    ev = table(spark, sf_dir, "events")
    wall = W.partitionBy("event_type")
    s = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1000000).cast("long").alias("v_mic"),
        (F.sum(F.col("value").cast(_DEC)).over(wall) * 1000000)
        .cast("long")
        .alias("tot_mic"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).where(F.col("n") > 1)
    d = s.select(
        "event_id",
        "event_type",
        (
            F.col("v_mic") * (F.col("n") - 1)
            - (F.col("tot_mic") - F.col("v_mic"))
        ).alias("a"),
        ((F.col("n") - 1) * 100).alias("b"),
    )
    m4 = F.when(
        F.col("a") >= 0, F.expr("(2 * a + b) div (2 * b)")
    ).otherwise(-F.expr("(2 * (-a) + b) div (2 * b)"))
    return d.select(
        "event_id",
        "event_type",
        (m4 / 10000.0).alias("vs_peers"),
    )


@query(
    "window_groups_frame",
    category="window",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, date_trunc('hour', ts) AS hr,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    r AS (
      SELECT user_id, event_id, hr, v,
             DENSE_RANK() OVER (PARTITION BY user_id ORDER BY hr) AS g
      FROM s
    )
    SELECT user_id, event_id, hr,
           CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY g
                             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS gsum
    FROM r
    """,
)
def window_groups_frame(spark, sf_dir):
    """ANSI ``GROUPS`` frame mode — which neither Spark nor DuckDB
    implements (Spark: ROWS/RANGE only; DuckDB: parser rejects it): per
    user, the sum of `value` over the current hour's peer group plus the
    entire previous peer group. The emulation is exact, not approximate:
    dense_rank over the order key collapses each peer group to one unit
    step (hour epochs may have gaps, so the rank — not the hour number —
    is the axis), turning GROUPS n PRECEDING into RANGE n PRECEDING over
    the rank; both windows ride the same user_id exchange. Values are
    exact 2-dp integers, and both engines run the SAME two-window
    emulation, pinning its semantics cross-engine."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "event_id",
        F.date_trunc("hour", "ts").alias("hr"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    wrank = W.partitionBy("user_id").orderBy("hr")
    ranked = s.withColumn("g", F.dense_rank().over(wrank))
    wg = W.partitionBy("user_id").orderBy("g").rangeBetween(-1, 0)
    return ranked.select(
        "user_id",
        "event_id",
        "hr",
        (F.sum("v").over(wg).cast("double") / 100.0).alias("gsum"),
    )


@query(
    "window_streak_detection",
    category="windows",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN CAST(floor(value * 100) AS BIGINT)
                       - LAG(CAST(floor(value * 100) AS BIGINT))
                         OVER w > 0 THEN 1 ELSE 0 END AS up
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, up,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - ROW_NUMBER() OVER (PARTITION BY user_id, up
                                    ORDER BY ts, event_id) AS grp
      FROM d
    ),
    runs AS (
      SELECT user_id, COUNT(*) AS len
      FROM g WHERE up = 1 GROUP BY user_id, grp
    )
    SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_up_streak,
           CAST(COUNT(*) AS BIGINT) AS n_up_runs
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
)
def window_streak_detection(spark, sf_dir):
    """Longest rising STREAK per user signal (and the count of rising
    runs) — the gaps-and-islands variant keyed on VALUE DIRECTION
    rather than time gaps (ts_sessionize_islands' sibling; monitoring
    reads it as "how long do ramps last", trading as max consecutive
    up-ticks). The island id is the classic double-row-number
    difference — global position minus within-state position, both
    over the SAME total (ts, event_id) order, so the subtraction is
    constant exactly within a run — and every quantity is an integer
    over cents diffs (ties and drops both break a streak: up is a
    strict > 0 test). One user_id exchange feeds the lag, both
    row-number windows, and the rollups (exchange reuse); output is
    users-sized."""
    ev = table(spark, sf_dir, "events")
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    d = ev.select(
        "user_id", "ts", "event_id",
        F.when(cents - F.lag(cents).over(ow) > 0, 1).otherwise(0).alias("up"),
    )
    g = d.select(
        "user_id", "up",
        (
            F.row_number().over(ow)
            - F.row_number().over(
                W.partitionBy("user_id", "up").orderBy("ts", "event_id")
            )
        ).alias("grp"),
    )
    runs = (
        g.where(F.col("up") == 1)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_up_streak"),
            F.count(F.lit(1)).alias("n_up_runs"),
        )
        .orderBy("user_id")
    )
