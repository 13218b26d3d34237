"""Time-series analytics parity with the ClickHouse surface the reference
delegates to (SURVEY.md §2-B): gap-filled time grids (ClickHouse
``ORDER BY ... WITH FILL`` / Grafana null-as-previous) and resampling.

Scale shape: the grid is |keys| x |buckets| rows generated from a
two-row-per-key bounds aggregate (sequence + explode — no driver loop),
the join back to real buckets is an equi-join on (key, bucket), and the
forward fill is one window per key ordered by bucket. Everything stays in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Window as W
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import table
from .registry import dsum, query, r4, sql_dsum

_DEC = T.DecimalType(38, 6)


def _bind(value, body):
    """Let-binding for Catalyst HOF lambda bodies: evaluate ``value`` ONCE
    per fold step and hand the result to ``body`` as a lambda variable.

    Higher-order-function lambdas are INTERPRETED (no whole-stage codegen,
    no common-subexpression elimination), so naming a Column in a Python
    variable still inlines its whole expression tree at every use site —
    a fold step that references the same derived quantity k times pays k
    full evaluations per element. Routing the value through a one-element
    ``transform`` binds it to a NamedLambdaVariable, evaluated exactly
    once per step (guide §1.2 "per-task work"). The IEEE dataflow is
    unchanged: the same expression computes the value, its result is then
    REUSED instead of recomputed, so outputs stay bit-identical (oracle
    re-verified per consumer)."""
    return F.element_at(F.transform(F.array(value), body), 1)


@query(
    "ts_gap_fill",
    category="timeseries",
    oracle=f"""
    WITH b AS (
      SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket,
             {sql_dsum('value')} AS sum_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
    grid AS (
      SELECT e.event_type, g.g AS bucket
      FROM (SELECT DISTINCT event_type FROM b) e,
           LATERAL (SELECT UNNEST(generate_series(lo, hi, INTERVAL '5 minutes')) AS g
                    FROM bounds) g
    )
    SELECT grid.event_type, grid.bucket,
           CAST(b.sum_value IS NULL AS BOOLEAN) AS was_gap,
           ROUND(COALESCE(
             last_value(b.sum_value IGNORE NULLS)
               OVER (PARTITION BY grid.event_type ORDER BY grid.bucket), 0.0), 4)
             AS filled_value
    FROM grid LEFT JOIN b
      ON grid.event_type = b.event_type AND grid.bucket = b.bucket
    """,
)
def ts_gap_fill(spark, sf_dir):
    """Gap-filled 5-minute series per event_type with forward fill —
    the ClickHouse WITH FILL / Grafana $__timeGroup(null-as-previous)
    query over the reference's 30 s-cadence telemetry schema."""
    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "event_type", F.window("ts", "5 minutes")["start"].alias("bucket")
        )
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"))
    )
    bounds = b.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    grid = (
        b.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 5 MINUTES"))
            ).alias("bucket"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(b, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.col("sum_value").isNull().alias("was_gap"),
            r4(
                F.coalesce(
                    F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)
                )
            ).alias("filled_value"),
        )
    )


@query(
    "ts_locf_fill",
    category="timeseries",
    oracle="""
    SELECT user_id, ts, event_type,
           ROUND(last_value(CASE WHEN event_type <> 'error' THEN value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS value_locf
    FROM events
    """,
)
def ts_locf_fill(spark, sf_dir):
    """LOCF (last observation carried forward) gap fill — the standard
    repair for sensor streams with bad samples: readings taken during
    'error' events are voided and replaced by the most recent good value
    per user. One window over the user_id partitioning, last(...,
    ignorenulls=True) — ClickHouse spells it anyLast + WITH FILL, ANSI
    spells it IGNORE NULLS; all three agree. Leading errors (no prior
    good value) stay NULL."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "ts",
        "event_type",
        F.round(F.last(good, ignorenulls=True).over(w), 4).alias("value_locf"),
    )


@query(
    "ts_ohlc_downsample",
    category="timeseries",
    oracle="""
    WITH ranked AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, bucket,
           ROUND(MIN(CASE WHEN rn = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(MIN(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           COUNT(*) AS n_samples
    FROM ranked GROUP BY user_id, bucket
    """,
)
def ts_ohlc_downsample(spark, sf_dir):
    """OHLC downsampling — the Grafana/ClickHouse rollup for gauge columns
    (the reference's voltage/temperature metrics at lower zoom): per user
    per hour bucket, open/high/low/close/count. open/close are min_by/
    max_by over a (ts, event_id) struct key — ONE partial+final hash
    aggregation, no window, no sort; the oracle needs ROW_NUMBER only
    because ANSI SQL lacks tie-broken arg-min. At 100 TB this folds
    96-per-day samples into hourly bars with a shuffle keyed on
    (user, bucket) — the downsample every dashboard query then reads."""
    ev = table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    bucket = F.date_trunc("hour", F.col("ts"))
    return ev.groupBy("user_id", bucket.alias("bucket")).agg(
        F.round(F.min_by("value", key), 4).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(F.max_by("value", key), 4).alias("close"),
        F.count(F.lit(1)).alias("n_samples"),
    )


@query(
    "ts_counter_reset_rate",
    category="timeseries",
    oracle=f"""
    WITH d AS (
      SELECT user_id, ts, value,
             value - LAG(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS delta
      FROM events
    )
    SELECT user_id,
           {sql_dsum('CASE WHEN delta IS NULL THEN NULL WHEN delta >= 0 THEN delta ELSE value END')} AS total_increase,
           COUNT(CASE WHEN delta < 0 THEN 1 END) AS n_resets
    FROM d GROUP BY user_id
    """,
)
def ts_counter_reset_rate(spark, sf_dir):
    """Counter increase with reset detection — the PromQL increase() /
    ClickHouse deltaSumTimestamp semantics the reference's cumulative
    kwh_total/kwh_day counters need (a replaced inverter restarts its
    lifetime counter at 0; a naive last-first underflows): per-sample
    delta via lag(); negative delta means reset, contributing the
    post-reset absolute value instead. One window + one aggregation over
    the same user_id partitioning — Catalyst reuses a single exchange."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    contrib = (
        F.when(delta.isNull(), F.lit(None).cast("double"))
        .when(delta >= 0, delta)
        .otherwise(F.col("value"))
    )
    d = ev.select("user_id", contrib.alias("contrib"), delta.alias("delta"))
    return d.groupBy("user_id").agg(
        dsum("contrib").alias("total_increase"),
        F.count(F.when(F.col("delta") < 0, 1)).alias("n_resets"),
    )


@query(
    "ts_degradation_trend",
    category="timeseries",
    oracle="""
    WITH x AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts) / 3600.0) AS BIGINT) - 490000 AS xh,
             value AS y
      FROM events
    ),
    s AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(xh) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y  AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xh * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(xh * xh) AS DOUBLE) AS sxx
      FROM x GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0) * 24.0, 4)
             AS slope_per_day,
           ROUND((sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0) * sx)
                 / n, 4) AS intercept
    FROM s
    """,
)
def ts_degradation_trend(spark, sf_dir):
    """Per-key OLS trend — the panel-degradation query a solar fleet runs
    over years of efficiency samples (reference metric
    inverter_efficiency_percent, tables.sql:7): closed-form least-squares
    slope from exactly-accumulated sums, so the result is
    order-independent and engine-identical without regr_slope (whose
    float accumulation is engine-specific). x is the INTEGER hour bucket
    (offset-centered to keep the normal-equation terms well-conditioned):
    fractional x would be re-quantized by the decimal cast at the 1e-6
    place, where the two engines' tie-rounding can differ — integer x
    makes sx/sxx exact and leaves only the y-bearing sums on the shared
    decimal idiom. One aggregation, slope reported per day; constant-x
    groups get NULL via NULLIF."""
    ev = table(spark, sf_dir, "events")
    x = ev.select(
        "user_id",
        (F.floor(F.col("ts").cast("double") / 3600.0).cast("long") - 490000).alias("xh"),
        F.col("value").alias("y"),
    )
    s = x.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xh").cast("double").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("xh") * F.col("y")).alias("sxy"),
        F.sum(F.col("xh") * F.col("xh")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ["n", "sx", "sy", "sxy", "sxx"])
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return s.select(
        "user_id",
        "n",
        F.round(slope * 24.0, 4).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
    )


@query(
    "ts_sessionize_islands",
    category="timeseries",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                             ORDER BY ts, event_id))
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def ts_sessionize_islands(spark, sf_dir):
    """Batch sessionization via gaps-and-islands: a session break is a
    >30-min silence; session_id = running count of breaks (lag + prefix
    sum over ONE user_id window — Catalyst stacks both window functions
    on a single exchange+sort). Same semantics as session_window()
    (stream_session_window) expressed as the prefix-sum operator, with
    stable per-user session ids the streaming form doesn't give you."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # integer-microsecond gap compare on BOTH engines: truncating casts or
    # whole-second interval math diverge when ts has sub-second components
    prev = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    brk = F.when(prev.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = ev.select(
        "user_id", "ts", F.sum(brk).over(run).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "ts_autocorr_lag1",
    category="timeseries",
    oracle="""
    WITH p AS (
      SELECT user_id, value AS y,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
      FROM events
    ),
    s AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM p WHERE x IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND((n * sxy - sx * sy)
                 / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0),
                 4) AS autocorr_lag1
    FROM s
    """,
)
def ts_autocorr_lag1(spark, sf_dir):
    """Per-key lag-1 autocorrelation — the sensor-stability diagnostic
    (a healthy inverter's power readings are strongly autocorrelated;
    white noise means a failing sensor): Pearson r between each sample
    and its predecessor, computed from five decimal-accumulated sums so
    both engines do identical double arithmetic on identical inputs. The
    lag window and the aggregation share one user_id exchange."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        F.col("value").alias("y"),
        F.lag("value").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    s = p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ["n", "sx", "sy", "sxy", "sxx", "syy"])
    denom = F.nullif(F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), F.lit(0.0))
    return s.select(
        "user_id", "n", F.round((n * sxy - sx * sy) / denom, 4).alias("autocorr_lag1")
    )


@query(
    "ts_linear_interpolate",
    category="timeseries",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS tu,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    nb AS (
      SELECT user_id, event_id, ts, tu, v,
             last_value((CASE WHEN v IS NOT NULL THEN tu END) IGNORE NULLS) OVER wp AS ptu,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             first_value((CASE WHEN v IS NOT NULL THEN tu END) IGNORE NULLS) OVER wn AS ntu,
             first_value(v IGNORE NULLS) OVER wn AS nv
      FROM base
      WINDOW wp AS (PARTITION BY user_id ORDER BY tu, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY tu, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id, ts,
           ROUND(COALESCE(
             pv + (nv - pv) * (CAST(tu - ptu AS DOUBLE)
                               / NULLIF(CAST(ntu - ptu AS DOUBLE), 0.0)),
             nv, pv), 4) AS v_interp
    FROM nb
    """,
)
def ts_linear_interpolate(spark, sf_dir):
    """Time-weighted linear interpolation of dropout readings (every 7th
    event_id simulates a lost sample): each missing point is reconstructed
    from its nearest non-null neighbors as
    ``pv + (nv-pv)·(t-tp)/(tn-tp)`` — the ClickHouse
    ``interpolate()``/Grafana connect-null-values repair, one step past
    LOCF (ts_locf_fill). Two mirrored windows over ONE user_id shuffle;
    time arithmetic in integer microseconds (unix_micros) so the weight is
    an exact-integer ratio before the single double division; boundary
    dropouts fall back to the only existing neighbor."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("tu"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy("tu", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("tu", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    vtu = F.when(F.col("v").isNotNull(), F.col("tu"))
    nb = base.select(
        "user_id",
        "event_id",
        "ts",
        "tu",
        "v",
        F.last(vtu, ignorenulls=True).over(wp).alias("ptu"),
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.first(vtu, ignorenulls=True).over(wn).alias("ntu"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
    )
    frac = (F.col("tu") - F.col("ptu")).cast("double") / F.nullif(
        (F.col("ntu") - F.col("ptu")).cast("double"), F.lit(0.0)
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    return nb.select(
        "user_id",
        "event_id",
        "ts",
        r4(F.coalesce(interp, F.col("nv"), F.col("pv"))).alias("v_interp"),
    )


@query(
    "ts_ema_bounded",
    category="timeseries",
    oracle="""
    WITH ar AS (
      SELECT user_id, event_id, ts,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS a
      FROM events
    )
    SELECT user_id, event_id, ts,
           ROUND(
             list_reduce(list_transform(a, (x, i) -> x * pow(0.9, len(a) - i)),
                         (acc, x) -> acc + x)
             / ((1.0 - pow(0.9, len(a))) / 0.1), 4) AS ema
    FROM ar
    """,
)
def ts_ema_bounded(spark, sf_dir):
    """Exponential moving average (ClickHouse
    ``exponentialMovingAverage`` / pandas ``ewm(alpha=.1).mean()`` with a
    20-sample horizon): weight (1-α)^j on the j-th most recent sample,
    normalized over the visible window. The recursion is unrolled into a
    bounded ROWS frame: collect_list keeps frame order, the weighted sum
    is a SEQUENTIAL left fold (F.aggregate ≡ DuckDB list_reduce, so both
    engines add in the identical order — bit-equal doubles), and the
    normalizer uses the closed-form geometric sum on both sides. Spark
    lambda indexes are 0-based, DuckDB's 1-based; the exponent is written
    n-1-i resp. n-i so the newest sample always gets weight 1."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    ar = ev.select(
        "user_id", "event_id", "ts", F.collect_list("value").over(w).alias("a")
    )
    n = F.size("a")
    weighted = F.transform(
        "a", lambda x, i: x * F.pow(F.lit(0.9), (n - 1 - i).cast("double"))
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    den = (F.lit(1.0) - F.pow(F.lit(0.9), n.cast("double"))) / F.lit(0.1)
    return ar.select("user_id", "event_id", "ts", r4(num / den).alias("ema"))


@query(
    "ts_anomaly_zscore",
    category="timeseries",
    oracle="""
    WITH ar AS (
      SELECT user_id, event_id, ts, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS a
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, ts, value, a,
             list_reduce(a, (x, y) -> x + y) / len(a) AS mu
      FROM ar
    ),
    v AS (
      SELECT user_id, event_id, ts, value, mu,
             list_reduce(list_transform(a, x -> (x - mu) * (x - mu)),
                         (x, y) -> x + y) / len(a) AS var
      FROM m
    )
    SELECT user_id, event_id, ts,
           ROUND(CASE WHEN var > 0 THEN (value - mu) / sqrt(var) END, 4) AS zscore,
           CASE WHEN var > 0 THEN abs((value - mu) / sqrt(var)) > 3.0
                ELSE FALSE END AS is_anomaly
    FROM v
    """,
)
def ts_anomaly_zscore(spark, sf_dir):
    """Rolling z-score anomaly flag: each reading scored against the mean
    and population variance of its trailing 20-sample window — the
    standard online sensor-fault detector. Mean and variance come from
    SEQUENTIAL left folds over the frame list (F.aggregate ≡ DuckDB
    list_reduce: identical addition order, bit-equal doubles on both
    engines — a windowed stddev built from each engine's own aggregate
    would not hash-match). Single user_id shuffle; constant-valued
    windows yield NULL score, not a division error."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    ar = ev.select(
        "user_id", "event_id", "ts", "value",
        F.collect_list("value").over(w).alias("a"),
    )
    n = F.size("a").cast("double")
    m = ar.withColumn(
        "mu", F.aggregate("a", F.lit(0.0), lambda x, y: x + y) / n
    )
    mu = F.col("mu")
    v = m.withColumn(
        "var",
        F.aggregate(
            F.transform("a", lambda x: (x - mu) * (x - mu)),
            F.lit(0.0),
            lambda x, y: x + y,
        )
        / F.size("a").cast("double"),
    )
    z = (F.col("value") - mu) / F.sqrt(F.col("var"))
    guarded = F.when(F.col("var") > 0, z)
    return v.select(
        "user_id",
        "event_id",
        "ts",
        r4(guarded).alias("zscore"),
        F.coalesce(F.abs(guarded) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "ts_seasonal_naive_forecast",
    category="timeseries",
    oracle=f"""
    WITH h AS (
      SELECT user_id, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS day, value
      FROM events
    ),
    daily AS (
      SELECT user_id, hod, day,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS v_mic
      FROM h GROUP BY user_id, hod, day
    ),
    prof AS (
      SELECT user_id, hod,
             (2 * SUM(v_mic) + 100 * COUNT(*)) // (200 * COUNT(*)) AS m4,
             MAX(day) AS last_day
      FROM daily
      GROUP BY user_id, hod
    )
    SELECT p.user_id, p.hod,
           p.m4 / 10000.0 AS forecast,
           d.v_mic / 1000000.0 AS last_actual,
           ROUND(d.v_mic / 1000000.0 - p.m4 / 10000.0, 4) AS residual
    FROM prof p JOIN daily d
      ON d.user_id = p.user_id AND d.hod = p.hod AND d.day = p.last_day
    """,
)
def ts_seasonal_naive_forecast(spark, sf_dir):
    """Seasonal-naive forecast with residual: each (user, hour-of-day)
    slot is forecast as its historical mean daily total, compared against
    the most recent day's actual — the day-ahead PV-production baseline
    every solar fleet publishes (reference metric kwh_day,
    tables.sql:27). Two stacked aggregations over the same (user, hod)
    grouping plus a self-join on the argmax day. Determinism: daily totals become exact integer
    MICRO-units (decimal sum x 1e6 -> BIGINT) and the per-slot mean is
    rounded to 4 dp with INTEGER half-up division ((2S+100C) div 200C) —
    an engine-level ROUND(double) would disagree between Spark (rounds
    the exact binary expansion) and DuckDB (rounds the shortest repr)
    whenever the mean lands exactly on a half boundary like 38.51125."""
    ev = table(spark, sf_dir, "events")
    h = ev.select(
        "user_id",
        F.hour("ts").cast("long").alias("hod"),
        F.floor(F.col("ts").cast("double") / 86400.0).cast("long").alias("day"),
        "value",
    )
    daily = h.groupBy("user_id", "hod", "day").agg(
        (F.sum(F.col("value").cast(_DEC)) * 1000000).cast("long").alias("v_mic")
    )
    prof = (
        daily.groupBy("user_id", "hod")
        .agg(
            F.sum("v_mic").alias("s_mic"),
            F.count(F.lit(1)).alias("cnt"),
            F.max("day").alias("last_day"),
        )
        .withColumn("m4", F.expr("(2 * s_mic + 100 * cnt) div (200 * cnt)"))
    )
    d2 = daily.select(
        F.col("user_id").alias("d_user"),
        F.col("hod").alias("d_hod"),
        F.col("day").alias("d_day"),
        F.col("v_mic").alias("d_mic"),
    )
    j = prof.join(
        d2,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("hod") == F.col("d_hod"))
        & (F.col("last_day") == F.col("d_day")),
    )
    return j.select(
        "user_id",
        "hod",
        (F.col("m4") / 10000.0).alias("forecast"),
        (F.col("d_mic") / 1000000.0).alias("last_actual"),
        F.round(
            F.col("d_mic") / 1000000.0 - F.col("m4") / 10000.0, 4
        ).alias("residual"),
    )


@query(
    "ts_calendar_heatmap",
    category="timeseries",
    oracle=f"""
    SELECT event_type,
           CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
           COUNT(*) AS n_events,
           ROUND({sql_dsum('value')}, 4) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def ts_calendar_heatmap(spark, sf_dir):
    """Calendar heatmap grid (ISO weekday x hour-of-day per type) — the
    Grafana heatmap panel every telemetry dashboard renders over the
    reference's 30 s cadence data. ISO dow (Mon=1..Sun=7) is spelled
    portably: Spark's dayofweek() is Sun=1-based, so the query maps it
    explicitly rather than trusting dialect defaults. Single partial+
    final aggregation; 7x24x|types| output rows at any input scale."""
    ev = table(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek("ts") + 5) % 7) + 1
    return ev.groupBy(
        "event_type",
        iso_dow.cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        r4(dsum("value")).alias("total_value"),
    )


@query("ts_lttb_downsample", python_boundary=True, category="timeseries", check="SMOKE")
def ts_lttb_downsample(spark, sf_dir):
    """ClickHouse ``largestTriangleThreeBuckets``: visually-lossless
    downsampling of each user's series to ≤22 points (20 buckets +
    endpoints). Sequential per-key selection → applyInPandas (the
    reserved escape hatch for genuinely stateful per-key logic); no
    oracle entry because the pick chain isn't ANSI-SQL — invariants
    (size bound, endpoints kept, output ⊆ input, determinism) are
    asserted in tests/test_operators.py."""
    from ..operators.lttb import lttb_downsample

    ev = table(spark, sf_dir, "events")
    return lttb_downsample(
        ev, key="user_id", ts="ts", val="value", order_tiebreak="event_id",
        n_buckets=20,
    )


@query(
    "ts_twap",
    category="timeseries",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v_centi,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - epoch_us(ts) AS dt_us
      FROM events
    ),
    s AS (
      SELECT user_id,
             SUM(v_centi * dt_us) AS sw,
             SUM(dt_us) AS w
      FROM seg WHERE dt_us IS NOT NULL AND dt_us > 0
      GROUP BY user_id
    )
    SELECT user_id,
           ((2 * sw * 100 + w) // (2 * w)) / 10000.0 AS twap
    FROM s
    """,
)
def ts_twap(spark, sf_dir):
    """Time-weighted average (ClickHouse ``avgWeighted`` with hold-until-
    next-sample weights / TWAP): each reading weighted by how long it was
    the live value. Fully INTEGER-exact: values become centi-units
    (ROUND then cast — a bare cast truncates on Spark but rounds on
    DuckDB), weights are integer microseconds from lead(), and the final
    4-dp mean uses the same half-up integer division as
    ts_seasonal_naive_forecast, so no float accumulates anywhere before
    the one defining division."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tu = F.unix_micros("ts")
    seg = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("v_centi"),
        (F.lead(tu).over(w) - tu).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
    s = seg.groupBy("user_id").agg(
        F.sum(F.col("v_centi") * F.col("dt_us")).alias("sw"),
        F.sum("dt_us").alias("w"),
    )
    return s.select(
        "user_id",
        (F.expr("(2 * sw * 100 + w) div (2 * w)") / 10000.0).alias("twap"),
    )


@query(
    "ts_sequence_gaps",
    category="timeseries",
    oracle="""
    WITH d AS (
      SELECT event_id,
             LAG(event_id) OVER (ORDER BY event_id) AS prev_id
      FROM events WHERE event_type = 'purchase'
    )
    SELECT prev_id + 1 AS gap_start, event_id - 1 AS gap_end,
           event_id - prev_id - 1 AS n_missing
    FROM d
    WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
    """,
)
def ts_sequence_gaps(spark, sf_dir):
    """Missing-ID detection: contiguous gaps in the event_id sequence as
    (start, end, count) ranges — the completeness audit run after every
    ingest window (the reference's bounded queue DROPS newest samples on
    overflow, solarman.py:312, so landed data has exactly this failure
    mode). Scoped to one event class ('purchase') because the fixture's
    global id sequence is gapless — the ranges are then the id spans
    between consecutive purchases. One lag over the id order; at scale
    the same query runs per ingest partition so the sort is per-day, not
    global."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = W.orderBy("event_id")
    d = ev.select(
        "event_id", F.lag("event_id").over(w).alias("prev_id")
    ).where(F.col("prev_id").isNotNull() & (F.col("event_id") - F.col("prev_id") > 1))
    return d.select(
        (F.col("prev_id") + 1).alias("gap_start"),
        (F.col("event_id") - 1).alias("gap_end"),
        (F.col("event_id") - F.col("prev_id") - 1).alias("n_missing"),
    )


@query(
    "ts_wau_growth",
    category="timeseries",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             COUNT(DISTINCT user_id) AS wau,
             COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT week, wau, n_events,
           wau - LAG(wau) OVER (ORDER BY week) AS wau_delta,
           ROUND((wau - LAG(wau) OVER (ORDER BY week)) * 100.0
                 / LAG(wau) OVER (ORDER BY week), 4) AS wau_growth_pct
    FROM m
    """,
)
def ts_wau_growth(spark, sf_dir):
    """Weekly-active-users with week-over-week growth — THE canonical
    activity dashboard (ClickHouse uniq + neighbor()). Weekly because the
    fixture spans one month (a monthly rollup would be a single row and
    the growth column vacuously NULL); the oracle casts DuckDB's
    DATE-typed week truncation back to TIMESTAMP to match Spark. The
    distinct count is the only wide aggregation; the growth window runs
    on |weeks| rows."""
    ev = table(spark, sf_dir, "events")
    m = ev.groupBy(F.date_trunc("week", F.col("ts")).alias("week")).agg(
        F.count_distinct("user_id").alias("wau"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = W.orderBy("week")
    prev = F.lag("wau").over(w)
    return m.select(
        "week",
        "wau",
        "n_events",
        (F.col("wau") - prev).alias("wau_delta"),
        F.round((F.col("wau") - prev) * 100.0 / prev, 4).alias("wau_growth_pct"),
    )


@query(
    "ts_drawdown",
    category="timeseries",
    oracle="""
    WITH q AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value * 10000) AS BIGINT) AS qv
      FROM events
    ),
    r AS (
      SELECT user_id, qv,
             MAX(qv) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_max
      FROM q
    )
    SELECT user_id,
           CAST(MAX(run_max - qv) AS DOUBLE) / 10000.0 + 0.0 AS max_drawdown,
           MAX(CASE WHEN run_max > 0
                    THEN CAST(run_max - qv AS DOUBLE) / run_max END) + 0.0
             AS max_drawdown_frac
    FROM r GROUP BY user_id
    """,
)
def ts_drawdown(spark, sf_dir):
    """Maximum drawdown per key: largest drop from a running peak — the
    degradation/reliability metric for anything monotonic-ish (peak power
    output, portfolio value; ClickHouse spells it runningAccumulate +
    max). Values quantize to e4 integers FIRST (floor(v·1e4); floor
    commutes with max, so the running peak is the quantized peak), so
    the drop is an exact BIGINT and the fraction is one IEEE division of
    engine-identical integers — emitted UNROUNDED on both sides, because
    every op is per-row deterministic (no accumulation-order hazard) and
    DuckDB v1.0.0's VECTORIZED ROUND(double, 4) misrounds a value one
    ulp below the .00005 boundary UP (0.99964999… → 0.9997; its scalar/
    constant-folded ROUND and Spark both give 0.9996 — caught by the
    sf1.0 sweep, one user in 15 000). The aggregate rides the same
    (user, time) shuffle as the window."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    q = ev.select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 10000).cast("long").alias("qv"),
    )
    r = q.select(
        "user_id", "qv", F.max("qv").over(w).alias("run_max")
    )
    dd = F.col("run_max") - F.col("qv")
    return r.groupBy("user_id").agg(
        (F.max(dd).cast("double") / 10000.0 + F.lit(0.0)).alias("max_drawdown"),
        (
            F.max(
                F.when(F.col("run_max") > 0, dd.cast("double") / F.col("run_max"))
            )
            + F.lit(0.0)
        ).alias("max_drawdown_frac"),
    )


@query(
    "ts_snapshot_diff",
    category="timeseries",
    oracle="""
    WITH s1 AS (
      SELECT user_id, event_type FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-02') t WHERE rn = 1
    ),
    s2 AS (
      SELECT user_id, event_type FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1
    )
    SELECT CASE WHEN s1.user_id IS NULL THEN 'new'
                WHEN s1.event_type <> s2.event_type THEN 'changed'
                ELSE 'unchanged' END AS change_class,
           COUNT(*) AS n_users
    FROM s2 LEFT JOIN s1 USING (user_id)
    GROUP BY change_class
    """,
)
def ts_snapshot_diff(spark, sf_dir):
    """CDC-style snapshot diff: the last state per key as of T1 vs as of
    now, every key classified new / changed / unchanged — the audit a
    warehouse runs between two loads of a last-point-per-key table
    (ClickHouse: two argMax subqueries joined). The cutoff
    2024-01-02 is calibrated so all three classes are non-empty on the
    fixture (16/104/30 at sf0.01). Both snapshots ride the same
    (user, time-desc) window; deterministic tie-break on event_id. At
    100 TB each snapshot is a partial last-point aggregate (max_by of a
    time-ordered struct), so the diff costs one co-partitioned join."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def snap(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type")
        )

    s1 = snap(ev.where(F.col("ts") < F.lit("2024-01-02").cast("timestamp"))).withColumnRenamed(
        "event_type", "et1"
    )
    s2 = snap(ev)
    cls = (
        F.when(F.col("et1").isNull(), "new")
        .when(F.col("et1") != F.col("event_type"), "changed")
        .otherwise("unchanged")
    )
    return (
        s2.join(s1, "user_id", "left")
        .groupBy(cls.alias("change_class"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "ts_cusum_changepoint",
    category="timeseries",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) - 7500 AS y
      FROM events
    ),
    p AS (
      SELECT user_id, ts, event_id,
             SUM(y) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS ps
      FROM x
    ),
    s AS (
      SELECT user_id,
             ps - LEAST(0, MIN(ps) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)) AS cusum
      FROM p
    )
    SELECT user_id,
           ROUND(MAX(cusum) / 100.0, 4) AS max_cusum,
           CAST(SUM(CASE WHEN cusum > 20000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_samples
    FROM s GROUP BY user_id
    """,
)
def ts_cusum_changepoint(spark, sf_dir):
    """One-sided CUSUM changepoint detector per key (Page's test —
    S_i = max(0, S_{i-1} + x_i - target); the upward-drift alarm a solar
    fleet would run on temperature): the recursion is rewritten through
    the exact identity S_i = P_i - min(0, min_{j<=i} P_j) over prefix
    sums of the drift, so instead of an unparallelizable sequential fold
    it becomes two running windows that both engines evaluate on EXACT
    INTEGERS — the 2-dp fixture values scale to BIGINT (y = 100*x -
    7500), and nothing touches floating point until the final /100.
    Target 75.00 / alarm 200.00 are calibrated to the fixture (70 of
    150 users alarm; counts discriminate). At 100 TB the windows ride
    one (user, time) shuffle and the aggregate reuses it."""
    ev = table(spark, sf_dir, "events")
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    y = (F.round(F.col("value") * 100).cast("long") - 7500).alias("y")
    p = ev.select("user_id", "ts", "event_id", y).withColumn(
        "ps", F.sum("y").over(run)
    )
    cusum = F.col("ps") - F.least(F.lit(0).cast("long"), F.min("ps").over(run))
    s = p.select("user_id", cusum.alias("cusum"))
    return s.groupBy("user_id").agg(
        F.round(F.max("cusum") / 100.0, 4).alias("max_cusum"),
        F.sum(F.when(F.col("cusum") > 20000, 1).otherwise(0)).alias(
            "n_alarm_samples"
        ),
    )


@query(
    "ts_hampel_outliers",
    category="timeseries",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ),
    ar AS (
      SELECT user_id, event_id, ts, v,
             list_sort(list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS a
      FROM s
    ),
    med AS (
      SELECT user_id, event_id, ts, v, a,
             a[(len(a) + 1) // 2] AS m
      FROM ar
    ),
    mad AS (
      SELECT user_id, event_id, ts, v, m,
             list_sort(list_transform(a, x -> ABS(x - m)))[(len(a) + 1) // 2]
               AS d
      FROM med
    )
    SELECT user_id, event_id, ts,
           CAST(v AS DOUBLE) / 100.0 AS value,
           CAST(m AS DOUBLE) / 100.0 AS rolling_median,
           CAST(d AS DOUBLE) / 100.0 AS rolling_mad
    FROM mad
    WHERE d > 0 AND ABS(v - m) > 3 * d
    """,
)
def ts_hampel_outliers(spark, sf_dir):
    """Hampel-filter outlier detection — the robust despiking step a
    telemetry pipeline runs before rate/trend analytics (a median/MAD
    variant of the reference stack's Grafana alerting): flag samples more
    than 3 rolling MADs from the rolling median over a trailing 20-sample
    window. Entirely integer-exact: 2-dp values become BIGINTs, both the
    lower-median and the MAD (median of absolute deviations from the
    window median) are actual array elements, and the 3-sigma cut compares
    integers — no float blend anywhere. One user_id shuffle; the
    per-row 20-element sorts are O(1); windows with MAD = 0 (constant
    plateaus) are excluded since any deviation there is formally
    infinite-sigma."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    ar = s.select(
        "user_id", "event_id", "ts", "v",
        F.array_sort(F.collect_list("v").over(w)).alias("a"),
    )
    mid = F.floor((F.size("a") + 1) / 2).cast("int")
    med = ar.select(
        "user_id", "event_id", "ts", "v", "a",
        F.element_at("a", mid).alias("m"),
    )
    m = F.col("m")
    dev = F.array_sort(F.transform(F.col("a"), lambda x: F.abs(x - m)))
    mad = med.select(
        "user_id", "event_id", "ts", "v", "m",
        F.element_at(dev, mid).alias("d"),
    )
    return mad.where((F.col("d") > 0) & (F.abs(F.col("v") - m) > 3 * F.col("d"))).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("v").cast("double") / 100.0).alias("value"),
        (m.cast("double") / 100.0).alias("rolling_median"),
        (F.col("d").cast("double") / 100.0).alias("rolling_mad"),
    )


@query(
    "ts_holt_forecast",
    category="timeseries",
    oracle="""
    WITH ar AS (
      SELECT user_id, event_id, ts,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS a
      FROM events
    ),
    st AS (
      SELECT user_id, event_id, ts,
             list_reduce(
               list_transform(a, x -> [x, 0.0]),
               (acc, x) -> [
                 0.4 * x[1] + 0.6 * (acc[1] + acc[2]),
                 0.3 * (0.4 * x[1] + 0.6 * (acc[1] + acc[2]) - acc[1]) + 0.7 * acc[2]
               ]) AS lb
      FROM ar
    )
    SELECT user_id, event_id, ts,
           ROUND(lb[1], 4) + 0.0 AS level,
           -- + 0.0 clears IEEE -0.0: a bit-equal tiny-negative trend
           -- rounds to -0.0 on one engine and 0.0 on the other
           ROUND(lb[2], 4) + 0.0 AS trend,
           ROUND(lb[1] + 5 * lb[2], 4) + 0.0 AS forecast_5
    FROM st
    """,
)
def ts_holt_forecast(spark, sf_dir):
    """Holt's linear-trend double exponential smoothing (alpha=0.4,
    beta=0.3) over each reading's trailing 20-sample window, plus the
    5-step-ahead forecast l + 5b — the next tier above ts_ema_bounded
    when the series has drift (a degrading inverter's declining output
    trends; a flat EMA lags it). The coupled level/trend recursion has no
    prefix-sum identity, so it runs as a SEQUENTIAL left fold over the
    frame list with a 2-element [level, trend] accumulator: F.aggregate
    and DuckDB list_reduce add in the identical order on identical
    doubles, so the floats are bit-equal (same discipline as
    ts_ema_bounded / ts_anomaly_zscore). DuckDB's list_reduce seeds with
    the first element, so values are lifted to [x, 0.0] pairs and Spark
    mirrors that seed with zero=[a[0], 0.0] folding a[2:]. Bounded frame
    = bounded state: the fold is O(20) per row at any corpus size, and
    the only exchange is the per-user window shuffle."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    ar = ev.select(
        "user_id", "event_id", "ts", F.collect_list("value").over(w).alias("a")
    )
    a = F.col("a")
    new_l = lambda acc, x: F.lit(0.4) * x + F.lit(0.6) * (
        F.element_at(acc, 1) + F.element_at(acc, 2)
    )
    # new_l bound once per step (see _bind): two references, one
    # evaluation, identical IEEE dataflow.
    lb = F.aggregate(
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))),
        F.array(F.element_at(a, 1), F.lit(0.0)),
        lambda acc, x: _bind(
            new_l(acc, x),
            lambda nl: F.array(
                nl,
                F.lit(0.3) * (nl - F.element_at(acc, 1))
                + F.lit(0.7) * F.element_at(acc, 2),
            ),
        ),
    )
    st = ar.select("user_id", "event_id", "ts", lb.alias("lb"))
    return st.select(
        "user_id",
        "event_id",
        "ts",
        (r4(F.element_at("lb", 1)) + 0.0).alias("level"),
        # + 0.0 clears IEEE -0.0 (tiny-negative trend rounding to zero)
        (r4(F.element_at("lb", 2)) + 0.0).alias("trend"),
        (r4(F.element_at("lb", 1) + F.lit(5.0) * F.element_at("lb", 2)) + 0.0).alias(
            "forecast_5"
        ),
    )


@query(
    "ch_exp_time_decayed_avg",
    category="timeseries",
    oracle="""
    WITH ar AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS tu,
             list(value)        OVER w AS av,
             list(epoch_us(ts)) OVER w AS at
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    wt AS (
      SELECT user_id, event_id, ts,
             list_transform(
               av, (x, i) ->
                 x * ROUND(exp(-((tu - at[i]) / 3600000000.0)), 8)) AS wv,
             list_transform(
               at, t -> ROUND(exp(-((tu - t) / 3600000000.0)), 8)) AS w
      FROM ar
    )
    SELECT user_id, event_id, ts,
           ROUND(list_reduce(wv, (a, b) -> a + b)
                 / list_reduce(w, (a, b) -> a + b), 4) AS decayed_avg
    FROM wt
    """,
)
def ch_exp_time_decayed_avg(spark, sf_dir):
    """ClickHouse ``exponentialTimeDecayedAvg(3600)(value, ts)`` parity:
    each reading averaged with weights exp(-(t_now - t_i)/decay) over its
    trailing 20-sample window — decay in TIME units (1 h), so irregular
    sampling decays correctly where row-count EMA (ts_ema_bounded) would
    not. Time deltas are exact integer microseconds; the single division
    by 3600e6 produces a bit-identical double on both engines (IEEE
    exact rounding), and each weight is quantized ROUND(exp(.), 8)
    BEFORE the fold so a possible 1-ulp libm difference between the JVM
    and DuckDB exp() cannot reach the sum. Numerator and denominator are
    SEQUENTIAL left folds in identical order (F.aggregate ==
    list_reduce). Bounded frame, one per-user exchange, no UDF."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    tu = F.unix_micros("ts")
    # ONE struct array over the frame (not separate value/time arrays:
    # halves the window buffer), and ONE exp per element (weights
    # pre-materialized by a transform, then a single [num, den] fold —
    # addition order per component identical to the oracle's two
    # list_reduces, so the doubles stay bit-equal).
    ar = ev.select(
        "user_id",
        "event_id",
        "ts",
        tu.alias("tu"),
        F.collect_list(F.struct(F.col("value").alias("v"), tu.alias("t"))).over(w).alias("a"),
    )
    wts = F.transform(
        "a",
        lambda s: F.struct(
            s["v"].alias("v"),
            F.round(
                F.exp(-((F.col("tu") - s["t"]) / F.lit(3600000000.0))), 8
            ).alias("w"),
        ),
    )
    nd = F.aggregate(
        wts,
        F.array(F.lit(0.0), F.lit(0.0)),
        lambda acc, x: F.array(
            F.element_at(acc, 1) + x["v"] * x["w"],
            F.element_at(acc, 2) + x["w"],
        ),
    )
    return ar.select(
        "user_id",
        "event_id",
        "ts",
        r4(F.element_at(nd, 1) / F.element_at(nd, 2)).alias("decayed_avg"),
    )


@query(
    "ts_stl_decompose",
    category="timeseries",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS ys
      FROM events
    ),
    tr AS (
      SELECT user_id, event_id, ts, ys,
             SUM(ys) OVER w AS sum_s,
             COUNT(*) OVER w AS cnt
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
    ),
    d AS (
      SELECT user_id, event_id, ts, sum_s, cnt,
             (ys * cnt - sum_s) * (27720 // cnt) AS dn
      FROM tr
    ),
    se AS (
      SELECT user_id, event_id, ts, sum_s, cnt, dn,
             SUM(dn) OVER (PARTITION BY user_id, hour(ts)) AS s_num,
             COUNT(*) OVER (PARTITION BY user_id, hour(ts)) AS s_cnt
      FROM d
    )
    SELECT user_id, event_id, ts,
           CAST(CASE WHEN sum_s >= 0 THEN 1 ELSE -1 END
                * ((2 * abs(sum_s * 10000) + cnt * 100)
                   // (2 * (cnt * 100))) AS DOUBLE) / 10000.0 AS trend,
           CAST(CASE WHEN s_num >= 0 THEN 1 ELSE -1 END
                * ((2 * abs(s_num * 10000) + s_cnt * 2772000)
                   // (2 * (s_cnt * 2772000))) AS DOUBLE) / 10000.0 AS seasonal,
           CAST(CASE WHEN dn * s_cnt - s_num >= 0 THEN 1 ELSE -1 END
                * ((2 * abs((dn * s_cnt - s_num) * 10000) + s_cnt * 2772000)
                   // (2 * (s_cnt * 2772000))) AS DOUBLE) / 10000.0 AS residual
    FROM se
    """,
)
def ts_stl_decompose(spark, sf_dir):
    """STL-style decomposition (trend + seasonal + residual) of each
    user's value series: trend = centered 11-sample moving average,
    seasonal = hour-of-day mean of the detrended series, residual = the
    rest. The engine-parity trick: the detrended value y − trend is a
    RATIONAL with denominator cnt ∈ [6,11] (window truncates at series
    edges), so it is carried as the exact BIGINT numerator
    (y·cnt − Σy)·(27720 div cnt) over the common denominator 27720
    (divisible by every count 1..12) — hour-of-day averaging then sums
    exact integers, immune to the float summation-order divergence a
    naive avg(detrended) would hit, and every emitted double is one
    fixed dataflow over identical integers. Plan: two window passes —
    one user_id exchange, one (user_id, hour) exchange — no joins, no
    collects; both partitionings scale with users, not time."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, 5)
    )
    s = ev.select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("ys"),
    )
    tr = s.select(
        "user_id", "event_id", "ts", "ys",
        F.sum("ys").over(w).alias("sum_s"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    d = tr.withColumn(
        "dn",
        (F.col("ys") * F.col("cnt") - F.col("sum_s"))
        * F.expr("27720 div cnt"),
    )
    wh = W.partitionBy("user_id", F.hour("ts"))
    se = d.select(
        "user_id", "event_id", "ts", "sum_s", "cnt", "dn",
        F.sum("dn").over(wh).alias("s_num"),
        F.count(F.lit(1)).over(wh).alias("s_cnt"),
    )
    # 4-dp values via exact integer HALF-AWAY-FROM-ZERO division rather
    # than ROUND on doubles: a quotient landing exactly on a .00005
    # boundary rounds half-up in Spark but half-even in DuckDB (the
    # ch_min_max_avg_map hazard) — the sign is split out so the positive
    # `div` ≡ `//` everywhere.
    def half4(num: str, den: str) -> F.Column:
        return (
            F.expr(
                f"CASE WHEN {num} >= 0 THEN 1 ELSE -1 END"
                f" * ((2 * abs(({num}) * 10000) + ({den}))"
                f" div (2 * ({den})))"
            ).cast("double")
            / 10000.0
        )

    return se.select(
        "user_id", "event_id", "ts",
        half4("sum_s", "cnt * 100").alias("trend"),
        half4("s_num", "s_cnt * 2772000").alias("seasonal"),
        half4("dn * s_cnt - s_num", "s_cnt * 2772000").alias("residual"),
    )


@query(
    "ts_kalman_1d",
    category="timeseries",
    oracle="""
    WITH ar AS (
      SELECT user_id, event_id, ts,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS a
      FROM events
    ),
    st AS (
      SELECT user_id, event_id, ts,
             list_reduce(
               list_transform(a, x -> [x, 1.0]),
               (acc, x) -> [
                 acc[1] + ROUND((acc[2] + 0.04) / (acc[2] + 0.04 + 1.0), 8)
                          * (x[1] - acc[1]),
                 (1.0 - ROUND((acc[2] + 0.04) / (acc[2] + 0.04 + 1.0), 8))
                          * (acc[2] + 0.04)
               ]) AS xp
      FROM ar
    )
    SELECT user_id, event_id, ts,
           ROUND(xp[1], 4) AS filtered,
           ROUND(xp[2], 6) AS variance
    FROM st
    """,
)
def ts_kalman_1d(spark, sf_dir):
    """1-D Kalman filter (random-walk state model, process variance
    Q=0.04, observation variance R=1.0) over each reading's trailing
    20-sample window — the optimal-in-the-MSE-sense denoiser for a
    drifting level observed through noise, one tier above ts_ema_bounded
    (fixed gain) and ts_holt_forecast (fixed alpha/beta): the Kalman gain
    ANNEALS as the posterior variance converges, so early samples in the
    window are trusted less than an EMA would. The coupled (x, P)
    recursion — predict P+Q, gain K=(P+Q)/(P+Q+R), update x+K(z−x),
    (1−K)(P+Q) — has no prefix-sum identity, so it runs as a SEQUENTIAL
    left fold with a 2-element [x, P] accumulator, the ts_holt_forecast
    discipline: F.aggregate and DuckDB list_reduce add identical doubles
    in identical order, and the per-step gain is quantized ROUND(K, 8)
    (positive domain, so Spark HALF_UP ≡ DuckDB half-away) before it
    multiplies the innovation, so a last-ulp libm divergence in the
    division can never reach the state. DuckDB's list_reduce seeds with
    the first element, so values are lifted to [z, 1.0] pairs — the 1.0
    second slot doubles as the P₀=1 prior and is ignored on subsequent
    elements. Bounded frame = bounded state: O(20) per row at any corpus
    size; the per-user window shuffle is the only exchange."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    ar = ev.select(
        "user_id", "event_id", "ts", F.collect_list("value").over(w).alias("a")
    )
    a = F.col("a")
    gain = lambda acc: F.round(
        (F.element_at(acc, 2) + F.lit(0.04))
        / (F.element_at(acc, 2) + F.lit(0.04) + F.lit(1.0)),
        8,
    )
    # gain bound once per step (see _bind): two references — the state
    # update and the variance update — one ROUND(division) evaluation.
    xp = F.aggregate(
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))),
        F.array(F.element_at(a, 1), F.lit(1.0)),
        lambda acc, x: _bind(
            gain(acc),
            lambda g: F.array(
                F.element_at(acc, 1) + g * (x - F.element_at(acc, 1)),
                (F.lit(1.0) - g) * (F.element_at(acc, 2) + F.lit(0.04)),
            ),
        ),
    )
    st = ar.select("user_id", "event_id", "ts", xp.alias("xp"))
    return st.select(
        "user_id",
        "event_id",
        "ts",
        r4(F.element_at("xp", 1)).alias("filtered"),
        F.round(F.element_at("xp", 2), 6).alias("variance"),
    )


@query(
    "ts_theil_sen_slope",
    category="timeseries",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu, value,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    bounded AS (SELECT * FROM e WHERE n BETWEEN 5 AND 100),
    pairs AS (
      SELECT a.user_id,
             (b.value - a.value) / ((b.tu - a.tu) / 3600000000.0) AS slope
      FROM bounded a
      JOIN bounded b ON a.user_id = b.user_id
        AND (a.tu < b.tu OR (a.tu = b.tu AND a.event_id < b.event_id))
      WHERE b.tu > a.tu
    ),
    ranked AS (
      SELECT user_id, slope,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slope) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS np
      FROM pairs
    )
    SELECT user_id, np AS n_pairs, ROUND(slope, 4) AS theil_sen_slope
    FROM ranked WHERE rn = (np + 1) // 2
    """,
)
def ts_theil_sen_slope(spark, sf_dir):
    """Theil–Sen robust trend estimator (median of all pairwise slopes,
    value-units per HOUR) per user — the degradation-trend tier that
    shrugs off the outliers that bias ts_degradation_trend's OLS slope
    (a single glitched reading moves OLS arbitrarily; it moves the
    slope median not at all up to 29% contamination). Bounded to users
    with 5-100 readings (the fixtures' zipf users carry 49-88) so the
    pair expansion is ≤ C(100,2) = 4 950 rows per user — at 100 TB the standard scale move is exactly this windowing
    (Theil-Sen over bounded recent windows per key), since the O(n²)
    pair set is otherwise untenable; the bound lives in the query, not a
    comment. Zero-dt pairs are excluded (duplicate-timestamp readings
    have no defined slope). Median = lower median by row_number over the
    slope ordering — doubles sort identically on both engines, and the
    slope itself is one exact-rounded division of a double difference by
    an exact integer-µs hour ratio. 4-dp round only at output."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tu"),
        "value",
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n"),
    ).where(F.col("n").between(5, 100))
    a = e.select(
        F.col("user_id"),
        F.col("tu").alias("tua"),
        F.col("value").alias("va"),
    )
    b = e.select(
        F.col("user_id"),
        F.col("tu").alias("tub"),
        F.col("value").alias("vb"),
    )
    pairs = a.join(b, "user_id").where(F.col("tub") > F.col("tua")).select(
        "user_id",
        (
            (F.col("vb") - F.col("va"))
            / ((F.col("tub") - F.col("tua")) / F.lit(3600000000.0))
        ).alias("slope"),
    )
    ranked = pairs.select(
        "user_id",
        "slope",
        F.row_number().over(W.partitionBy("user_id").orderBy("slope")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("np"),
    )
    return ranked.where(F.col("rn") == F.expr("(np + 1) div 2")).select(
        "user_id", F.col("np").alias("n_pairs"), F.round("slope", 4).alias("theil_sen_slope")
    )


@query(
    "ts_sax_symbols",
    category="timeseries",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             CAST(SUM(CAST(value AS DECIMAL(38,6)))
                    OVER (PARTITION BY user_id) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY user_id) AS mu,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             CAST(SUM(CAST(value * value AS DECIMAL(38,6)))
                    OVER (PARTITION BY user_id) AS DOUBLE) AS sq
      FROM events
    ),
    z AS (
      SELECT user_id, (rn - 1) // 8 AS seg,
             (value - mu) / sqrt((sq - n * mu * mu) / (n - 1)) AS zv
      FROM s WHERE n >= 2
    ),
    paa AS (
      SELECT user_id, seg,
             CAST(SUM(CAST(zv AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS num,
             COUNT(*) * 1000000 AS den,
             CAST(SUM(CAST(zv AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS m
      FROM z GROUP BY user_id, seg
    )
    -- 4-dp PAA via exact integer half-away division: at sf0.1 a segment
    -- mean lands exactly on a .00005 boundary where the engines' double
    -- ROUND modes disagree; num/den are exact integers from the decimal
    -- accumulator so the rounding decision is arithmetic, not float
    SELECT user_id, seg,
           CASE WHEN num < 0
                THEN -((2 * (-num) * 10000 + den) // (2 * den))
                ELSE (2 * num * 10000 + den) // (2 * den) END / 10000.0 + 0.0
             AS paa,
           CASE WHEN m < -0.6745 THEN 'a'
                WHEN m < 0.0     THEN 'b'
                WHEN m < 0.6745  THEN 'c'
                ELSE 'd' END AS symbol
    FROM paa
    """,
)
def ts_sax_symbols(spark, sf_dir):
    """SAX — Symbolic Aggregate approXimation (Lin et al. 2003), the
    classic time-series-mining compression: z-normalize each user's
    series, average over fixed 8-sample PAA segments, and quantize each
    segment mean into a 4-letter alphabet at the Gaussian quartile
    breakpoints ±0.6745 — after which motif discovery, anomaly lookup,
    and similarity search run on short STRINGS instead of floats (and
    at 100 TB, on a dictionary-encoded letter column instead of a
    double column). Determinism discipline: the per-user mean and
    sum-of-squares accumulate in DECIMAL(38,6) (order-free), the
    z-score and sqrt run on identical doubles, PAA means re-enter
    decimal accumulation, and the breakpoint CASE compares identical
    doubles — EXACT, with ROUND only on the reported PAA value. One
    user_id exchange feeds all three windows and the segment groupBy."""
    ev = table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id")
    s = ev.select(
        "user_id",
        "value",
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn"),
        (
            F.sum(F.col("value").cast("decimal(38,6)")).over(wu).cast("double")
            / F.count(F.lit(1)).over(wu)
        ).alias("mu"),
        F.count(F.lit(1)).over(wu).alias("n"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .over(wu)
        .cast("double")
        .alias("sq"),
    )
    z = s.where(F.col("n") >= 2).select(
        "user_id",
        F.expr("(rn - 1) div 8").alias("seg"),
        (
            (F.col("value") - F.col("mu"))
            / F.sqrt((F.col("sq") - F.col("n") * F.col("mu") * F.col("mu")) / (F.col("n") - 1))
        ).alias("zv"),
    )
    paa = z.groupBy("user_id", "seg").agg(
        F.sum(F.col("zv").cast("decimal(38,6)")).alias("sd"),
        F.count(F.lit(1)).alias("cnt"),
    ).select(
        "user_id",
        "seg",
        (F.col("sd") * 1000000).cast("long").alias("num"),
        (F.col("cnt") * 1000000).alias("den"),
        (F.col("sd").cast("double") / F.col("cnt")).alias("m"),
    )
    # 4-dp PAA via exact integer half-away division (see oracle comment)
    paa4 = F.expr(
        "CASE WHEN num < 0"
        " THEN -((2 * (-num) * 10000 + den) DIV (2 * den))"
        " ELSE (2 * num * 10000 + den) DIV (2 * den) END"
    )
    return paa.select(
        "user_id",
        "seg",
        (paa4 / 10000.0 + 0.0).alias("paa"),
        F.when(F.col("m") < -0.6745, "a")
        .when(F.col("m") < 0.0, "b")
        .when(F.col("m") < 0.6745, "c")
        .otherwise("d")
        .alias("symbol"),
    )


@query(
    "ts_matrix_profile", python_boundary=True,
    category="timeseries",
    oracle="""
    WITH arr AS (
      SELECT user_id,
             list(value ORDER BY ts, event_id) AS a,
             COUNT(*) AS n
      FROM events GROUP BY user_id HAVING COUNT(*) BETWEEN 12 AND 100
    ),
    pos AS (
      SELECT user_id, a, n, UNNEST(generate_series(1, n - 7)) AS p
      FROM arr
    ),
    pairs AS (
      SELECT l.user_id, l.p, r.p AS q,
             list_reduce(
               list_transform(generate_series(1, 8),
                 i -> (l.a[l.p + i - 1] - l.a[r.p + i - 1])
                      * (l.a[l.p + i - 1] - l.a[r.p + i - 1])),
               (x, y) -> x + y) AS dist
      FROM pos l JOIN pos r
        ON l.user_id = r.user_id AND abs(r.p - l.p) >= 4
    ),
    ranked AS (
      SELECT user_id, p, q, dist,
             ROW_NUMBER() OVER (PARTITION BY user_id, p
                                ORDER BY dist, q) AS rn
      FROM pairs
    )
    SELECT user_id, p, ROUND(dist, 4) AS profile_dist,
           CAST(q AS BIGINT) AS nearest_pos
    FROM ranked WHERE rn = 1
    """,
)
def ts_matrix_profile(spark, sf_dir):
    """Matrix profile (Yeh et al. 2016, ICDM) — the modern workhorse of
    time-series mining: for every length-8 subsequence of a user's
    series, the squared-L2 distance to its NEAREST other subsequence
    (trivial matches within 4 positions excluded). Low profile values
    are motifs (repeated behavior), high values are discords (the
    series' most anomalous window) — one structure answering both
    queries. Plan shape: ONE shuffle folds each user's bounded series
    (49-88 readings on the fixtures, the ts_theil_sen_slope windowing
    argument) into a sorted array JVM-side (sort_array ∘ collect_list
    over (ts, event_id, value) structs), then the O(n²·m) kernel runs in
    mapInPandas with MANY users per Arrow batch — one Python roundtrip
    per batch, not per group (the per-group applyInPandas shape paid
    ~2 ms of fixed overhead × 1500 tiny groups ≈ 3 s at sf0.1; this
    shape is ~1 s; interpreted Catalyst folds measured 18-22 s).
    Bit-equality with the relational DuckDB oracle holds because numpy's
    axis-sum over the 8-wide window is the same left-to-right IEEE
    addition order as the oracle's list_reduce, and np.argmin's
    first-minimum rule IS the lowest-q tie-break. At 100 TB: the
    quadratic stays inside each bounded per-entity window — exactly how
    production matrix-profile systems shard."""
    import numpy as np

    ev = table(spark, sf_dir, "events")
    series = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias("s")
    )

    def profile_batches(batches):
        for pdf in batches:
            uids, ps, ds, qs = [], [], [], []
            for uid, s in zip(pdf["user_id"], pdf["s"]):
                a = np.array([r["value"] for r in s], dtype="float64")
                n = len(a)
                if not (12 <= n <= 100):
                    continue
                w = np.lib.stride_tricks.sliding_window_view(a, 8)  # (n-7, 8)
                npos = w.shape[0]
                # the sum over the 8-wide last axis is sequential
                # left-to-right in numpy below the pairwise-summation
                # threshold — identical to the oracle's fold order.
                d = ((w[:, None, :] - w[None, :, :]) ** 2).sum(-1)
                idx = np.arange(npos)
                d[np.abs(idx[:, None] - idx[None, :]) < 4] = np.inf
                best_q = d.argmin(1)
                best_d = d[idx, best_q]
                keep = np.isfinite(best_d)
                uids.append(np.full(int(keep.sum()), uid, dtype="int64"))
                ps.append((idx + 1)[keep])
                ds.append(best_d[keep])
                qs.append((best_q + 1)[keep])
            empty = np.array([], dtype="int64")
            yield pd.DataFrame(
                {
                    "user_id": np.concatenate(uids) if uids else empty,
                    "p": np.concatenate(ps) if ps else empty,
                    "profile_dist": np.round(
                        np.concatenate(ds) if ds else np.array([], dtype="float64"), 4
                    ),
                    "nearest_pos": np.concatenate(qs) if qs else empty,
                }
            )

    return series.mapInPandas(
        profile_batches,
        "user_id bigint, p bigint, profile_dist double, nearest_pos bigint",
    )


@query(
    "ts_spectral_dominant_period",
    category="timeseries",
    oracle="""
    WITH e AS (
      SELECT user_id, value,
             (epoch_us(ts) % 86400000000) / 86400000000.0 AS frac
      FROM events
    ),
    terms AS (
      -- quantize each product to integer micro-units with FLOOR (a
      -- deterministic function of the identical double on both engines;
      -- a DECIMAL cast instead ROUNDS, and the 10-dp products land on
      -- exact .0000005 boundaries where cast-rounding modes disagree)
      SELECT e.user_id, f.f,
             CAST(floor(e.value * ROUND(cos(2 * pi() * f.f * e.frac), 8)
                        * 1000000) AS BIGINT) AS tc6,
             CAST(floor(e.value * ROUND(sin(2 * pi() * f.f * e.frac), 8)
                        * 1000000) AS BIGINT) AS ts6
      FROM e CROSS JOIN (SELECT UNNEST(generate_series(1, 6)) AS f) f
    ),
    power AS (
      SELECT user_id, f,
             CAST(SUM(tc6) AS HUGEINT) AS a6,
             CAST(SUM(ts6) AS HUGEINT) AS b6
      FROM terms GROUP BY user_id, f
    ),
    -- square in EXACT integer micro-units (a6²+b6² ≤ ~2e26, needs >64
    -- bits) and round half-up arithmetically: ROUND(double, 2) lands
    -- exactly on a .005 boundary at sf0.1 where engine modes disagree
    ranked AS (
      SELECT user_id, f, a6 * a6 + b6 * b6 AS p2,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY a6 * a6 + b6 * b6 DESC, f ASC) AS rn
      FROM power
    )
    SELECT user_id, f AS dominant_cycles_per_day,
           CAST((p2 + 5000000000) // 10000000000 AS BIGINT) / 100.0 AS power
    FROM ranked WHERE rn = 1
    """,
)
def ts_spectral_dominant_period(spark, sf_dir):
    """Frequency-domain periodicity detection — a fixed-grid discrete
    Fourier probe at 1-6 cycles/day per user: which daily harmonic
    dominates each user's activity (the spectral complement of
    ts_stl_decompose's time-domain seasonal and ts_autocorr_lag1's
    correlation view; for solar telemetry the 1-cycle diurnal harmonic
    is the physical ground truth). Power(f) = (Σ v·cos 2πf·τ)² +
    (Σ v·sin 2πf·τ)² over day-fraction phase τ. The cross-engine
    discipline for TRIG (new for this family): each cos/sin factor is
    quantized ROUND(·, 8) BEFORE multiplying — libm's last ulp can't
    enter — and each per-row product (a deterministic double) is cast
    to DECIMAL(38,6) so the per-(user, f) sums are order-free; only
    then does the (deterministic) square-and-add run in doubles.
    Six-frequency grid ⇒ the cross join is ×6, all map-side
    combinable, one exchange on (user, f); argmax ties break to the
    lower frequency. At 100 TB this is the standard one-pass Goertzel-
    style probe — full FFT needs gather, fixed-grid DFT needs only
    aggregation."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "value",
        ((F.unix_micros("ts") % 86400000000) / F.lit(86400000000.0)).alias("frac"),
    )
    fs = spark.range(1, 7).select(F.col("id").cast("int").alias("f"))
    # quantize each product to integer micro-units with FLOOR — a
    # deterministic function of the identical double on both engines
    # (a DECIMAL cast instead ROUNDS, and the 10-dp products land on
    # exact .0000005 boundaries where cast-rounding modes disagree)
    terms = e.crossJoin(F.broadcast(fs)).select(
        "user_id",
        "f",
        F.floor(
            F.col("value")
            * F.round(F.cos(2 * 3.141592653589793 * F.col("f") * F.col("frac")), 8)
            * 1000000
        ).alias("tc6"),
        F.floor(
            F.col("value")
            * F.round(F.sin(2 * 3.141592653589793 * F.col("f") * F.col("frac")), 8)
            * 1000000
        ).alias("ts6"),
    )
    # square in EXACT integer micro-units (decimal(38,0) holds a6²+b6² ≈
    # 2e26) and round half-up arithmetically — a float ROUND(p, 2) lands
    # exactly on a .005 boundary at sf0.1 where engine modes disagree
    power = terms.groupBy("user_id", "f").agg(
        F.sum("tc6").cast("decimal(38,0)").alias("a6"),
        F.sum("ts6").cast("decimal(38,0)").alias("b6"),
    ).select(
        "user_id", "f", F.expr("a6 * a6 + b6 * b6").alias("p2")
    )
    from pyspark.sql import Window as W

    ranked = power.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id").orderBy(F.col("p2").desc(), F.col("f").asc())
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        "user_id",
        F.col("f").alias("dominant_cycles_per_day"),
        (F.expr("(p2 + 5000000000) div 10000000000") / 100.0).alias("power"),
    )


@query(
    "ts_mann_kendall_trend",
    category="timeseries",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu,
             CAST(ROUND(value * 100) AS BIGINT) AS y,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    b AS (SELECT * FROM e WHERE n BETWEEN 5 AND 100),
    s AS (
      SELECT a.user_id,
             CAST(SUM(CASE WHEN b2.y > a.y THEN 1
                      WHEN b2.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
             COUNT(*) AS n_pairs
      FROM b a JOIN b b2 ON a.user_id = b2.user_id
        AND (a.tu < b2.tu OR (a.tu = b2.tu AND a.event_id < b2.event_id))
      GROUP BY a.user_id
    ),
    nn AS (SELECT user_id, MAX(n) AS n FROM b GROUP BY user_id)
    SELECT s.user_id, nn.n, s.s_stat,
           ROUND((CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                       WHEN s.s_stat < 0 THEN s.s_stat + 1
                       ELSE 0 END)
                 / sqrt(nn.n * (nn.n - 1) * (2 * nn.n + 5) / 18.0), 4) AS z
    FROM s JOIN nn ON nn.user_id = s.user_id
    """,
)
def ts_mann_kendall_trend(spark, sf_dir):
    """Mann–Kendall trend test — the NONPARAMETRIC significance test
    that goes with ts_theil_sen_slope's robust slope (the standard
    pairing in environmental/telemetry monitoring: Sen estimates the
    trend, MK decides if it's real): S = Σ sign(y_j − y_i) over all
    time-ordered pairs, z from the no-ties normal approximation with
    continuity correction. S is an EXACT INTEGER (sign comparisons on
    integer cents — no float anywhere until the final z), the pair
    expansion is bounded by the same 5-100-reading windowing as
    Theil-Sen, and the z denominator is a deterministic double from
    exact n. Ordering ties on (tu, event_id) pins the pair set
    identically on both engines."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tu"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n"),
    ).where(F.col("n").between(5, 100))
    a = e.select("user_id", F.col("tu").alias("tua"),
                 F.col("event_id").alias("ea"), F.col("y").alias("ya"))
    b = e.select("user_id", F.col("tu").alias("tub"),
                 F.col("event_id").alias("eb"), F.col("y").alias("yb"))
    pairs = a.join(b, "user_id").where(
        (F.col("tua") < F.col("tub"))
        | ((F.col("tua") == F.col("tub")) & (F.col("ea") < F.col("eb")))
    )
    s = pairs.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("yb") > F.col("ya"), 1)
            .when(F.col("yb") < F.col("ya"), -1)
            .otherwise(0)
        ).alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    nn = e.groupBy("user_id").agg(F.max("n").alias("n"))
    cc = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    return s.join(nn, "user_id").select(
        "user_id",
        "n",
        "s_stat",
        F.round(
            cc / F.sqrt(F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18.0),
            4,
        ).alias("z"),
    )


@query(
    "ts_peak_detection",
    category="timeseries",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS y,
             LAG(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS yp,
             LEAD(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS yn,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER wb
               // COUNT(*) OVER wb AS base
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             wb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING)
    )
    SELECT user_id, event_id, ts, CAST(y AS DOUBLE) / 100.0 AS value,
           CAST(y - base AS DOUBLE) / 100.0 AS prominence
    FROM s
    WHERE yp IS NOT NULL AND yn IS NOT NULL
      AND y > yp AND y > yn AND y >= 2 * base
    """,
)
def ts_peak_detection(spark, sf_dir):
    """Local-peak detection with a prominence floor — the telemetry
    primitive behind "when did this inverter actually peak" and alert
    deduplication (raw threshold alerts fire on every sample of a
    plateau; peak detection fires once): a sample is a peak iff it
    strictly exceeds both neighbors AND reaches 2× its ±10-sample
    rolling baseline. All comparisons run on integer cents — the
    baseline is an integer FLOOR division of the rolling sum by the
    rolling count (never a double AVG: Spark casts double→long by
    truncation where DuckDB ROUNDS, the classic 0.01 divergence), so
    the peak set and prominences are bit-stable integers.
    Two window specs over the one user_id exchange."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    wb = wo.rowsBetween(-10, 10)
    y = F.round(F.col("value") * 100).cast("long")
    s = ev.select(
        "user_id",
        "event_id",
        "ts",
        y.alias("y"),
        F.lag(y).over(wo).alias("yp"),
        F.lead(y).over(wo).alias("yn"),
        (F.sum(y).over(wb) / F.count(F.lit(1)).over(wb)).cast("long").alias("base"),
    )
    return s.where(
        F.col("yp").isNotNull()
        & F.col("yn").isNotNull()
        & (F.col("y") > F.col("yp"))
        & (F.col("y") > F.col("yn"))
        & (F.col("y") >= 2 * F.col("base"))
    ).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("y").cast("double") / 100.0).alias("value"),
        ((F.col("y") - F.col("base")).cast("double") / 100.0).alias("prominence"),
    )


@query(
    "ts_acf_correlogram",
    category="timeseries",
    oracle="""
    WITH s AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events
    ),
    pairs AS (
      SELECT a.user_id, l.lag, a.y AS ya, b.y AS yb
      FROM s a
      CROSS JOIN (SELECT UNNEST(generate_series(1, 5)) AS lag) l
      JOIN s b ON b.user_id = a.user_id AND b.rn = a.rn + l.lag
    ),
    m AS (
      SELECT user_id, lag, COUNT(*) AS n,
             CAST(SUM(CAST(ya AS DECIMAL(38,0))) AS DOUBLE) AS sa,
             CAST(SUM(CAST(yb AS DECIMAL(38,0))) AS DOUBLE) AS sb,
             CAST(SUM(CAST(ya * yb AS DECIMAL(38,0))) AS DOUBLE) AS sab,
             CAST(SUM(CAST(ya * ya AS DECIMAL(38,0))) AS DOUBLE) AS saa,
             CAST(SUM(CAST(yb * yb AS DECIMAL(38,0))) AS DOUBLE) AS sbb
      FROM pairs GROUP BY user_id, lag
    )
    SELECT user_id, lag, n,
           ROUND((n * sab - sa * sb)
                 / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)), 4) AS acf
    FROM m WHERE n >= 3
    """,
)
def ts_acf_correlogram(spark, sf_dir):
    """The autocorrelation CORRELOGRAM — Pearson r at lags 1-5 per user
    in one result table (ts_autocorr_lag1 gives the single headline
    number; model selection reads the whole decay shape: AR signatures
    decay geometrically, MA cut off sharply, seasonality re-peaks at
    its period — the Box-Jenkins identification step). Lagged pairs
    come from ONE row-number self-join fanned across a broadcast 5-row
    lag grid; all five moment sets accumulate exactly in DECIMAL(38,0)
    from integer cents (the agg_regr_ols discipline), so the r
    arithmetic runs on identical doubles on both engines. One window
    + one join + one grouped aggregate — the lag grid multiplies rows
    5×, all map-side combinable."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    # lagged pairs via LEAD over one window pass — the ts_pacf rewrite
    # (r9): identical pair multiset to the row-number + 5-lag crossJoin +
    # self-join, at one exchange instead of four.
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    yq = F.round(F.col("value") * 100).cast("long")
    base = ev.select("user_id", "ts", "event_id", yq.alias("ya")).select(
        "user_id",
        "ya",
        *[F.lead("ya", k).over(w).alias(f"_l{k}") for k in (1, 2, 3, 4, 5)],
    )
    pairs = base.select(
        "user_id",
        "ya",
        F.expr("stack(5, 1, _l1, 2, _l2, 3, _l3, 4, _l4, 5, _l5) AS (lag, yb)"),
    ).where(F.col("yb").isNotNull())
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    m = pairs.groupBy("user_id", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("ya")).alias("sa"),
        dec(F.col("yb")).alias("sb"),
        dec(F.col("ya") * F.col("yb")).alias("sab"),
        dec(F.col("ya") * F.col("ya")).alias("saa"),
        dec(F.col("yb") * F.col("yb")).alias("sbb"),
    )
    return m.where(F.col("n") >= 3).select(
        "user_id",
        "lag",
        "n",
        F.round(
            (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
            / F.sqrt(
                (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
                * (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
            ),
            4,
        ).alias("acf"),
    )


@query(
    "ts_survival_kaplan_meier",
    category="timeseries",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 3600000000
                  AS BIGINT) AS dur_h,
             MAX(ts) AS last_ts
      FROM events GROUP BY user_id
    ),
    mx AS (SELECT MAX(ts) AS corpus_max FROM events),
    lab AS (
      SELECT u.user_id, u.dur_h,
             CASE WHEN epoch_us(mx.corpus_max) - epoch_us(u.last_ts)
                       < 86400000000 THEN 1 ELSE 0 END AS censored
      FROM u CROSS JOIN mx
    ),
    times AS (
      SELECT dur_h AS t, COUNT(*) AS d
      FROM lab WHERE censored = 0 GROUP BY dur_h
    ),
    risk AS (
      SELECT t.t, t.d,
             (SELECT COUNT(*) FROM lab WHERE dur_h >= t.t) AS n
      FROM times t
    ),
    terms AS (
      SELECT t, d, n,
             CASE WHEN d < n
                  THEN CAST(ROUND(ln(1.0 - d * 1.0 / n) * 100000000) AS BIGINT)
                  ELSE NULL END AS lg8
      FROM risk
    ),
    cum AS (
      SELECT t, d, n,
             SUM(lg8) OVER (ORDER BY t) AS c8,
             MIN(CASE WHEN lg8 IS NULL THEN 0 ELSE 1 END)
               OVER (ORDER BY t) AS alive
      FROM terms
    )
    SELECT t AS duration_hours, d AS n_events, n AS n_at_risk,
           CASE WHEN alive = 0 THEN 0.0
                ELSE ROUND(exp(c8 / 100000000.0), 4) END AS survival
    FROM cum ORDER BY t
    """,
)
def ts_survival_kaplan_meier(spark, sf_dir):
    """Kaplan–Meier survival curve with right-censoring — the retention
    analysis that churn dashboards actually need (naive "average
    lifetime" is biased by users who simply haven't churned YET): each
    user's observed lifetime is last−first event in whole hours, users
    still active within 24 h of the corpus edge are CENSORED (they
    contribute to the at-risk denominators but never count as deaths),
    and S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over observed-death times. The
    product runs in LOG space: each factor's ln is an exact-rational
    input quantized to a 1e8 BIGINT, the cumulative sum is an ordered
    integer window (one tiny |times|-row partition), and exp surfaces
    only once at output under a 4-dp round; a d=n time sends survival
    exactly to 0 via the integer `alive` flag, never through ln(0).
    Three aggregates + one broadcast risk join — all mergeable."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(3600000000)
        )
        .cast("long")
        .alias("dur_h"),
        F.max("ts").alias("last_ts"),
    )
    mx = ev.agg(F.max("ts").alias("corpus_max"))
    lab = u.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "dur_h",
        F.when(
            F.unix_micros("corpus_max") - F.unix_micros("last_ts") < 86400000000,
            1,
        )
        .otherwise(0)
        .alias("censored"),
    )
    times = (
        lab.where(F.col("censored") == 0)
        .groupBy(F.col("dur_h").alias("t"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    risk = times.crossJoin(
        lab.select(F.col("dur_h").alias("dh"))
    ).where(F.col("dh") >= F.col("t")).groupBy("t", "d").agg(
        F.count(F.lit(1)).alias("n")
    )
    terms = risk.select(
        "t",
        "d",
        "n",
        F.when(
            F.col("d") < F.col("n"),
            F.round(F.log(1.0 - F.col("d") * 1.0 / F.col("n")) * 100000000).cast(
                "long"
            ),
        ).alias("lg8"),
    )
    wot = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = terms.select(
        "t",
        "d",
        "n",
        F.sum("lg8").over(wot).alias("c8"),
        F.min(F.when(F.col("lg8").isNull(), 0).otherwise(1)).over(wot).alias("alive"),
    )
    return cum.select(
        F.col("t").alias("duration_hours"),
        F.col("d").alias("n_events"),
        F.col("n").alias("n_at_risk"),
        F.when(F.col("alive") == 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("c8") / 100000000.0), 4))
        .alias("survival"),
    ).orderBy("duration_hours")


@query(
    "ts_cross_signal_corr",
    category="timeseries",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.h, a.v AS xc, b.v AS xv
      FROM hourly a JOIN hourly b
        ON a.h = b.h AND a.event_type = 'click' AND b.event_type = 'view'
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(xv AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xc * xv AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xc * xc AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(xv * xv AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM paired
    )
    SELECT n AS n_hours,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
             AS click_view_corr
    FROM m
    """,
)
def ts_cross_signal_corr(spark, sf_dir):
    """CROSS-SIGNAL correlation — Pearson r between two event streams'
    hourly totals (click vs view): the monitoring primitive for "these
    two metrics should move together" alerting (a correlation break
    between coupled signals flags instrumentation loss or behavior
    shifts before either signal's own threshold fires — the
    cross-stream complement of ts_autocorr's within-stream view).
    Hourly totals are exact integer cents; co-registered hours come
    from one equi-join on the truncated hour; the five moments
    accumulate in DECIMAL(38,0) so r is bit-equal before the round.
    Two aggregates + one tiny join — mergeable state at any scale."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"), "event_type")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"))
    )
    a = hourly.where(F.col("event_type") == "click").select(
        "h", F.col("v").alias("xc")
    )
    b = hourly.where(F.col("event_type") == "view").select(
        "h", F.col("v").alias("xv")
    )
    paired = a.join(b, "h")
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    x, y = F.col("xc"), F.col("xv")
    m = paired.agg(
        F.count(F.lit(1)).alias("n"),
        dec(x).alias("sx"),
        dec(y).alias("sy"),
        dec(x * y).alias("sxy"),
        dec(x * x).alias("sxx"),
        dec(y * y).alias("syy"),
    )
    return m.select(
        F.col("n").alias("n_hours"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            4,
        ).alias("click_view_corr"),
    )


@query(
    "ts_uptime_sla",
    category="timeseries",
    oracle="""
    WITH span AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
      FROM events
    ),
    active AS (
      SELECT user_id, COUNT(DISTINCT date_trunc('hour', ts)) AS up_hours
      FROM events GROUP BY user_id
    ),
    total AS (
      SELECT CAST((epoch_us(h1) - epoch_us(h0)) // 3600000000 AS BIGINT) + 1
               AS total_hours
      FROM span
    )
    SELECT a.user_id, a.up_hours, t.total_hours,
           a.up_hours * 1000000 // t.total_hours AS uptime_e6,
           CASE WHEN a.up_hours * 1000 >= t.total_hours * 999 THEN 1 ELSE 0 END
             AS meets_three_nines
    FROM active a CROSS JOIN total t
    ORDER BY a.user_id
    """,
)
def ts_uptime_sla(spark, sf_dir):
    """Uptime / SLA attainment — fraction of the corpus's hour-buckets
    in which each source reported at least once, against a 99.9% target
    (the reference's operational question verbatim: an inverter that
    misses poll hours is a dead stick or a dead link,
    solarman.py:314-331's reconnect loop exists precisely because this
    number matters). DISTINCT active hours per source over the global
    hour span, uptime as an integer 1e6 ratio, and the three-nines
    verdict as integer cross-multiplication (up·1000 ≥ total·999 — no
    float SLA arithmetic, where 0.999 is famously unrepresentable).
    One count-distinct per source + a broadcast 1-row span."""
    ev = table(spark, sf_dir, "events")
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    active = ev.groupBy("user_id").agg(
        F.countDistinct(F.date_trunc("hour", F.col("ts"))).alias("up_hours")
    )
    total = span.select(
        (
            F.expr("CAST((unix_micros(h1) - unix_micros(h0)) div 3600000000 AS BIGINT)")
            + 1
        ).alias("total_hours")
    )
    return (
        active.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "up_hours",
            "total_hours",
            F.expr("up_hours * 1000000 div total_hours").alias("uptime_e6"),
            F.when(
                F.col("up_hours") * 1000 >= F.col("total_hours") * 999, 1
            )
            .otherwise(0)
            .alias("meets_three_nines"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_token_bucket_admission",
    category="timeseries",
    oracle="""
    WITH s AS (
      SELECT user_id,
             list(epoch_us(ts) ORDER BY ts, event_id) AS t,
             list(event_id ORDER BY ts, event_id) AS ids
      FROM events GROUP BY user_id
    ),
    sim AS (
      SELECT user_id, ids, t,
             list_reduce(
               list_prepend([CAST(10 * 60000000 AS BIGINT), t[1], 0],
                 list_transform(generate_series(1, len(t)),
                                i -> [t[i], 0, 0])),
               (st, x) -> CASE
                 WHEN LEAST(CAST(600000000 AS BIGINT),
                            st[1] + (x[1] - st[2])) >= 60000000
                 THEN [LEAST(CAST(600000000 AS BIGINT),
                             st[1] + (x[1] - st[2])) - 60000000,
                       x[1], st[3] + 1]
                 ELSE [LEAST(CAST(600000000 AS BIGINT),
                             st[1] + (x[1] - st[2])),
                       x[1], st[3]]
               END) AS fin
      FROM s
    )
    SELECT user_id, len(t) AS n_requests,
           CAST(fin[3] AS BIGINT) AS n_admitted,
           len(t) - CAST(fin[3] AS BIGINT) AS n_rejected
    FROM sim ORDER BY user_id
    """,
)
def ts_token_bucket_admission(spark, sf_dir):
    """Token-bucket rate limiting SIMULATED over the event history — the
    capacity-planning question every API gateway answers before
    changing limits ("how many of last month's requests would a
    10-burst / 1-per-minute policy have rejected?"): capacity 10
    tokens, refill 1/minute (carried in token-MICROunits — 1 token =
    60 000 000 µs of refill — so ALL state stays integer), one token
    per admitted request. The bucket recursion has no prefix identity,
    so it runs as a sequential [tokens_µ, last_ts, admitted] list fold
    over each user's time-ordered request list (the ts_holt/ts_kalman
    discipline — but pure INTEGER state, so not even fold-order bit
    equality is needed: the arithmetic is exact). DuckDB's
    list_prepend seeding carries the full-bucket initial state. One
    per-user collect — bounded series, one exchange."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id))),"
            " x -> unix_micros(x.ts))"
        ).alias("t")
    )
    fold = F.expr(
        """
        aggregate(
          transform(t, x -> x),
          array(CAST(600000000 AS BIGINT), element_at(t, 1), CAST(0 AS BIGINT)),
          (st, x) -> CASE
            WHEN LEAST(CAST(600000000 AS BIGINT),
                       element_at(st, 1) + (x - element_at(st, 2)))
                 >= CAST(60000000 AS BIGINT)
            THEN array(LEAST(CAST(600000000 AS BIGINT),
                             element_at(st, 1) + (x - element_at(st, 2)))
                       - CAST(60000000 AS BIGINT),
                       x, element_at(st, 3) + CAST(1 AS BIGINT))
            ELSE array(LEAST(CAST(600000000 AS BIGINT),
                             element_at(st, 1) + (x - element_at(st, 2))),
                       x, element_at(st, 3))
          END)
        """
    )
    sim = s.select("user_id", F.size("t").alias("n_requests"), fold.alias("fin"))
    return sim.select(
        "user_id",
        "n_requests",
        F.element_at("fin", 3).alias("n_admitted"),
        (F.col("n_requests") - F.element_at("fin", 3)).alias("n_rejected"),
    ).orderBy("user_id")


@query(
    "ts_holt_winters_additive",
    category="timeseries",
    oracle="""
    WITH ar AS (
      SELECT user_id, event_id, ts,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS a
      FROM events
    ),
    st AS (
      SELECT user_id, event_id, ts,
             list_reduce(
               list_transform(a, x -> [x, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0]),
               (acc, x) -> [
                 0.3 * (x[1] - acc[4 + (CAST(acc[3] AS INTEGER) % 4)])
                   + 0.7 * (acc[1] + acc[2]),
                 0.1 * (0.3 * (x[1] - acc[4 + (CAST(acc[3] AS INTEGER) % 4)])
                          + 0.7 * (acc[1] + acc[2]) - acc[1])
                   + 0.9 * acc[2],
                 acc[3] + 1.0,
                 CASE WHEN CAST(acc[3] AS INTEGER) % 4 = 0
                      THEN 0.2 * (x[1]
                             - (0.3 * (x[1] - acc[4])
                                + 0.7 * (acc[1] + acc[2])))
                           + 0.8 * acc[4]
                      ELSE acc[4] END,
                 CASE WHEN CAST(acc[3] AS INTEGER) % 4 = 1
                      THEN 0.2 * (x[1]
                             - (0.3 * (x[1] - acc[5])
                                + 0.7 * (acc[1] + acc[2])))
                           + 0.8 * acc[5]
                      ELSE acc[5] END,
                 CASE WHEN CAST(acc[3] AS INTEGER) % 4 = 2
                      THEN 0.2 * (x[1]
                             - (0.3 * (x[1] - acc[6])
                                + 0.7 * (acc[1] + acc[2])))
                           + 0.8 * acc[6]
                      ELSE acc[6] END,
                 CASE WHEN CAST(acc[3] AS INTEGER) % 4 = 3
                      THEN 0.2 * (x[1]
                             - (0.3 * (x[1] - acc[7])
                                + 0.7 * (acc[1] + acc[2])))
                           + 0.8 * acc[7]
                      ELSE acc[7] END
               ]) AS hw
      FROM ar
    )
    -- floor-based half-up quantization instead of ROUND: the smoothed
    -- states are free doubles that can land exactly on .00005 where
    -- engine ROUND modes diverge (measured at sf0.01); floor(x*1e4+0.5)
    -- is the identical IEEE dataflow on both engines
    SELECT user_id, event_id, ts,
           floor(hw[1] * 10000 + 0.5) / 10000.0 + 0.0 AS level,
           floor(hw[2] * 10000 + 0.5) / 10000.0 + 0.0 AS trend,
           floor((hw[1] + 4 * hw[2]
                  + hw[4 + ((CAST(hw[3] AS INTEGER) + 3) % 4)])
                 * 10000 + 0.5) / 10000.0 + 0.0 AS forecast_4
    FROM st
    """,
)
def ts_holt_winters_additive(spark, sf_dir):
    """Holt-Winters ADDITIVE triple exponential smoothing (alpha=0.3,
    beta=0.1, gamma=0.2, season m=4) over each reading's trailing
    20-sample window, plus the one-full-season-ahead forecast
    l + 4b + s_phase — the seasonal tier above ts_holt_forecast (a
    daily-cycling inverter's output needs the seasonal index; a pure
    trend model lags every morning ramp). The coupled
    level/trend/seasonal recursion is a SEQUENTIAL left fold with a
    7-component [l, b, k, s0..s3] list accumulator: k counts processed
    samples so the phase (k mod 4) is derivable inside the fold, and
    the one seasonal slot at the current phase updates while the
    other three carry (list elements all evaluate against the OLD
    state on both engines — the LIST-accumulator discipline). Spark's
    F.aggregate and DuckDB's list_reduce add in the identical order on
    identical doubles, so the floats are bit-equal before the 4-dp
    round (ts_ema_bounded / ts_holt_forecast discipline). Bounded
    frame = bounded state: O(20) per row at any corpus size; the only
    exchange is the per-user window shuffle."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    ar = ev.select(
        "user_id", "event_id", "ts", F.collect_list("value").over(w).alias("a")
    )
    a = F.col("a")

    def phase(acc):
        return F.element_at(acc, 3).cast("int") % 4

    def s_cur(acc):
        return F.element_at(acc, phase(acc) + F.lit(4))

    def new_l(acc, x):
        return F.lit(0.3) * (x - s_cur(acc)) + F.lit(0.7) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )

    # The fold step references new_l SIX times (level, trend, all four
    # seasonal slots) — bound once per step via _bind, the interpreted
    # step tree shrinks ~4x with a bit-identical float path (each
    # reference reads the once-computed value the duplicated trees used
    # to recompute). Oracle unchanged — DuckDB's list_reduce inlines the
    # same value by copy, and equal expressions give equal doubles.
    def step(acc, x):
        def with_nl(nl):
            def s_slot(i):
                upd = F.lit(0.2) * (x - nl) + F.lit(0.8) * F.element_at(
                    acc, i + 4
                )
                return F.when(phase(acc) == i, upd).otherwise(
                    F.element_at(acc, i + 4)
                )

            return F.array(
                nl,
                F.lit(0.1) * (nl - F.element_at(acc, 1))
                + F.lit(0.9) * F.element_at(acc, 2),
                F.element_at(acc, 3) + F.lit(1.0),
                s_slot(0),
                s_slot(1),
                s_slot(2),
                s_slot(3),
            )

        return _bind(new_l(acc, x), with_nl)

    hw = F.aggregate(
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))),
        F.array(
            F.element_at(a, 1),
            F.lit(0.0),
            F.lit(1.0),
            F.lit(0.0),
            F.lit(0.0),
            F.lit(0.0),
            F.lit(0.0),
        ),
        step,
    )
    st = ar.select("user_id", "event_id", "ts", hw.alias("hw"))
    fc_phase = (F.element_at("hw", 3).cast("int") + 3) % 4
    def q4(c):
        # floor-based half-up to 4 dp (see oracle comment): identical
        # IEEE ops on both engines, immune to the ROUND-mode divergence
        return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0) + F.lit(0.0)

    return st.select(
        "user_id",
        "event_id",
        "ts",
        q4(F.element_at("hw", 1)).alias("level"),
        q4(F.element_at("hw", 2)).alias("trend"),
        q4(
            F.element_at("hw", 1)
            + F.lit(4.0) * F.element_at("hw", 2)
            + F.element_at(F.col("hw"), fc_phase + F.lit(4))
        ).alias("forecast_4"),
    )


@query(
    "ts_bollinger_breakouts",
    category="timeseries",
    oracle="""
    WITH q AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS qv
      FROM events
    ),
    w AS (
      SELECT user_id, event_id, qv,
             COUNT(*) OVER fr AS n,
             SUM(qv) OVER fr AS s,
             SUM(qv * qv) OVER fr AS ss
      FROM q
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    f AS (
      SELECT user_id,
             CASE WHEN n = 20 AND qv * n - s > 0
                       AND (qv * n - s) * (qv * n - s) > 4 * (n * ss - s * s)
                  THEN 1 ELSE 0 END AS up,
             CASE WHEN n = 20 AND qv * n - s < 0
                       AND (qv * n - s) * (qv * n - s) > 4 * (n * ss - s * s)
                  THEN 1 ELSE 0 END AS down,
             CASE WHEN n = 20 THEN 1 ELSE 0 END AS scored
      FROM w
    )
    SELECT user_id, CAST(SUM(scored) AS BIGINT) AS n_scored,
           CAST(SUM(up) AS BIGINT) AS n_breakout_up,
           CAST(SUM(down) AS BIGINT) AS n_breakout_down,
           CAST(CASE WHEN SUM(scored) = 0 THEN 0
                ELSE ((SUM(up) + SUM(down)) * 1000000) // SUM(scored) END
             AS BIGINT) AS breakout_ppm
    FROM f GROUP BY user_id ORDER BY user_id
    """,
)
def ts_bollinger_breakouts(spark, sf_dir):
    """Bollinger-band breakout detection per user signal: how many
    points land outside mean ± 2σ of their own trailing 20-point
    window (full windows only) — the classic volatility-band monitor
    for gauge channels. INTEGER-EXACT throughout, no sqrt and no float
    variance: values quantize to cents (floor(v·100)), the rolling
    window carries (n, Σq, Σq²) as BIGINT window sums over a uniquely
    ordered ROWS frame ((ts, event_id) — event_id is unique, so both
    engines see the identical frame), and the 2σ test is the SQUARED
    comparison (q·n − Σq)² > 4·(n·Σq² − Σq²)  ⟺  |q − mean| > 2σ,
    which needs only int64 (|q| ≤ 6e4, n = 20 ⇒ the square ≤ ~1.3e12).
    One shuffle on user_id serves the window AND the final per-user
    rollup (same partitioning, exchange reuse); output is users-sized.
    At 100 TB the frame is per-key-local state in a single window pass
    — no self-join, no range explosion; breakout_ppm is flooring
    integer division on a non-negative domain (Spark DIV ≡ DuckDB //)."""
    ev = table(spark, sf_dir, "events")
    q = ev.select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("qv"),
    )
    fr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, W.currentRow)
    )
    w = q.select(
        "user_id", "qv",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("qv").over(fr).alias("s"),
        F.sum(F.col("qv") * F.col("qv")).over(fr).alias("ss"),
    )
    dev = F.col("qv") * F.col("n") - F.col("s")
    var4 = 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    out = dev * dev > var4
    full = F.col("n") == 20
    f = w.select(
        "user_id",
        F.when(full & (dev > 0) & out, 1).otherwise(0).alias("up"),
        F.when(full & (dev < 0) & out, 1).otherwise(0).alias("down"),
        F.when(full, 1).otherwise(0).alias("scored"),
    )
    return (
        f.groupBy("user_id")
        .agg(
            F.sum("scored").alias("n_scored"),
            F.sum("up").alias("n_breakout_up"),
            F.sum("down").alias("n_breakout_down"),
            F.expr(
                "CASE WHEN SUM(scored) = 0 THEN 0"
                " ELSE ((SUM(up) + SUM(down)) * 1000000) DIV SUM(scored) END"
            ).alias("breakout_ppm"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_rsi_regimes",
    category="timeseries",
    oracle="""
    WITH q AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS qv
      FROM events
    ),
    d AS (
      SELECT user_id, ts, event_id,
             qv - LAG(qv) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS diff
      FROM q
    ),
    w AS (
      SELECT user_id, ts, event_id,
             COUNT(diff) OVER fr AS n,
             SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END) OVER fr AS g,
             SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END) OVER fr AS l
      FROM d
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    f AS (
      SELECT user_id, ts, event_id, g, l,
             CASE WHEN n = 14 THEN 1 ELSE 0 END AS scored,
             CASE WHEN n = 14 AND 3 * g > 7 * l THEN 1 ELSE 0 END AS hot,
             CASE WHEN n = 14 AND 7 * g < 3 * l THEN 1 ELSE 0 END AS cold,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM w
    )
    SELECT user_id, CAST(SUM(scored) AS BIGINT) AS n_scored,
           CAST(SUM(hot) AS BIGINT) AS n_overbought,
           CAST(SUM(cold) AS BIGINT) AS n_oversold,
           CAST(MAX(CASE WHEN rn = 1 AND scored = 1 AND g + l > 0
                         THEN g * 1000000 // (g + l) END) AS BIGINT)
             AS last_rsi_e4
    FROM f GROUP BY user_id ORDER BY user_id
    """,
)
def ts_rsi_regimes(spark, sf_dir):
    """RSI-14 regime counter per user signal (simple-average Wilder
    variant): how many points sit in the overbought (RSI>70) and
    oversold (RSI<30) regimes, plus the latest RSI — the
    momentum-regime monitor over gauge channels. INTEGER-EXACT with no
    division in the hot path: values quantize to cents, per-step
    diffs split into gain/loss, a 14-row ROWS frame (uniquely ordered
    by (ts, event_id)) carries BIGINT gain/loss sums, and the regime
    tests are cross-multiplications — RSI>70 ⟺ 100g > 70(g+l) ⟺
    3g > 7l, RSI<30 ⟺ 7g < 3l. Only the reported last_rsi_e4 divides
    (flooring, non-negative domain). The lag diff, the rolling frame,
    the last-point row_number, and the final rollup all share ONE
    user_id partitioning — a single exchange feeds four window passes
    and the groupBy (exchange reuse); output is users-sized. Full
    windows only (n = 14 non-null diffs), so warmup rows never skew
    the regime counts."""
    ev = table(spark, sf_dir, "events")
    q = ev.select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("qv"),
    )
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = q.select(
        "user_id", "ts", "event_id",
        (F.col("qv") - F.lag("qv").over(ow)).alias("diff"),
    )
    fr = ow.rowsBetween(-13, W.currentRow)
    w = d.select(
        "user_id", "ts", "event_id",
        F.count("diff").over(fr).alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("diff")).otherwise(0)).over(fr).alias("g"),
        F.sum(F.when(F.col("diff") < 0, -F.col("diff")).otherwise(0)).over(fr).alias("l"),
    )
    full = F.col("n") == 14
    f = w.select(
        "user_id", "g", "l",
        F.when(full, 1).otherwise(0).alias("scored"),
        F.when(full & (3 * F.col("g") > 7 * F.col("l")), 1).otherwise(0).alias("hot"),
        F.when(full & (7 * F.col("g") < 3 * F.col("l")), 1).otherwise(0).alias("cold"),
        F.row_number().over(
            W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        ).alias("rn"),
    )
    return (
        f.groupBy("user_id")
        .agg(
            F.sum("scored").alias("n_scored"),
            F.sum("hot").alias("n_overbought"),
            F.sum("cold").alias("n_oversold"),
            F.max(
                F.when(
                    (F.col("rn") == 1) & (F.col("scored") == 1) & (F.col("g") + F.col("l") > 0),
                    F.expr("g * 1000000 DIV (g + l)"),
                )
            ).alias("last_rsi_e4"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_pacf_durbin_levinson",
    category="timeseries",
    oracle="""
    WITH s AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events
    ),
    pairs AS (
      SELECT a.user_id, l.lag, a.y AS ya, b.y AS yb
      FROM s a
      CROSS JOIN (SELECT UNNEST(generate_series(1, 3)) AS lag) l
      JOIN s b ON b.user_id = a.user_id AND b.rn = a.rn + l.lag
    ),
    m AS (
      SELECT user_id, lag, COUNT(*) AS n,
             CAST(SUM(CAST(ya AS DECIMAL(38,0))) AS DOUBLE) AS sa,
             CAST(SUM(CAST(yb AS DECIMAL(38,0))) AS DOUBLE) AS sb,
             CAST(SUM(CAST(ya * yb AS DECIMAL(38,0))) AS DOUBLE) AS sab,
             CAST(SUM(CAST(ya * ya AS DECIMAL(38,0))) AS DOUBLE) AS saa,
             CAST(SUM(CAST(yb * yb AS DECIMAL(38,0))) AS DOUBLE) AS sbb
      FROM pairs GROUP BY user_id, lag
    ),
    acf AS (
      SELECT user_id, lag,
             (n * sab - sa * sb)
               / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)) AS r
      FROM m WHERE n >= 3
    ),
    piv AS (
      SELECT user_id,
             MAX(CASE WHEN lag = 1 THEN r END) AS r1,
             MAX(CASE WHEN lag = 2 THEN r END) AS r2,
             MAX(CASE WHEN lag = 3 THEN r END) AS r3
      FROM acf GROUP BY user_id
      HAVING COUNT(*) = 3
    ),
    dl AS (
      SELECT user_id, r1, r2, r3,
             (r2 - r1 * r1) / NULLIF(1 - r1 * r1, 0) AS p22
      FROM piv
    ),
    dl2 AS (
      SELECT user_id, r1, r2, r3, p22,
             r1 * (1 - p22) AS p21
      FROM dl
    )
    SELECT user_id,
           ROUND(r1, 4) AS pacf1,
           ROUND(p22, 4) AS pacf2,
           ROUND((r3 - p21 * r2 - p22 * r1)
                 / NULLIF(1 - p21 * r1 - p22 * r2, 0), 4) AS pacf3
    FROM dl2 ORDER BY user_id
    """,
)
def ts_pacf_durbin_levinson(spark, sf_dir):
    """Partial autocorrelation at lags 1-3 per user signal via the
    Durbin-Levinson recursion over the pairs-Pearson correlogram — the
    other half of Box-Jenkins identification (AR order shows as a PACF
    cutoff where ts_acf_correlogram shows decay). Estimator contract:
    r_k is the SAME lagged-pairs Pearson the correlogram query emits
    (each lag has its own pair means — the finite-sample variant), and
    the recursion is applied to those r's: phi11 = r1, phi22 =
    (r2 - r1^2)/(1 - r1^2), phi33 = (r3 - phi21*r2 - phi22*r1) /
    (1 - phi21*r1 - phi22*r2) with phi21 = r1*(1 - phi22). All moment
    sums accumulate exactly in DECIMAL(38,0) from integer cents, so
    both engines feed IDENTICAL doubles into the identical scalar
    recursion — deterministic to the last bit, rounded once at 4 dp
    (the acf discipline). The lag grid is a broadcast 3-row frame; one
    row-number window, one self-join, one grouped aggregate, then a
    per-user 3-way conditional pivot (users-sized, no second pass over
    events). Degenerate denominators surface as NULL (NULLIF), never
    as engine-divergent infinities."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    # lagged pairs via LEAD over one per-user window pass (r9
    # optimization): the earlier row_number + 3-lag crossJoin + self-join
    # shuffled the event stream four times (window exchange, 3x-exploded
    # probe side, build side, join) to pair y_t with y_{t+k} — but that
    # pair set IS lead(y, k) by definition. Identical pair multiset
    # (lead is NULL exactly where the join found no partner), identical
    # decimal moment sums, one exchange total.
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    yq = F.round(F.col("value") * 100).cast("long")
    base = ev.select("user_id", "ts", "event_id", yq.alias("ya")).select(
        "user_id",
        "ya",
        *[F.lead("ya", k).over(w).alias(f"_l{k}") for k in (1, 2, 3)],
    )
    pairs = base.select(
        "user_id",
        "ya",
        F.expr("stack(3, 1, _l1, 2, _l2, 3, _l3) AS (lag, yb)"),
    ).where(F.col("yb").isNotNull())
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    m = pairs.groupBy("user_id", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("ya")).alias("sa"),
        dec(F.col("yb")).alias("sb"),
        dec(F.col("ya") * F.col("yb")).alias("sab"),
        dec(F.col("ya") * F.col("ya")).alias("saa"),
        dec(F.col("yb") * F.col("yb")).alias("sbb"),
    )
    r = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")) / F.sqrt(
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
        * (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
    )
    acf = m.where(F.col("n") >= 3).select("user_id", "lag", r.alias("r"))
    piv = (
        acf.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("lag") == 1, F.col("r"))).alias("r1"),
            F.max(F.when(F.col("lag") == 2, F.col("r"))).alias("r2"),
            F.max(F.when(F.col("lag") == 3, F.col("r"))).alias("r3"),
            F.count(F.lit(1)).alias("nl"),
        )
        .where(F.col("nl") == 3)
    )
    p22 = (F.col("r2") - F.col("r1") * F.col("r1")) / F.nullif(
        F.lit(1.0) - F.col("r1") * F.col("r1"), F.lit(0.0)
    )
    dl = piv.select("user_id", "r1", "r2", "r3", p22.alias("p22"))
    dl2 = dl.withColumn("p21", F.col("r1") * (F.lit(1.0) - F.col("p22")))
    pacf3 = (
        F.col("r3") - F.col("p21") * F.col("r2") - F.col("p22") * F.col("r1")
    ) / F.nullif(
        F.lit(1.0) - F.col("p21") * F.col("r1") - F.col("p22") * F.col("r2"),
        F.lit(0.0),
    )
    return dl2.select(
        "user_id",
        F.round("r1", 4).alias("pacf1"),
        F.round("p22", 4).alias("pacf2"),
        F.round(pacf3, 4).alias("pacf3"),
    ).orderBy("user_id")


@query(
    "ts_smape_naive_baseline",
    category="timeseries",
    oracle="""
    WITH q AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS y
      FROM events
    ),
    d AS (
      SELECT user_id, y,
             LAG(y) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS yhat
      FROM q
    ),
    t AS (
      SELECT user_id,
             ABS(y - yhat) AS ae,
             CASE WHEN ABS(y) + ABS(yhat) = 0 THEN 0
                  ELSE 2000000000 * ABS(y - yhat) // (ABS(y) + ABS(yhat)) END
               AS smape_e9
      FROM d WHERE yhat IS NOT NULL
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(smape_e9) // COUNT(*) AS BIGINT) AS smape_e9,
           CAST(SUM(ae) // COUNT(*) AS BIGINT) AS mae_cents
    FROM t GROUP BY user_id ORDER BY user_id
    """,
)
def ts_smape_naive_baseline(spark, sf_dir):
    """SMAPE and MAE of the lag-1 naive forecast per user signal — the
    baseline every forecasting claim must beat (MASE's denominator;
    ts_holt_forecast and ts_seasonal_naive_forecast report predictions,
    this reports the floor under them). ORDER-FREE integer estimator:
    each point contributes a flooring milli-ratio
    2e9·|y−ŷ| // (|y|+|ŷ|) as BIGINT (the doc_ngram_entropy_rate
    quantize-before-the-big-sum discipline — a float SMAPE mean over a
    per-user point set would be summation-order dependent), and the
    per-user mean is a flooring integer division of exact sums;
    zero-denominator points contribute 0 by definition. |y| ≤ 6e4
    cents keeps 2e9·|Δ| inside int64. One user_id exchange feeds the
    lag window and the rollup (exchange reuse); output is users-sized."""
    ev = table(spark, sf_dir, "events")
    q = ev.select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("y"),
    )
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = q.select("user_id", "y", F.lag("y").over(ow).alias("yhat")).where(
        F.col("yhat").isNotNull()
    )
    t = d.select(
        "user_id",
        F.abs(F.col("y") - F.col("yhat")).alias("ae"),
        F.expr(
            "CASE WHEN ABS(y) + ABS(yhat) = 0 THEN 0L"
            " ELSE 2000000000L * ABS(y - yhat) DIV (ABS(y) + ABS(yhat)) END"
        ).alias("smape_e9"),
    )
    return (
        t.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.expr("SUM(smape_e9) DIV COUNT(*)").alias("smape_e9"),
            F.expr("SUM(ae) DIV COUNT(*)").alias("mae_cents"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_ljung_box_whiteness",
    category="timeseries",
    oracle="""
    WITH s AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events
    ),
    nn AS (SELECT user_id, COUNT(*) AS n FROM s GROUP BY user_id),
    pairs AS (
      SELECT a.user_id, l.lag, a.y AS ya, b.y AS yb
      FROM s a
      CROSS JOIN (SELECT UNNEST(generate_series(1, 5)) AS lag) l
      JOIN s b ON b.user_id = a.user_id AND b.rn = a.rn + l.lag
    ),
    m AS (
      SELECT user_id, lag, COUNT(*) AS np,
             CAST(SUM(CAST(ya AS DECIMAL(38,0))) AS DOUBLE) AS sa,
             CAST(SUM(CAST(yb AS DECIMAL(38,0))) AS DOUBLE) AS sb,
             CAST(SUM(CAST(ya * yb AS DECIMAL(38,0))) AS DOUBLE) AS sab,
             CAST(SUM(CAST(ya * ya AS DECIMAL(38,0))) AS DOUBLE) AS saa,
             CAST(SUM(CAST(yb * yb AS DECIMAL(38,0))) AS DOUBLE) AS sbb
      FROM pairs GROUP BY user_id, lag
    ),
    acf AS (
      SELECT user_id, lag,
             (np * sab - sa * sb)
               / sqrt((np * saa - sa * sa) * (np * sbb - sb * sb)) AS r
      FROM m WHERE np >= 3
    ),
    q AS (
      SELECT a.user_id, nn.n,
             SUM(a.r * a.r / (nn.n - a.lag)) AS acc,
             COUNT(*) AS n_lags
      FROM acf a JOIN nn ON nn.user_id = a.user_id
      GROUP BY a.user_id, nn.n
      HAVING COUNT(*) = 5
    )
    SELECT user_id, CAST(n AS BIGINT) AS n,
           ROUND(n * (n + 2) * acc, 4) + 0.0 AS q_stat,
           CAST(ROUND(n * (n + 2) * acc, 4) > 11.0705 AS BOOLEAN)
             AS reject_white_noise
    FROM q ORDER BY user_id
    """,
)
def ts_ljung_box_whiteness(spark, sf_dir):
    """Ljung-Box portmanteau whiteness test per user signal: Q =
    n(n+2)·Σ_{k=1..5} r_k²/(n−k), flagged against the χ²(5) 95 %
    critical value 11.0705 — the residual-diagnostics stamp that
    belongs after every forecasting query (a model whose residuals
    fail Ljung-Box is underfit regardless of its SMAPE). Reuses the
    correlogram machinery: lagged-pairs Pearson r_k from exact
    DECIMAL(38,0) moments (the ts_acf_correlogram discipline — both
    engines feed identical doubles), then Q accumulates over a FIXED
    5-term set (order-free: 5 terms, each a deterministic scalar; the
    SUM is grouped per user over exactly 5 rows — within the safe
    small-sum class ch_entropy established). Comparison against the
    critical value happens on the 4-dp ROUNDED statistic so the
    boolean can never straddle an unrounded boundary. One self-join
    against a broadcast 5-row lag grid + two grouped aggregates; output
    is users-sized."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    nn = s.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    lags = spark.range(1, 6).select(F.col("id").cast("int").alias("lag"))
    a = s.crossJoin(F.broadcast(lags)).select(
        "user_id", "lag", (F.col("rn") + F.col("lag")).alias("rnb"),
        F.col("y").alias("ya"),
    )
    b = s.select("user_id", F.col("rn").alias("rnb"), F.col("y").alias("yb"))
    pairs = a.join(b, ["user_id", "rnb"])
    dec = lambda c: F.sum(c.cast(T.DecimalType(38, 0))).cast("double")
    m = pairs.groupBy("user_id", "lag").agg(
        F.count(F.lit(1)).alias("np"),
        dec(F.col("ya")).alias("sa"),
        dec(F.col("yb")).alias("sb"),
        dec(F.col("ya") * F.col("yb")).alias("sab"),
        dec(F.col("ya") * F.col("ya")).alias("saa"),
        dec(F.col("yb") * F.col("yb")).alias("sbb"),
    )
    r = (F.col("np") * F.col("sab") - F.col("sa") * F.col("sb")) / F.sqrt(
        (F.col("np") * F.col("saa") - F.col("sa") * F.col("sa"))
        * (F.col("np") * F.col("sbb") - F.col("sb") * F.col("sb"))
    )
    acf = m.where(F.col("np") >= 3).select("user_id", "lag", r.alias("r"))
    qacc = (
        acf.join(F.broadcast(nn), "user_id")
        .groupBy("user_id", "n")
        .agg(
            F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))).alias("acc"),
            F.count(F.lit(1)).alias("n_lags"),
        )
        .where(F.col("n_lags") == 5)
    )
    qstat = F.round(F.col("n") * (F.col("n") + 2) * F.col("acc"), 4) + F.lit(0.0)
    return qacc.select(
        "user_id", "n",
        qstat.alias("q_stat"),
        (qstat > 11.0705).alias("reject_white_noise"),
    ).orderBy("user_id")


def _stl_strength_oracle() -> str:
    """Compose the proven-exact ts_stl_decompose oracle as a subquery;
    strengths from exact integer moments of the e4-quantized components."""
    from .registry import REGISTRY

    stl = REGISTRY["ts_stl_decompose"].oracle
    return f"""
    WITH comp AS (
      SELECT user_id,
             CAST(ROUND(seasonal * 10000) AS BIGINT) AS qs,
             CAST(ROUND(residual * 10000) AS BIGINT) AS qr,
             CAST(ROUND(trend * 10000) AS BIGINT) AS qt
      FROM ({stl})
    ),
    m AS (
      SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(qr) AS HUGEINT) AS sr,
             CAST(SUM(qr * qr) AS HUGEINT) AS srr,
             CAST(SUM(qs + qr) AS HUGEINT) AS ssr,
             CAST(SUM((qs + qr) * (qs + qr)) AS HUGEINT) AS ssrr,
             CAST(SUM(qt + qr) AS HUGEINT) AS str_,
             CAST(SUM((qt + qr) * (qt + qr)) AS HUGEINT) AS strr
      FROM comp GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_points,
           CASE WHEN n * ssrr - ssr * ssr <= 0 THEN NULL
                WHEN n * srr - sr * sr >= n * ssrr - ssr * ssr THEN 0.0 + 0.0
                ELSE CAST((2 * ((n * ssrr - ssr * ssr) - (n * srr - sr * sr))
                           * 10000 + (n * ssrr - ssr * ssr))
                          // (2 * (n * ssrr - ssr * ssr)) AS BIGINT)
                     / 10000.0 + 0.0 END AS f_seasonal,
           CASE WHEN n * strr - str_ * str_ <= 0 THEN NULL
                WHEN n * srr - sr * sr >= n * strr - str_ * str_ THEN 0.0 + 0.0
                ELSE CAST((2 * ((n * strr - str_ * str_) - (n * srr - sr * sr))
                           * 10000 + (n * strr - str_ * str_))
                          // (2 * (n * strr - str_ * str_)) AS BIGINT)
                     / 10000.0 + 0.0 END AS f_trend
    FROM m ORDER BY user_id
    """


@query(
    "ts_stl_strength",
    category="timeseries",
    oracle=_stl_strength_oracle(),
)
def ts_stl_strength(spark, sf_dir):
    """Seasonal and trend STRENGTH per user signal (Wang, Smith &
    Hyndman 2006; the feature-based time-series triage used to route
    signals to the right forecasting model): F_seasonal = max(0, 1 −
    Var(R)/Var(S+R)) and F_trend = max(0, 1 − Var(R)/Var(T+R)) over
    the ts_stl_decompose components — strong seasonality pushes
    F_seasonal toward 1, a flat signal toward 0. Composes the SAME
    registry STL implementation (the funnel-report pattern); its 4-dp
    component doubles are PROVEN bit-identical cross-engine by its own
    EXACT gate, so quantizing at e4 (ROUND ×10000 — exact, the values
    carry ≤4 dp) yields identical BIGINTs, variances come from exact
    integer moments (HUGEINT / DECIMAL(38,0) — n·Σq² at corpus scale
    passes int64), and the final ratio is the half-away 4-dp integer
    division with the degenerate-variance and negative-strength edges
    pinned (NULL / 0.0). One users-sized aggregation over the STL
    output — no extra pass over events."""
    from .registry import REGISTRY

    stl = REGISTRY["ts_stl_decompose"].fn(spark, sf_dir)
    comp = stl.select(
        "user_id",
        F.round(F.col("seasonal") * 10000).cast("long").alias("qs"),
        F.round(F.col("residual") * 10000).cast("long").alias("qr"),
        F.round(F.col("trend") * 10000).cast("long").alias("qt"),
    )
    d38 = lambda c: F.sum(c).cast("decimal(38,0)")
    m = comp.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        d38(F.col("qr")).alias("sr"),
        d38(F.col("qr") * F.col("qr")).alias("srr"),
        d38(F.col("qs") + F.col("qr")).alias("ssr"),
        d38((F.col("qs") + F.col("qr")) * (F.col("qs") + F.col("qr"))).alias("ssrr"),
        d38(F.col("qt") + F.col("qr")).alias("str_"),
        d38((F.col("qt") + F.col("qr")) * (F.col("qt") + F.col("qr"))).alias("strr"),
    )

    def strength(tot_ss: str, tot_s: str) -> F.Column:
        var_tot = f"(n * {tot_ss} - {tot_s} * {tot_s})"
        var_r = "(n * srr - sr * sr)"
        return F.expr(
            f"CASE WHEN {var_tot} <= 0 THEN NULL"
            f" WHEN {var_r} >= {var_tot} THEN 0.0D + 0.0D"
            f" ELSE CAST((2 * ({var_tot} - {var_r}) * 10000 + {var_tot})"
            f"      DIV (2 * {var_tot}) AS BIGINT) / 10000.0D + 0.0D END"
        )

    return m.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_points"),
        strength("ssrr", "ssr").alias("f_seasonal"),
        strength("strr", "str_").alias("f_trend"),
    ).orderBy("user_id")


@query(
    "ts_poisson_rate_anomaly",
    category="timeseries",
    oracle="""
    WITH b AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
             COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(SUM(x) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM b GROUP BY event_type
    ),
    f AS (
      SELECT b.event_type, b.x, t.tot, t.nb,
             CASE WHEN (b.x * t.nb - t.tot) * (b.x * t.nb - t.tot)
                       > 9 * t.tot * t.nb THEN 1 ELSE 0 END AS anom
      FROM b JOIN t ON t.event_type = b.event_type
    )
    SELECT event_type, CAST(MAX(nb) AS BIGINT) AS n_buckets,
           CAST(SUM(anom) AS BIGINT) AS n_anomalous,
           CAST(MAX(ABS(x * nb - tot)) AS BIGINT) AS max_abs_dev_scaled
    FROM f GROUP BY event_type ORDER BY event_type
    """,
)
def ts_poisson_rate_anomaly(spark, sf_dir):
    """Poisson rate-anomaly screen per event type: hourly counts
    whose deviation from the type's mean rate exceeds 3σ under the
    Poisson model (σ² = λ) — the first-line burst/outage detector for
    event pipelines (error-rate spikes, crawler storms). The 3σ test
    is pure integer CROSS-MULTIPLICATION: with λ = T/B (total over
    buckets), |x − λ| > 3√λ ⟺ (x·B − T)² > 9·T·B — no float, no sqrt,
    engine-identical (magnitudes: x ≤ 1e5-ish, B ≤ 1e3 ⇒ the square
    ≤ ~1e16, inside int64 at fixture scale; DECIMAL widening is the
    documented next step at true corpus rates). One bucketed count
    (map-side combinable), one types-sized join, output per type:
    bucket count, anomalous-bucket count, worst scaled deviation."""
    ev = table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.window("ts", "1 hour").alias("h")
    ).agg(F.count(F.lit(1)).alias("x"))
    t = b.groupBy("event_type").agg(
        F.sum("x").alias("tot"), F.count(F.lit(1)).alias("nb")
    )
    f = b.join(F.broadcast(t), "event_type").select(
        "event_type", "x", "tot", "nb",
        F.expr(
            "CASE WHEN (x * nb - tot) * (x * nb - tot) > 9 * tot * nb"
            " THEN 1 ELSE 0 END"
        ).alias("anom"),
    )
    return (
        f.groupBy("event_type")
        .agg(
            F.max("nb").alias("n_buckets"),
            F.sum("anom").alias("n_anomalous"),
            F.max(F.abs(F.col("x") * F.col("nb") - F.col("tot"))).alias(
                "max_abs_dev_scaled"
            ),
        )
        .orderBy("event_type")
    )
