"""Q-PROJ / Q-MATH / Q-COND: row-wise projection expressions.

Mirrors the reference's ingest-time projections: unit scaling
(solarman.py:255-304), derived arithmetic watts = volts*amps
(solarman.py:259,266,273), and the clamped efficiency ratio with its
zero-denominator policy (solarman.py:285, drop at solarman.py:332-333).
All stay inside whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import table
from .registry import query, r4


@query(
    "proj_revenue_expr",
    category="projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem
    """,
)
def proj_revenue_expr(spark, sf_dir):
    """Q-PROJ-1: arithmetic projection (the analytics mirror of the
    reference's scale/derive step, solarman.py:255-276)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("revenue"),
    )


@query(
    "proj_clamp_nullsafe",
    category="projection",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 7 = 0 THEN CAST(NULL AS DOUBLE)
                ELSE ROUND(LEAST(100.0, value / (user_id % 7) * 100), 4)
           END AS clamped_pct
    FROM events
    """,
)
def proj_clamp_nullsafe(spark, sf_dir):
    """Q-PROJ-2 (null variant): LEAST(100, a/NULLIF(b,0)*100) — the
    reference's efficiency clamp (solarman.py:285) with nulls instead of
    the reference's row-drop."""
    ev = table(spark, sf_dir, "events")
    denom = F.col("user_id") % 7
    return ev.select(
        "event_id",
        F.when(denom == 0, F.lit(None).cast("double"))
        .otherwise(r4(F.least(F.lit(100.0), F.col("value") / denom * 100)))
        .alias("clamped_pct"),
    )


@query(
    "proj_clamp_dropzero",
    category="projection",
    oracle="""
    SELECT event_id, ROUND(LEAST(100.0, value / (user_id % 7) * 100), 4) AS clamped_pct
    FROM events
    WHERE user_id % 7 <> 0
    """,
)
def proj_clamp_dropzero(spark, sf_dir):
    """Q-PROJ-2 (reference drop-row variant): zero denominator drops the
    whole row, replicating ZeroDivisionError → blanket except → sample
    dropped (solarman.py:285, solarman.py:332-333)."""
    ev = table(spark, sf_dir, "events")
    denom = F.col("user_id") % 7
    return ev.filter(denom != 0).select(
        "event_id",
        r4(F.least(F.lit(100.0), F.col("value") / denom * 100)).alias("clamped_pct"),
    )


@query(
    "math_functions",
    category="projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity, 0) AS qty_round,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_ceil,
           ABS(l_quantity - 25) AS qty_abs,
           ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
           ROUND(POWER(l_discount, 2), 4) AS disc_sq,
           l_orderkey % 7 AS key_mod,
           CAST(SIGN(l_quantity - 25) AS INT) AS qty_sign,
           ROUND(LN(l_extendedprice + 1), 4) AS price_ln,
           GREATEST(l_quantity, l_discount * 100) AS g,
           LEAST(l_quantity, l_discount * 100) AS l
    FROM lineitem
    """,
)
def math_functions(spark, sf_dir):
    """Q-MATH-1: scalar math function family."""
    li = table(spark, sf_dir, "lineitem")
    q, p, d, k = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount"), F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(q, 0).alias("qty_round"),
        F.floor(p).cast("bigint").alias("price_floor"),
        F.ceil(d * 100).cast("bigint").alias("disc_ceil"),
        F.abs(q - 25).alias("qty_abs"),
        F.round(F.sqrt(p), 4).alias("price_sqrt"),
        F.round(F.pow(d, 2), 4).alias("disc_sq"),
        (k % 7).alias("key_mod"),
        F.signum(q - 25).cast("int").alias("qty_sign"),
        F.round(F.log(p + 1), 4).alias("price_ln"),
        F.greatest(q, d * 100).alias("g"),
        F.least(q, d * 100).alias("l"),
    )


@query(
    "conditional_functions",
    category="projection",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_nf,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def conditional_functions(spark, sf_dir):
    """Q-COND-1: CASE WHEN / coalesce / nullif / if."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_nf"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )
