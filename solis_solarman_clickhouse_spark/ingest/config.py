"""Targets-config load + validate — Spark-native version of
``_load_targets`` (/root/reference/solarman.py:70-141).

Semantics preserved (SURVEY.md §1.2/§1.3):
- defaults: port=161 (solarman.py:82 — the reference's documented value is
  8999, README.md:38; code wins), mb_slave_id=1 (solarman.py:99),
  interval/timeout from env-style defaults (30 / 15, solarman.py:156,163),
  error_correction=False (solarman.py:117);
- invalid targets are *skipped with a reason, not failed*
  (solarman.py:89-97 `continue`); an empty valid set is fatal
  (solarman.py:369-371).

Config is dimension data: parsed with an explicit schema (no inference),
validated declaratively, and small enough to broadcast or collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("port", T.LongType()),
        T.StructField("serial_number", T.StringType()),  # validated/coerced below
        T.StructField("mb_slave_id", T.LongType()),
        T.StructField("interval", T.LongType()),
        T.StructField("timeout", T.LongType()),
        T.StructField("error_correction", T.BooleanType()),
    ]
)

DEFAULTS = {"port": 161, "mb_slave_id": 1, "interval": 30, "timeout": 15}


def load_targets(
    spark: SparkSession,
    path: str,
    *,
    default_interval: int = 30,
    default_timeout: int = 15,
) -> tuple[DataFrame, DataFrame]:
    """Parse a targets.json file → (valid, rejected-with-reason).

    Raises ValueError if no valid targets remain (reference exits,
    solarman.py:369-371).
    """
    raw = spark.read.schema(TARGET_SCHEMA).json(path)

    serial = F.col("serial_number").try_cast("bigint")
    reason = (
        F.when(F.col("name").isNull() | (F.trim("name") == ""), "missing name")
        .when(F.col("ip").isNull() | (F.trim("ip") == ""), "missing ip")
        .when(F.col("serial_number").isNull(), "missing serial_number")
        .when(serial.isNull(), "non-numeric serial_number")
        .when(serial <= 0, "non-positive serial_number")
    )

    annotated = raw.withColumn("reject_reason", reason)
    rejected = annotated.filter(F.col("reject_reason").isNotNull()).select(
        "name", "ip", "serial_number", "reject_reason"
    )
    valid = (
        annotated.filter(F.col("reject_reason").isNull())
        .select(
            "name",
            "ip",
            F.coalesce(F.col("port"), F.lit(DEFAULTS["port"])).cast("int").alias("port"),
            serial.alias("serial_number"),
            F.coalesce(F.col("mb_slave_id"), F.lit(DEFAULTS["mb_slave_id"]))
            .cast("int")
            .alias("mb_slave_id"),
            F.coalesce(F.col("interval"), F.lit(default_interval)).cast("int").alias("interval"),
            F.coalesce(F.col("timeout"), F.lit(default_timeout)).cast("int").alias("timeout"),
            F.coalesce(F.col("error_correction"), F.lit(False)).alias("error_correction"),
        )
    )
    if valid.limit(1).count() == 0:
        raise ValueError("no valid targets in config (reference exits on this)")
    return valid, rejected
