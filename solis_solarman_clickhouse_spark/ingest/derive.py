"""Derived-metric stage — Spark-native version of the reference's inline
arithmetic (/root/reference/solarman.py:255-309):

- ``dc_N_watts = round(dc_N_voltage * dc_N_amps)``      (solarman.py:259,266,273)
- ``dc_calculated_watts = Σ dc_N_watts``                 (solarman.py:276)
- ``inverter_efficiency_percent =
      min(100.0, ac_actual_watts / dc_actual_watts * 100)`` (solarman.py:285)

Zero-DC policy: at night ``dc_actual_watts == 0`` and the reference's
ZeroDivisionError is swallowed by the blanket handler at solarman.py:332-333,
dropping the whole sample. That behavior is an explicit, documented choice
here (``zero_dc="drop"``), with ``"null"`` as the lossless alternative.
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registers import FACT_COLUMNS

ZeroDcPolicy = Literal["drop", "null"]


def derive_metrics(decoded: DataFrame, *, zero_dc: ZeroDcPolicy = "drop") -> DataFrame:
    """decoded metric table → full 26-column fact table (tables.sql:5-32)."""
    df = decoded
    for i in (1, 2, 3):
        df = df.withColumn(
            f"dc_{i}_watts",
            F.round(F.col(f"dc_{i}_voltage") * F.col(f"dc_{i}_amps")).cast("bigint"),
        )
    df = df.withColumn(
        "dc_calculated_watts",
        (F.col("dc_1_watts") + F.col("dc_2_watts") + F.col("dc_3_watts")).cast("bigint"),
    )

    eff = F.least(
        F.lit(100.0),
        F.col("ac_actual_watts").cast("double") / F.col("dc_actual_watts") * 100,
    ).cast("float")
    if zero_dc == "drop":
        # replicate reference semantics: whole sample dropped
        df = df.filter(F.col("dc_actual_watts") > 0).withColumn(
            "inverter_efficiency_percent", eff
        )
    else:
        df = df.withColumn(
            "inverter_efficiency_percent",
            F.when(F.col("dc_actual_watts") > 0, eff).otherwise(F.lit(None).cast("float")),
        )
    return df.select(*FACT_COLUMNS)
