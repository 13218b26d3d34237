"""Deterministic generator for the reference-shaped telemetry fixture
(FIXTURES.md table 11) as a RAW register table, so the decode → derive
pipeline is exercised end-to-end from u16 register values exactly as the
reference reads them (/root/reference/solarman.py:255-307).

Pure Spark column expressions seeded by row id — same output for a given
(inverters, days) on every run/partitioning; no RNG, no driver loops.
Values follow FIXTURES.md hints: diurnal voltage/amps curves (0 at night),
monotonic kwh counters (kwh_total starting ≈33000, registers.txt:16).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registers import REGISTER_MAP

START_EPOCH = 1704067200  # 2024-01-01T00:00:00Z
CADENCE_S = 30  # reference default FETCH_INTERVAL, solarman.py:156


def _u16(col):
    return F.round(col).cast("int")


def _hi(col):
    return _u16(F.floor(col / 65536))


def _lo(col):
    return _u16(col - F.floor(col / 65536) * 65536)


def generate_raw_registers(
    spark: SparkSession, *, inverters: int = 3, days: int = 7
) -> DataFrame:
    """One row per (inverter, 30 s slot): columns inverter, time, reg_*."""
    samples_per_day = 86400 // CADENCE_S
    n = inverters * days * samples_per_day

    df = spark.range(n).select(
        (F.col("id") % inverters).alias("inv_i"),
        (F.col("id") / inverters).cast("bigint").alias("slot"),
    )
    tod = (F.col("slot") % samples_per_day) * CADENCE_S  # seconds since midnight
    day = (F.col("slot") / samples_per_day).cast("bigint")
    epoch = F.lit(START_EPOCH) + F.col("slot") * CADENCE_S

    # diurnal curve in [0,1]: sunlight between 06:00 and 18:00, else 0
    phase = (tod - 6 * 3600) / (12.0 * 3600)
    sun = F.when((phase >= 0) & (phase <= 1), F.sin(phase * math.pi)).otherwise(F.lit(0.0))
    inv_f = F.col("inv_i").cast("double")

    volts = 3000 + inv_f * 100 + sun * 800  # 300.0-380.0 V in 0.1 V units
    amps = sun * (100 + inv_f * 10)  # 0-11.0 A in 0.1 A units
    temp = 250 + sun * 300 + inv_f * 20  # 25.0-58.0 C in 0.1 C units
    dc_watts = F.round(volts / 10 * (amps / 10)) * 3  # combined strings, W
    ac_watts = F.floor(dc_watts * 0.96)  # efficiency < 100%
    ac_apparent = F.floor(dc_watts * 0.97)
    kwh_day_raw = F.floor(tod / 86400.0 * 200 * sun)  # 0.1 kWh units, daily reset
    kwh_month = day * 6 + inv_f * 3
    kwh_annual = day * 6 + inv_f * 3 + 500
    kwh_total = 33000 + day * 20 + inv_f * 1000  # registers.txt:16 magnitude

    # Addresses are the reference fetch cycle's (solarman.py:255-307).
    reg_exprs: dict[int, F.Column] = {
        3021: _u16(volts),  # dc_1_voltage
        3022: _u16(amps),  # dc_1_amps
        3023: _u16(volts * 0.98),  # dc_2_voltage
        3024: _u16(amps * 0.97),  # dc_2_amps
        3025: _u16(volts * 0.96),  # dc_3_voltage
        3026: _u16(amps * 0.95),  # dc_3_amps
        3006: _hi(dc_watts),  # dc_actual_watts (u32 hi)
        3007: _lo(dc_watts),  # dc_actual_watts (u32 lo)
        3004: _hi(ac_watts),  # ac_actual_watts (u32 hi)
        3005: _lo(ac_watts),  # ac_actual_watts (u32 lo)
        3041: _u16(temp),  # temperature, scale 0.1
        3031: _u16(volts * 1.01),  # dc_busbar_voltage
        3030: _u16(F.lit(12) + sun * 10),  # ground_voltage
        3057: _hi(ac_apparent),  # ac_apparent_watts (u32 hi)
        3058: _lo(ac_apparent),  # ac_apparent_watts (u32 lo)
        3035: _u16(F.lit(2350) + sun * 50),  # ac_voltage
        3038: _u16(amps * 2.8),  # ac_amps
        3042: _u16(F.lit(6000) + sun * 5),  # ac_frequency, scale 0.01
        3014: _u16(kwh_day_raw),  # kwh_day, scale 0.1
        3010: _hi(kwh_month),  # kwh_month (u32 hi)
        3011: _lo(kwh_month),  # kwh_month (u32 lo)
        3016: _hi(kwh_annual),  # kwh_annual (u32 hi)
        3017: _lo(kwh_annual),  # kwh_annual (u32 lo)
        3008: _hi(kwh_total),  # kwh_total (u32 hi)
        3009: _lo(kwh_total),  # kwh_total (u32 lo)
    }

    out = df.select(
        F.concat(F.lit("INV-"), F.col("inv_i").cast("string")).alias("inverter"),
        F.timestamp_seconds(epoch).alias("time"),
        *[expr.alias(f"reg_{addr}") for addr, expr in sorted(reg_exprs.items())],
    )
    needed: set[str] = set()
    for spec in REGISTER_MAP:
        needed.add(f"reg_{spec.addr}")
        if spec.quantity == 2:
            needed.add(f"reg_{spec.addr + 1}")
    missing = needed - set(out.columns)
    if missing:
        raise AssertionError(f"fixture generator missing registers: {sorted(missing)}")
    return out
