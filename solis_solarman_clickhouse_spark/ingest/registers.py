"""Register map of the polled device address space.

Mirrors the read sequence in /root/reference/solarman.py:255-307: 19 reads
over 25 input registers; 13 single-register (u16) metrics and 6 two-register
(u32, big-endian hi<<16 | lo) metrics; unit scales 0.1 / 0.01 applied at
read time (solarman.py:255, :303). Addresses, quantities, and scales are the
ones the reference fetch cycle actually reads (solarman.py:255-307 — e.g.
dc_1_voltage=3021 q1 s0.1, ac_actual_watts=3004 q2, kwh_total=3008 q2); the
captured dump /root/reference/registers.txt covers the same 02999-03072
space. tests/test_ingest.py pins this map against the reference sequence.

The raw fixture table stores one column per register, named ``reg_<addr>``
(u16 as INT). Decode (decode.py) turns these into the 25 metric columns;
derive.py adds the computed ones (watts, calculated, efficiency) for the
26-column fact table mirroring /root/reference/tables.sql:5-32.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RegisterSpec:
    name: str  # output metric column
    addr: int  # first register address
    quantity: int  # 1 (u16) or 2 (u32 big-endian)
    scale: float  # multiplier applied after integer decode
    kind: str  # 'gauge' | 'counter'


# Read order follows the reference fetch cycle (solarman.py:255-307):
# DC strings first (3021-3026), then the u32 power/energy registers and the
# remaining gauges in the order the `data` row is assembled.
REGISTER_MAP: tuple[RegisterSpec, ...] = (
    RegisterSpec("dc_1_voltage", 3021, 1, 0.1, "gauge"),
    RegisterSpec("dc_1_amps", 3022, 1, 0.1, "gauge"),
    RegisterSpec("dc_2_voltage", 3023, 1, 0.1, "gauge"),
    RegisterSpec("dc_2_amps", 3024, 1, 0.1, "gauge"),
    RegisterSpec("dc_3_voltage", 3025, 1, 0.1, "gauge"),
    RegisterSpec("dc_3_amps", 3026, 1, 0.1, "gauge"),
    RegisterSpec("dc_actual_watts", 3006, 2, 1.0, "gauge"),
    RegisterSpec("ac_actual_watts", 3004, 2, 1.0, "gauge"),
    RegisterSpec("inverter_temperature_celsius", 3041, 1, 0.1, "gauge"),
    RegisterSpec("dc_busbar_voltage", 3031, 1, 0.1, "gauge"),
    RegisterSpec("ground_voltage", 3030, 1, 0.1, "gauge"),
    RegisterSpec("ac_apparent_watts", 3057, 2, 1.0, "gauge"),
    RegisterSpec("ac_voltage", 3035, 1, 0.1, "gauge"),
    RegisterSpec("ac_amps", 3038, 1, 0.1, "gauge"),
    RegisterSpec("ac_frequency", 3042, 1, 0.01, "gauge"),
    RegisterSpec("kwh_day", 3014, 1, 0.1, "counter"),
    RegisterSpec("kwh_month", 3010, 2, 1.0, "counter"),
    RegisterSpec("kwh_annual", 3016, 2, 1.0, "counter"),
    RegisterSpec("kwh_total", 3008, 2, 1.0, "counter"),
)

#: Columns of the landed fact table, in the INSERT order the reference uses
#: (solarman.py:209-215 / tables.sql:5-32).
FACT_COLUMNS: tuple[str, ...] = (
    "inverter",
    "inverter_temperature_celsius",
    "inverter_efficiency_percent",
    "dc_1_voltage",
    "dc_1_amps",
    "dc_1_watts",
    "dc_2_voltage",
    "dc_2_amps",
    "dc_2_watts",
    "dc_3_voltage",
    "dc_3_amps",
    "dc_3_watts",
    "dc_calculated_watts",
    "dc_actual_watts",
    "dc_busbar_voltage",
    "ground_voltage",
    "ac_apparent_watts",
    "ac_actual_watts",
    "ac_voltage",
    "ac_amps",
    "ac_frequency",
    "kwh_day",
    "kwh_month",
    "kwh_annual",
    "kwh_total",
    "time",
)


def raw_register_columns() -> list[str]:
    """Column names of the raw register table (one per u16 register)."""
    cols: list[str] = []
    for spec in REGISTER_MAP:
        cols.append(f"reg_{spec.addr}")
        if spec.quantity == 2:
            cols.append(f"reg_{spec.addr + 1}")
    return cols
