"""Register decode + scale — Spark-native version of the reference's
``read_input_register`` post-processing (/root/reference/solarman.py:340-361):
u16 registers, 32-bit metrics as big-endian two-register combine
((hi << 16) | lo, the ``quantity=2`` reads at solarman.py:278,280,299,305-307),
then a decimal unit scale (0.1 / 0.01, solarman.py:255,303).

Two implementations with identical semantics:

- ``decode_registers``      — pure column expressions (shiftleft/bitwise-or);
                              stays in whole-stage codegen. The default.
- ``decode_registers_pandas`` — Arrow-batched ``mapInPandas`` doing the same
                              math in numpy; exists to exercise the
                              table-UDF plumbing (Q-UDF-3) and as the
                              template for decoders that genuinely need
                              Python (e.g. packed binary payloads).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registers import REGISTER_MAP


def decode_registers(raw: DataFrame) -> DataFrame:
    """raw register table (inverter, time, reg_*) → scaled metric columns."""
    out = [F.col("inverter"), F.col("time")]
    for spec in REGISTER_MAP:
        if spec.quantity == 2:
            combined = (
                F.shiftleft(F.col(f"reg_{spec.addr}").cast("bigint"), 16)
                .bitwiseOR(F.col(f"reg_{spec.addr + 1}").cast("bigint"))
            )
        else:
            combined = F.col(f"reg_{spec.addr}").cast("bigint")
        if spec.scale == 1.0:
            # unscaled 32-bit metrics stay integral (UInt32 → LongType,
            # SURVEY.md §1.2 type mapping)
            col = combined
        else:
            col = F.round(combined * F.lit(spec.scale), 6).cast("float")
        out.append(col.alias(spec.name))
    return raw.select(*out)


def decode_registers_pandas(raw: DataFrame) -> DataFrame:
    """Same decode via mapInPandas (Arrow batches, numpy vectorized)."""
    fields = ["inverter string", "time timestamp"]
    for spec in REGISTER_MAP:
        fields.append(f"{spec.name} {'bigint' if spec.scale == 1.0 else 'float'}")
    schema = ", ".join(fields)

    specs = [(s.name, s.addr, s.quantity, s.scale) for s in REGISTER_MAP]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"inverter": pdf["inverter"], "time": pdf["time"]}
            for name, addr, quantity, scale in specs:
                if quantity == 2:
                    hi = pdf[f"reg_{addr}"].to_numpy(dtype="int64")
                    lo = pdf[f"reg_{addr + 1}"].to_numpy(dtype="int64")
                    vals = pd.Series((hi << 16) | lo, index=pdf.index)
                else:
                    vals = pdf[f"reg_{addr}"].astype("int64")
                if scale == 1.0:
                    out[name] = vals
                else:
                    out[name] = (vals * scale).round(6).astype("float32")
            yield pd.DataFrame(out)

    return raw.mapInPandas(decode, schema=schema)
