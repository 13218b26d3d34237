"""Custom stateful streaming operator: per-key counter rate via
``applyInPandasWithState``.

The reference stores monotonic energy counters (kwh_day/month/annual/total,
/root/reference/tables.sql:27-30); the implied §2-B analytical query is the
counter delta/rate, which the batch surface answers with `lag()` over
`(inverter, time)` (queries/windows.py window_counter_delta). This module is
the TRUE-STREAMING form: state carries the last-seen (ts, value) per key
across micro-batches, so each arriving sample emits its delta against the
previous sample even when they land in different triggers — something
`lag()` cannot do incrementally.

Scale shape: state is O(keys) (two scalars per inverter), grouped processing
shuffles once on the key, and the per-group work is vectorized pandas over
Arrow batches. State is checkpointed by Spark. A long-running deployment
adds GroupStateTimeout.ProcessingTimeTimeout + state.remove() to evict keys
that stop reporting; kept NoTimeout here because timeout scheduling forces
extra no-data micro-batches under Trigger.availableNow replay (observed:
hundreds of timeout-only epochs).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
        T.StructField("rate_per_hour", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_epoch", T.DoubleType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def _rate_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Within a trigger: sort the key's rows by ts, seed the diff with the
    persisted last sample, emit (delta, rate), persist the newest sample."""
    (k,) = key
    last_ts, last_value = state.get if state.exists else (None, None)

    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        ts_epoch = pdf["ts"].map(pd.Timestamp.timestamp)
        prev_val = pdf["value"].shift(1)
        prev_ts = ts_epoch.shift(1)
        if last_value is not None:
            prev_val.iloc[0] = last_value
            prev_ts.iloc[0] = last_ts
        delta = pdf["value"] - prev_val
        dt_hours = (ts_epoch - prev_ts) / 3600.0
        rate = delta / dt_hours.where(dt_hours > 0)
        if len(pdf):
            last_ts = float(ts_epoch.iloc[-1])
            last_value = float(pdf["value"].iloc[-1])
        yield pd.DataFrame(
            {
                "key": [k] * len(pdf),
                "ts": pdf["ts"],
                "value": pdf["value"],
                "delta": delta,
                "rate_per_hour": rate,
            }
        )

    if last_value is not None:
        state.update((last_ts, last_value))


def streaming_counter_rate(
    stream: DataFrame,
    *,
    key: str = "inverter",
    ts: str = "time",
    value: str = "kwh_total",
) -> DataFrame:
    """Per-key counter delta/rate over a STREAMING DataFrame, state crossing
    micro-batch boundaries. Returns an append-mode streaming DataFrame with
    columns (key, ts, value, delta, rate_per_hour); the first sample ever
    seen for a key has null delta/rate."""
    from pyspark.sql import functions as F

    normalized = stream.select(
        F.col(key).cast("string").alias("key"),
        F.col(ts).alias("ts"),
        F.col(value).cast("double").alias("value"),
    )
    return normalized.groupBy("key").applyInPandasWithState(
        _rate_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
