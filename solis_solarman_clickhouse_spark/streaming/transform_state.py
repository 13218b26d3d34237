"""Custom stateful streaming operator on the Spark 4 ``transformWithState``
API: per-key running peak tracking via a ``StatefulProcessor``.

Second-generation counterpart to ``stateful.streaming_counter_rate``
(applyInPandasWithState): transformWithStateInPandas is the arbitrary-
stateful-processing API Spark 4 positions as the successor — typed state
primitives (ValueState/ListState/MapState), timers, and TTL — and it
REQUIRES the RocksDB state store provider, which is also what a 100 TB
deployment wants (state spills off-heap, incremental checkpoints to the
commit log instead of full HDFS snapshots).

The operator mirrors the §2-B dashboard need "peak AC watts + sample count
per inverter, live": ValueState holds (peak, n) per key; every arriving
micro-batch emits the updated running peak — i.e. a streaming cummax the
batch surface answers with ``max() OVER (... ROWS UNBOUNDED PRECEDING)``.
Batch equivalence is asserted in tests/test_streaming.py.

State size is O(keys) x two scalars; the grouped shuffle is one exchange
on the key, identical to the applyInPandasWithState plan.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("running_peak", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_STATE_SCHEMA = "peak double, n bigint"


class PeakTracker(StatefulProcessor):
    """ValueState-backed running (peak, count) per key; emits every input
    row annotated with the running peak at that row (rows processed in
    ts order within each batch, seeded from persisted state)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("peak_state", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        peak, n = self._state.get() if self._state.exists() else (None, 0)
        for pdf in rows:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("ts").reset_index(drop=True)
            vals = pdf["value"]
            running = vals.cummax()
            if peak is not None:
                running = running.clip(lower=peak)
            peak = float(running.iloc[-1])
            counts = pd.RangeIndex(n + 1, n + len(pdf) + 1)
            n = int(n + len(pdf))
            yield pd.DataFrame(
                {
                    "key": [k] * len(pdf),
                    "ts": pdf["ts"],
                    "value": vals,
                    "running_peak": running,
                    "n_seen": pd.Series(counts, dtype="int64"),
                }
            )
        if peak is not None:
            self._state.update((peak, n))

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithState's Python driver worker needs google.protobuf
    (absent from this container and not installable per the environment
    contract); detect it so callers can fall back."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _peak_fn_apiws(key, pdfs, state):
    """applyInPandasWithState twin of PeakTracker.handleInputRows — same
    state tuple (peak, n), same emitted rows; used when the TWS worker
    can't start (see tws_available)."""
    (k,) = key
    peak, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        vals = pdf["value"]
        running = vals.cummax()
        if peak is not None:
            running = running.clip(lower=peak)
        peak = float(running.iloc[-1])
        counts = pd.RangeIndex(n + 1, n + len(pdf) + 1)
        n = int(n + len(pdf))
        yield pd.DataFrame(
            {
                "key": [k] * len(pdf),
                "ts": pdf["ts"],
                "value": vals,
                "running_peak": running,
                "n_seen": pd.Series(counts, dtype="int64"),
            }
        )
    if peak is not None:
        state.update((peak, n))


def streaming_peak_tracker(
    stream: DataFrame, *, key: str = "inverter", ts: str = "time", value: str = "ac_actual_watts"
) -> DataFrame:
    """Per-key running peak over a STREAMING DataFrame. Uses
    transformWithStateInPandas (typed ValueState, RocksDB provider —
    caller sets the provider conf) when the environment supports it,
    otherwise the identical processor on applyInPandasWithState; both
    plans are one grouped shuffle on the key with O(keys) state."""
    from pyspark.sql import functions as F

    normalized = stream.select(
        F.col(key).cast("string").alias("key"),
        F.col(ts).alias("ts"),
        F.col(value).cast("double").alias("value"),
    )
    if tws_available():
        return normalized.groupBy("key").transformWithStateInPandas(
            PeakTracker(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return normalized.groupBy("key").applyInPandasWithState(
        _peak_fn_apiws,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="peak double, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
