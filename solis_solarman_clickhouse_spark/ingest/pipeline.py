"""End-to-end ingestion pipeline: raw registers → decode → derive → sink.

Batch and streaming entry points share the exact same transform chain —
the Structured Streaming plan is the batch plan executed per micro-batch,
which is the whole point of re-creating the reference's asyncio dataflow
(solarman.py:227-337) on Spark: the bounded queue (solarman.py:36), retry
loops (solarman.py:202-225,342-359), and Buffer batching (tables.sql:61)
all collapse into trigger + checkpoint + task retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .decode import decode_registers
from .derive import ZeroDcPolicy, derive_metrics
from .sink import IdempotentParquetSink


def transform(raw: DataFrame, *, zero_dc: ZeroDcPolicy = "drop") -> DataFrame:
    return derive_metrics(decode_registers(raw), zero_dc=zero_dc)


def run_batch(
    raw: DataFrame, sink: IdempotentParquetSink, *, zero_dc: ZeroDcPolicy = "drop"
) -> None:
    sink.write_batch(transform(raw, zero_dc=zero_dc), batch_id=0)


def _repair_torn_checkpoint(checkpoint: str) -> None:
    """Clear a TORN batch-0 checkpoint: a stop() that lands between the
    batch-0 offsets write and its commit can leave ``offsets/0`` with no
    ``commits/`` entry, and Spark's restart then refuses with
    STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY ("offsets should be empty
    on batch 0") instead of replaying — observed as a rare race in the
    graceful-stop lifecycle test. Deleting the offsets entry is safe
    precisely in this state: nothing ever committed, so no batch
    completed, and whatever the batch-0 foreachBatch may have written is
    keyed by batch_id and overwritten verbatim by the replay (the
    idempotent-sink contract). Any checkpoint with at least one commit is
    left untouched — normal offsets-ahead-of-commits recovery handles
    those."""
    import os
    import shutil

    off = os.path.join(checkpoint, "offsets")
    com = os.path.join(checkpoint, "commits")
    try:
        offs = [f for f in os.listdir(off) if not f.startswith(".")]
    except OSError:
        return
    try:
        coms = [f for f in os.listdir(com) if not f.startswith(".")]
    except FileNotFoundError:
        coms = []  # commits/ never created → genuinely torn-batch-0 territory
    except OSError:
        # A transient non-ENOENT error (permissions, I/O blip) on a HEALTHY
        # checkpoint must not be read as "no commits ever" — deleting
        # offsets/ then would orphan commits/N and corrupt the checkpoint.
        return
    if offs and not coms:
        shutil.rmtree(off, ignore_errors=True)


def run_stream(
    spark: SparkSession,
    raw_path: str,
    sink: IdempotentParquetSink,
    checkpoint: str,
    *,
    zero_dc: ZeroDcPolicy = "drop",
    max_files_per_trigger: int = 1,
    schema=None,
    processing_time: str | None = None,
):
    """Replay a raw-register parquet directory as a stream (file source,
    one file per micro-batch) through the pipeline into the idempotent sink.
    Returns the started StreamingQuery; caller awaits termination.

    ``processing_time`` (e.g. "2 seconds") switches from the default
    drain-and-stop ``availableNow`` trigger to a REAL wall-clock
    ``Trigger.ProcessingTime`` — the long-running-service shape the
    reference's poll loop runs in (solarman.py:156 FETCH_INTERVAL): the
    query keeps firing on the timer, picking up files as they land, until
    a graceful stop. Used by tools/stream_soak.py and the soak tests;
    batch replay/backfill keeps availableNow.
    """
    _repair_torn_checkpoint(checkpoint)
    if schema is None:
        schema = spark.read.parquet(raw_path).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(raw_path)
    )
    fact = transform(raw, zero_dc=zero_dc)
    writer = fact.writeStream.foreachBatch(sink.foreach_batch()).option(
        "checkpointLocation", checkpoint
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


class GracefulStop:
    """SIGTERM-driven graceful shutdown, the Spark analogue of the
    reference's handler (solarman.py:408-421: SIGTERM → stop_event →
    drain → close clients).

    ``query.stop()`` on a checkpointed foreachBatch stream is safe
    mid-batch: the in-flight micro-batch either commits (offsets + sink
    write) or is replayed on restart from the checkpoint — the idempotent
    sink absorbs the replay, so stop-at-any-point loses nothing. Install
    BEFORE starting queries; ``wait()`` blocks like the reference's
    ``await stop_event.wait()``."""

    def __init__(self) -> None:
        import threading

        self._stop = threading.Event()
        self._queries: list = []
        self._installed = False

    def register(self, query) -> None:
        self._queries.append(query)

    def install(self) -> None:
        """Register the SIGTERM/SIGINT handlers (main thread only — same
        constraint as the reference's signal.signal)."""
        import signal

        def handler(_signo, _frame):
            self.request_stop()

        signal.signal(signal.SIGTERM, handler)
        signal.signal(signal.SIGINT, handler)
        self._installed = True

    def request_stop(self) -> None:
        self._stop.set()

    @property
    def stopping(self) -> bool:
        return self._stop.is_set()

    def wait(self, poll_s: float = 1.0) -> None:
        """Block until a stop is requested (or every registered query
        terminates on its own), then stop all queries and return."""
        while not self._stop.is_set():
            if self._queries and all(not q.isActive for q in self._queries):
                return
            self._stop.wait(poll_s)
        for q in self._queries:
            if q.isActive:
                q.stop()
        for q in self._queries:
            q.awaitTermination()
