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


def run_stream(
    spark: SparkSession,
    raw_path: str,
    sink: IdempotentParquetSink,
    checkpoint: str,
    *,
    zero_dc: ZeroDcPolicy = "drop",
    max_files_per_trigger: int = 1,
    schema=None,
):
    """Replay a raw-register parquet directory as a stream (file source,
    one file per micro-batch) through the pipeline into the idempotent sink.
    Returns the started StreamingQuery; caller awaits termination.
    """
    if schema is None:
        schema = spark.read.parquet(raw_path).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(raw_path)
    )
    fact = transform(raw, zero_dc=zero_dc)
    return (
        fact.writeStream.foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
