"""Structured-Streaming re-creation of the reference ingestion pipeline.

Reference dataflow (SURVEY.md §2-A, /root/reference/solarman.py):
poll Modbus registers → decode/scale → derive → bounded queue → single-row
ClickHouse INSERT → server-side Buffer batching → MergeTree.

Spark-native mapping — the queue/retry/buffer machinery dissolves into the
engine's execution model:

  register decode/scale       → JVM column expressions (decode.py)
  derived metrics + clamp     → withColumn arithmetic (derive.py)
  bounded queue + Buffer      → micro-batch trigger (pipeline.py)
  at-least-once insert retry  → foreachBatch + batchId-idempotent sink
                                (sink.py) — upgraded to effectively-once
  MergeTree (ym, inverter,ts) → parquet partitionBy(month) +
                                sortWithinPartitions(inverter, time)
  targets.json validation     → config.py (skip-on-invalid preserved)
"""
