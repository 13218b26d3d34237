"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference IoT telemetry pipeline
(``hueNET-llc/solis-solarman-clickhouse``), rebuilt Spark-first.

Layout
------
- ``session``    — tuned SparkSession builder (AQE, UTC, Arrow).
- ``tables``     — fixture loaders / temp-view registration.
- ``queries``    — the declared, oracle-checked query surface (SURVEY.md §2-C).
- ``operators``  — composite operators Spark lacks natively (as-of join,
  interval join, minhash/simhash dedup, ANN similarity, text analysis).
- ``ingest``     — Structured-Streaming re-creation of the reference's
  ingestion dataflow (reference: solarman.py:227-337, tables.sql:34-61).
- ``streaming``  — event-time windowing / watermark / session helpers.

Nothing here is a port: the reference is a single-process asyncio daemon;
this package expresses the same semantics as declarative Spark plans so
Catalyst/Tungsten (and AQE at scale) choose the physical strategy.
"""

__version__ = "0.1.0"
