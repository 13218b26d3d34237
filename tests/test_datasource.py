"""Custom Python DataSource (solis_registers): batch + streaming readers
must produce schema-compatible raw registers that flow through the decode →
derive pipeline, and the streaming offsets must cover the replay horizon
exactly once."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from solis_solarman_clickhouse_spark.ingest.datasource import (
    SolisRegisterDataSource,
    register_addrs,
)
from solis_solarman_clickhouse_spark.ingest.fixture import generate_raw_registers
from solis_solarman_clickhouse_spark.ingest.pipeline import transform
from solis_solarman_clickhouse_spark.ingest.registers import FACT_COLUMNS


def _register(spark):
    spark.dataSource.register(SolisRegisterDataSource)


def test_batch_read_shape_and_partitioning(spark):
    _register(spark)
    df = (
        spark.read.format("solis_registers")
        .option("inverters", 3)
        .option("days", 1)
        .load()
    )
    # schema identical to the Spark-expression fixture generator
    fixture = generate_raw_registers(spark, inverters=3, days=1)
    assert df.schema.simpleString() == fixture.schema.simpleString()
    assert df.count() == 3 * 2880
    # one partition per inverter (the reference's per-target task fan-out)
    assert df.rdd.getNumPartitions() == 3
    per_inv = {r["inverter"]: r["n"] for r in
               df.groupBy("inverter").agg(F.count("*").alias("n")).collect()}
    assert per_inv == {"INV-0": 2880, "INV-1": 2880, "INV-2": 2880}


def test_batch_read_feeds_pipeline(spark):
    _register(spark)
    raw = (
        spark.read.format("solis_registers")
        .option("inverters", 2)
        .option("days", 1)
        .load()
    )
    fact = transform(raw)  # decode -> derive, zero-DC rows dropped
    assert list(fact.columns) == list(FACT_COLUMNS)
    n_fact = fact.count()
    assert 0 < n_fact < 2 * 2880  # night rows (dc=0) are dropped
    bad = fact.filter(
        (F.col("inverter_efficiency_percent") > 100.0)
        | (F.col("dc_actual_watts") <= 0)
    ).count()
    assert bad == 0
    # cumulative counter stays monotonic per inverter in time order
    from pyspark.sql import Window as W

    w = W.partitionBy("inverter").orderBy("time")
    dec = (
        fact.withColumn("prev", F.lag("kwh_total").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("kwh_total") < F.col("prev")))
        .count()
    )
    assert dec == 0


def test_stream_read_covers_horizon_exactly_once(spark):
    """Python stream sources don't support Trigger.AvailableNow (Spark
    falls back to one batch), so run with a fast processing-time trigger
    and poll the memory sink until the replay horizon is fully delivered —
    3 micro-batches of 1000 slots for a 2880-slot day."""
    import time

    _register(spark)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            spark.readStream.format("solis_registers")
            .option("inverters", 2)
            .option("days", 1)
            .option("slots_per_trigger", 1000)
            .load()
            .writeStream.format("memory")
            .queryName("solis_ds_stream")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 seconds")
            .start()
        )
        try:
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                n = spark.sql("SELECT COUNT(*) AS n FROM solis_ds_stream").collect()[0]["n"]
                if n >= 2 * 2880:
                    break
                time.sleep(1)
            got = spark.sql(
                "SELECT inverter, COUNT(*) AS n, COUNT(DISTINCT time) AS nt "
                "FROM solis_ds_stream GROUP BY inverter"
            ).collect()
        finally:
            q.stop()
    by_inv = {r["inverter"]: (r["n"], r["nt"]) for r in got}
    # every slot delivered exactly once per inverter across micro-batches
    assert by_inv == {"INV-0": (2880, 2880), "INV-1": (2880, 2880)}


def test_register_addrs_match_register_map():
    addrs = register_addrs()
    assert len(addrs) == 25  # 13 u16 + 6 u32 pairs (solarman.py:255-307)
    assert addrs == sorted(set(addrs))
