"""Streaming-semantics tests (SURVEY.md §5 item 3): watermark late-data
exclusion, streaming==batch window equivalence, e2e ingest replay equality
with the batch pipeline.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from solis_solarman_clickhouse_spark.ingest.decode import decode_registers
from solis_solarman_clickhouse_spark.ingest.derive import derive_metrics
from solis_solarman_clickhouse_spark.ingest.fixture import generate_raw_registers
from solis_solarman_clickhouse_spark.ingest.pipeline import run_stream
from solis_solarman_clickhouse_spark.ingest.sink import IdempotentParquetSink
from solis_solarman_clickhouse_spark.tables import table

from .conftest import SF_DIR


def test_stream_window_agg_equals_batch(spark):
    """A tumbling-window count over the event stream (multi-batch file
    source, update-to-complete via availableNow) equals the batch result."""
    ev = table(spark, SF_DIR, "events")
    workdir = tempfile.mkdtemp(prefix="strmEQ_")
    src = os.path.join(workdir, "src")
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)

    batch = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("strm_eq_out")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("strm_eq_out")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_watermark_excludes_late_windows(spark):
    """Append-mode output under a watermark is a subset of the batch
    (complete) result, and every emitted window is final — its count equals
    the batch count for that window (no partial emissions)."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    streamed = REGISTRY["stream_watermark_late_data"].fn(spark, SF_DIR)
    ev = table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    extra = streamed.exceptAll(batch).count()
    assert extra == 0, "streamed emitted a window/count not in the batch result"
    assert streamed.count() <= batch.count()


def test_stateful_counter_rate_equals_batch_lag(spark):
    """applyInPandasWithState counter-rate across micro-batch boundaries
    must equal the batch lag() computation: time-ordered files with
    maxFilesPerTrigger=1 force state to carry the last sample between
    triggers."""
    from pyspark.sql import Window as W

    from solis_solarman_clickhouse_spark.streaming.stateful import streaming_counter_rate

    ev = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    workdir = tempfile.mkdtemp(prefix="strmrate_")
    src = os.path.join(workdir, "src")
    # time-ordered file names so triggers replay in event-time order
    parts = ev.orderBy("ts").withColumn(
        "part", F.ntile(3).over(W.orderBy("ts"))
    )
    for i in range(1, 4):
        parts.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"f{i}"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    rates = streaming_counter_rate(stream, key="user_id", ts="ts", value="value")
    q = (
        rates.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_eq_out")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("rate_eq_out").select(
        "key", "ts", F.round("delta", 6).alias("delta"),
        F.round("rate_per_hour", 6).alias("rate"),
    )

    w = W.partitionBy("user_id").orderBy("ts")
    exp = ev.select(
        F.col("user_id").cast("string").alias("key"),
        "ts",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.round(
            (F.col("value") - F.lag("value").over(w))
            / ((F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)) / 3600.0),
            6,
        ).alias("rate"),
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_stream_ingest_replay_equals_batch_pipeline(spark):
    """Q-STRM-6/golden e2e: streaming replay through decode→derive→idempotent
    sink lands exactly the batch-transform result."""
    workdir = tempfile.mkdtemp(prefix="e2e_")
    raw = generate_raw_registers(spark, inverters=2, days=1)
    raw_path = os.path.join(workdir, "raw")
    raw.repartitionByRange(3, "time").write.mode("overwrite").parquet(raw_path)

    sink = IdempotentParquetSink(os.path.join(workdir, "fact"))
    q = run_stream(spark, raw_path, sink, os.path.join(workdir, "ckpt"))
    q.awaitTermination()
    landed = sink.read_table(spark)

    expected = derive_metrics(decode_registers(spark.read.parquet(raw_path)))
    assert landed.exceptAll(expected).count() == 0
    assert expected.exceptAll(landed).count() == 0


import pytest


@pytest.mark.parametrize("path", ["tws", "fallback"])
def test_stream_peak_tracker_equals_batch_cummax(spark, monkeypatch, path):
    """transformWithState AND its applyInPandasWithState fallback each
    equal the batch cummax window across micro-batch boundaries
    (maxFilesPerTrigger=1) — the capability gate (tws_available) is
    FORCED per param so the fallback path is tested even where TWS
    works, and vice versa the TWS leg skips (not silently passes) where
    the worker can't start."""
    from pyspark.sql import Window

    from solis_solarman_clickhouse_spark.streaming import transform_state
    from solis_solarman_clickhouse_spark.streaming.transform_state import (
        streaming_peak_tracker,
    )

    if path == "tws":
        if not transform_state.tws_available():
            pytest.skip("transformWithState worker needs google.protobuf")
    else:
        monkeypatch.setattr(transform_state, "tws_available", lambda: False)

    ev = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    workdir = tempfile.mkdtemp(prefix=f"tws_{path}_")
    src = os.path.join(workdir, "src")
    # time-ordered file names so triggers replay in event-time order —
    # per-row running-peak equality only holds for in-order arrival
    parts = ev.orderBy("ts").withColumn("part", F.ntile(3).over(Window.orderBy("ts")))
    for i in range(1, 4):
        parts.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"f{i}"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        streaming_peak_tracker(stream, key="user_id", ts="ts", value="value")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(f"tws_peaks_{path}")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(f"tws_peaks_{path}").select("key", "ts", "running_peak", "n_seen")

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = ev.select(
        F.col("user_id").cast("string").alias("key"),
        "ts",
        F.max("value").over(w).alias("running_peak"),
        F.count(F.lit(1)).over(w).alias("n_seen"),
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_stream_static_enrich_equals_batch_join(spark):
    """Stream-static broadcast enrich lands exactly the batch join."""
    ev = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    cust = table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    workdir = tempfile.mkdtemp(prefix="enrich_")
    src = os.path.join(workdir, "src")
    ev.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    q = (
        stream.join(F.broadcast(cust), "user_id", "left")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_rows")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("enrich_rows")
    exp = ev.join(cust, "user_id", "left")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_stream_stream_join_subset_of_batch(spark):
    """Stream-stream interval join emits a subset of the batch interval
    join (watermark may drop late matches, never invent them), and on
    this in-order replay it lands the full batch result."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    got = REGISTRY["stream_stream_interval_join"].fn(spark, SF_DIR)

    ev = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"), F.max("event_type").alias("event_type"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    exp = (
        purchases.join(
            views,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_view_purchase_pairs"))
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_incremental_mv_restart_and_replay_idempotence(spark, tmp_path):
    """The summing MV must survive the two real failure modes: (1) new
    files arriving after the stream stopped — restart from the same
    checkpoint processes ONLY the increment; (2) a lost checkpoint
    forcing full batch replay — the batchId markers make re-merging a
    no-op. After both, the maintained view equals a full recompute."""
    import os

    from pyspark.sql import functions as F

    from solis_solarman_clickhouse_spark.queries.streaming_batch import (
        read_mv,
        run_mv_stream,
    )
    from solis_solarman_clickhouse_spark.tables import table

    from .conftest import SF_DIR

    ev = table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("ys"),
    )
    workdir = str(tmp_path / "mvwork")
    src = os.path.join(workdir, "src")
    os.makedirs(src, exist_ok=True)
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    for i, half in enumerate([first]):
        half.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(workdir, f"stage{i}")
        )
    # land the first half as two files, stream it, stop
    first.repartitionByRange(2, "event_id").write.mode("overwrite").parquet(src)
    run_mv_stream(spark, ev.schema, src, workdir)
    mv1 = read_mv(spark, os.path.join(workdir, "mv"))
    n_first = first.count()
    assert mv1.agg(F.sum("n_events")).collect()[0][0] == n_first

    # new files arrive; restart from the SAME checkpoint
    second.repartitionByRange(2, "event_id").write.mode("append").parquet(src)
    run_mv_stream(spark, ev.schema, src, workdir)
    expected = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("ys").cast("double") / 100.0).alias("sum_value"),
        )
    )
    mv2 = read_mv(spark, os.path.join(workdir, "mv"))
    assert mv2.count() == expected.count()
    assert (
        mv2.join(expected, ["user_id", "event_type", "n_events", "sum_value"])
        .count()
        == expected.count()
    )

    # checkpoint loss: full replay must not double-count (markers hold)
    import shutil

    shutil.rmtree(os.path.join(workdir, "ckpt"))
    run_mv_stream(spark, ev.schema, src, workdir)
    mv3 = read_mv(spark, os.path.join(workdir, "mv"))
    assert (
        mv3.join(expected, ["user_id", "event_type", "n_events", "sum_value"])
        .count()
        == expected.count()
    )


def test_watermark_cut_exact_equals_real_stream(spark):
    """The deterministic watermark-cut model (stream_watermark_cut_exact,
    Q-STRM-5's EXACT row) must equal a REAL withWatermark/append streaming
    run of the same replay schedule: 4 event-time slices, event_id%50 rows
    arriving one slice late, one file per slice replayed in order (mtimes
    pinned with os.utime — the file source orders batches by mtime).
    Append mode only emits windows finalized by the FINAL watermark, so the
    model is restricted to window_end <= max(ts) - 10min for the compare."""
    import shutil

    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    ev = table(spark, SF_DIR, "events")
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    sliced = ev.withColumn(
        "sl", F.least(F.lit(3), F.expr(f"(unix_micros(ts) - {lo}L) * 4 DIV {hi - lo + 1}L"))
    ).withColumn(
        "arr",
        F.when(F.col("event_id") % 50 == 0, F.least(F.col("sl") + 1, F.lit(3)))
        .otherwise(F.col("sl")),
    )
    workdir = tempfile.mkdtemp(prefix="strmWM_")
    src = os.path.join(workdir, "src")
    os.makedirs(src)
    for i in range(4):
        part_dir = os.path.join(workdir, f"slice_{i}")
        (sliced.where(F.col("arr") == i).drop("sl", "arr")
         .coalesce(1).write.mode("overwrite").parquet(part_dir))
        part = [f for f in os.listdir(part_dir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"slice_{i}.parquet")
        shutil.copy(os.path.join(part_dir, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("strm_wm_exact_out")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("strm_wm_exact_out")

    final_wm_us = hi - 600_000_000
    model = REGISTRY["stream_watermark_cut_exact"].fn(spark, SF_DIR)
    expected = model.where(
        F.unix_micros("window_start") + 300_000_000 <= final_wm_us
    )
    assert streamed.exceptAll(expected).count() == 0, "stream emitted extra rows"
    assert expected.exceptAll(streamed).count() == 0, "stream missed model rows"


def test_stream_stream_left_outer_equals_batch(spark):
    """Left-outer stream-stream join: with the sentinel watermark flush,
    the landed output (matched + null-padded unmatched purchases) equals
    the batch left interval join exactly."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    got = REGISTRY["stream_stream_left_outer_join"].fn(spark, SF_DIR)

    ev = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"), F.max("event_type").alias("event_type"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    exp = (
        purchases.join(
            views,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        )
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("v_ts").isNull(), 1).otherwise(0)).alias("n_unmatched"),
        )
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_processing_time_trigger_repairs_torn_checkpoint_and_drains(spark):
    """Round-9 soak twin: a REAL wall-clock Trigger.ProcessingTime run
    (not availableNow replay) starting from a TORN batch-0 checkpoint —
    offsets/0 written, nothing ever committed, the graceful-stop race
    shape — must (a) run the repair path (stale offsets cleared), (b)
    fire timer micro-batches that pick up files landing AFTER start, and
    (c) drain to exactly the batch-transform result. The long-form
    wall-clock record lives in bench_records/r9_stream_soak.json
    (tools/stream_soak.py)."""
    import time

    from solis_solarman_clickhouse_spark.ingest.pipeline import transform

    workdir = tempfile.mkdtemp(prefix="ptrig_")
    raw = generate_raw_registers(spark, inverters=2, days=1).cache()
    raw_dir = os.path.join(workdir, "raw")
    raw.filter("unix_timestamp(time) % 90 = 0").coalesce(1).write.parquet(
        os.path.join(raw_dir, "slice=0")
    )

    # the torn-batch-0 state the repair exists for
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(os.path.join(ckpt, "offsets"))
    with open(os.path.join(ckpt, "offsets", "0"), "w") as f:
        f.write("v1\n{}")

    glob = os.path.join(raw_dir, "slice=*")
    sink = IdempotentParquetSink(os.path.join(workdir, "fact"))
    q = run_stream(
        spark, glob, sink, ckpt,
        schema=raw.schema, max_files_per_trigger=4,
        processing_time="1 second",
    )
    try:
        # land a second slice AFTER the stream started: the timer trigger
        # must pick it up on a later firing
        raw.filter("unix_timestamp(time) % 90 = 30").coalesce(1).write.parquet(
            os.path.join(raw_dir, "slice=1")
        )
        expected = transform(spark.read.parquet(glob)).count()
        deadline = time.time() + 120
        landed = -1
        while time.time() < deadline:
            try:
                landed = sink.read_table(spark).count()
            except Exception:  # sink dir not created yet
                landed = -1
            if landed == expected:
                break
            time.sleep(1.0)
        assert landed == expected, f"landed {landed} != batch {expected}"
        # at least two distinct timer firings committed batches
        assert (q.lastProgress or {}).get("batchId", 0) >= 1
        # the fresh run committed batch 0 — possible only because the
        # repair cleared the stale offsets (Spark otherwise refuses to
        # start: "offsets should be empty on batch 0")
        assert "0" in os.listdir(os.path.join(ckpt, "commits"))
    finally:
        q.stop()
        q.awaitTermination(60)
