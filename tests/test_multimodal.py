"""Multimodal binary-column plumbing tests: Arrow batch handling, null
payloads, the real-codec gate, and resize invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from solis_solarman_clickhouse_spark.operators.multimodal import (
    PAYLOAD_SCHEMA,
    attach_payloads,
    audio_features,
    decode_image_meta,
    resize_images,
    sample_frames,
)
from solis_solarman_clickhouse_spark.tables import table

from .conftest import SF_DIR


def _payloads(spark):
    return attach_payloads(table(spark, SF_DIR, "documents"))


def test_payload_schema_and_magic(spark):
    p = _payloads(spark)
    # simpleString compares names/types, ignoring nullability flags
    assert p.schema.simpleString() == PAYLOAD_SCHEMA.simpleString()
    row = p.filter(F.col("modality") == "image").first()
    assert bytes(row["payload"])[:4] == b"IMG0"
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_decode_handles_null_payloads(spark):
    df = spark.createDataFrame(
        [(1, "image", None, ("image/fake", 0)), (4, "image", b"IMG0abc", ("image/fake", 7))],
        PAYLOAD_SCHEMA,
    )
    out = {r["doc_id"]: r for r in decode_image_meta(df).collect()}
    assert out[1]["n_bytes"] == 0 and out[1]["width"] == 16
    assert out[4]["n_bytes"] == 7 and out[4]["width"] == 16 * (1 + 7 % 64)


def test_decode_survives_small_arrow_batches(spark):
    """mapInPandas must produce identical results regardless of how Arrow
    slices the input into batches."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        small = decode_image_meta(_payloads(spark)).orderBy("doc_id").collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    big = decode_image_meta(_payloads(spark)).orderBy("doc_id").collect()
    assert small == big


def test_real_codec_paths_are_gated(spark):
    p = _payloads(spark)
    with pytest.raises(NotImplementedError):
        decode_image_meta(p, real=True)
    with pytest.raises(NotImplementedError):
        audio_features(p, real=True)


def test_resize_bounds_and_aspect(spark):
    meta = {r["doc_id"]: r for r in decode_image_meta(_payloads(spark)).collect()}
    for r in resize_images(_payloads(spark), max_side=256).collect():
        m = meta[r["doc_id"]]
        assert max(r["out_width"], r["out_height"]) <= 256
        # no upscaling
        assert r["out_width"] <= m["width"] and r["out_height"] <= m["height"]
        # aspect preserved within rounding (relative: rounding the short
        # side of an extreme ratio moves the quotient by up to 1/short_side)
        if m["height"] and r["out_height"]:
            got = r["out_width"] / r["out_height"]
            want = m["width"] / m["height"]
            assert abs(got - want) / want <= 0.5 / min(r["out_width"], r["out_height"]) + 1e-9


def test_frame_sampling_counts(spark):
    frames = sample_frames(_payloads(spark), fps=4.0, max_frames=8)
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    bad = per_doc.filter((F.col("n") < 1) | (F.col("n") > 8) | (F.col("mx") != F.col("n") - 1))
    assert bad.count() == 0
