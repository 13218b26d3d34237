"""Numeric execution-metrics checks via metrics.run_with_metrics — scale
properties asserted from the SQLMetrics Spark maintains, complementing
the plan-string tests in test_plans.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from solis_solarman_clickhouse_spark.metrics import run_with_metrics
from solis_solarman_clickhouse_spark.queries.registry import REGISTRY
from solis_solarman_clickhouse_spark.tables import table

from .conftest import SF_DIR


def test_scan_metrics_report_rows_and_bytes(spark):
    m = run_with_metrics(REGISTRY["scan_pruned_projection"].fn(spark, SF_DIR))
    assert m["scan_rows"] > 0
    assert m["scan_bytes"] > 0


def test_aggregation_shuffles_less_than_it_scans(spark):
    """Partial aggregation must shrink data before the exchange: shuffle
    bytes for Q1 (4-group aggregate over lineitem) must be far below the
    scanned file bytes."""
    m = run_with_metrics(REGISTRY["agg_tpch_q1"].fn(spark, SF_DIR))
    assert m["shuffle_write_bytes"] > 0, "expected a partial/final exchange"
    assert m["shuffle_write_bytes"] < m["scan_bytes"], m


def test_broadcast_star_join_shuffle_bounded_by_fact(spark):
    """The 5-way star join must not shuffle the dimensions: total shuffle
    write stays within a small multiple of the fact-side row data."""
    m = run_with_metrics(REGISTRY["join_star_revenue"].fn(spark, SF_DIR))
    li_rows = table(spark, SF_DIR, "lineitem").count()
    assert m["scan_rows"] >= li_rows
    # agg output is |nations| rows; shuffle should be tiny
    assert m["shuffle_write_bytes"] < m["scan_bytes"], m


def test_no_spill_at_fixture_scale(spark):
    """Nothing in the headline path should spill at sf0.001 — a spill here
    means partition sizing is broken long before 100 TB."""
    for name in ["agg_tpch_q1", "window_ranking", "join_star_revenue"]:
        m = run_with_metrics(REGISTRY[name].fn(spark, SF_DIR))
        assert m["spill_bytes"] == 0, (name, m)
