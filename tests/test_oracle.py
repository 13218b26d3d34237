"""Differential oracle tests: every registered query with an oracle runs on
Spark and DuckDB over the same parquet fixtures; normalized results must
match exactly (mirrors the driver's CORRECTNESS gate at sf0.01; here at
sf0.001 for speed). SMOKE/no-oracle queries are checked for executability
and non-negative row counts.
"""

from __future__ import annotations

import pytest

from solis_solarman_clickhouse_spark.caching import release_cached
from solis_solarman_clickhouse_spark.queries import REGISTRY

from .conftest import SF_DIR, compare

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
SMOKE_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(autouse=True)
def _release_tracked_persists():
    """Drop each query's tracked persists after its compare: the 392-query
    sweep must not accumulate cached blocks across queries."""
    yield
    release_cached()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ducks, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    compare(df, ducks, spec.oracle, name=name)


@pytest.mark.parametrize("name", SMOKE_ONLY)
def test_smoke_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
